package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE skew handling: the run-time safety net for the hot keys that
  * salting does not pre-treat (wordcount_salted covers the static
  * technique; this pins the adaptive one). A sort-merge join with one
  * pathological key must be re-planned by OptimizeSkewedJoin into
  * split-and-replicate subjoins — the difference between a straggler
  * task holding a 100 TB job hostage and an even finish.
  */
class SkewSpec extends SparkSpec {

  test("AQE splits the skewed side of a sort-merge join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      // thresholds scaled down so test-sized data exhibits "skew"
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // one key carries ~95% of the left side
      val left = spark.range(0, 200000)
        .select(when(col("id") < 190000, 0L).otherwise(col("id")).as("k"), col("id").as("v"))
      val right = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = left.join(right, "k")
      // k=0 matches right's key 0 for all 190k rows; the 10k distinct
      // high keys sit outside the right side's 0..999 key range.
      // collect() (not count()) so THIS query execution materializes and
      // its adaptive plan reaches its final form
      assert(joined.collect().length === 190000)
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other => other.toString
      }
      assert(finalPlan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
