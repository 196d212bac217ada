package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling: with a hot key dominating one side, the
  * runtime must split the skewed partition instead of running one
  * straggler task — the mechanism (plus salting, see wordcount_salted)
  * that keeps 100 TB joins from serializing on a single key.
  *
  * Skew thresholds are lowered (runtime confs, restored after) so the
  * tiny local dataset triggers the same code path a skewed terabyte
  * partition would.
  */
class SkewSpec extends SparkSpec {

  test("AQE splits a skewed join partition") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      import spark.implicits._
      // 90% of left rows share one key; right side uniform
      val left = spark.range(0, 200000)
        .select(when($"id" % 10 === 0, $"id" % 100).otherwise(lit(7L)).as("k"),
          $"id".as("payload"))
      val right = spark.range(0, 100).select($"id".as("k"), ($"id" * 2).as("v"))
      val joined = left.join(right.hint("merge"), "k")
      // collect() drives THIS queryExecution so AQE finalizes it (count()
      // would spawn a separate execution and leave this plan initial)
      assert(joined.collect().length === 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isSkew=true") || plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${plan.take(4000)}")
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
  }
}
