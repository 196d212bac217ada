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

  test("prefix candidate self-join load is bounded per key and per task (sf0.1)") {
    import graft.operators.Dedup
    // The structural guarantee behind pairsSharing's self-join: prefix
    // shingles are the RAREST of each doc, so no join key owns a df²
    // bucket big enough to serialize a task. Assert it on real sf0.1
    // data, at both granularities a 1000-executor run cares about.
    val idx = Dedup.stagedPrefixes(spark, sf01, 0.5)
      .select("shkey").persist()
    try {
      // (a) per-KEY fan-out: the largest single bucket's emitted pairs
      // (df·(df-1)/2) must be a sliver of the total — a hot key would
      // put a quadratic share into one task no matter the partitioning
      // doubled pair counts (df·(df-1)) keep the arithmetic integral
      val byKey = idx.groupBy("shkey").agg(count(lit(1)).as("df"))
        .agg(max(col("df")).as("maxdf"),
          sum(col("df") * (col("df") - 1)).as("pairs2"))
        .collect()(0)
      val maxdf = byKey.getAs[Long]("maxdf")
      val pairs2 = byKey.getAs[Long]("pairs2")
      val maxBucketPairs2 = maxdf * (maxdf - 1)
      assert(pairs2 > 0, "sf0.1 prefix index generated no candidate pairs")
      assert(maxBucketPairs2.toDouble / pairs2 <= 0.05,
        s"hottest key emits ${maxBucketPairs2 / 2} of ${pairs2 / 2} candidate pairs (> 5%)")
      // (b) per-TASK balance: replay the exchange's own routing —
      // pmod(hash(shkey), 32) is exactly HashPartitioning at the bench's
      // 32 shuffle partitions — and bound the largest task's input
      val parts = idx
        .groupBy(pmod(hash(col("shkey")), lit(32)).as("p"))
        .agg(count(lit(1)).as("n"))
        .agg(max("n").as("mx"), avg("n").as("mean"), count(lit(1)).as("nparts"))
        .collect()(0)
      assert(parts.getAs[Long]("nparts") === 32L, "md5-derived keys fill every partition")
      val ratio = parts.getAs[Long]("mx") / parts.getAs[Double]("mean")
      assert(ratio <= 1.5,
        s"largest shuffle partition is ${ratio}x the mean — skewed candidate join")
    } finally idx.unpersist(): Unit
  }
}
