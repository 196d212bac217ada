package graft

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Scale-mechanism coverage that has no exact cross-engine oracle:
  * mergeable HLL sketches (re-aggregatable distinct counts) and the
  * runtime bloom-filter join pruning Catalyst injects for selective
  * joins — both core levers at 100 TB.
  */
class SketchOpsSpec extends SparkSpec {

  test("mergeable HLL sketches: union of per-group sketches ≈ exact distinct") {
    // the 100 TB pattern: sketch once per partition/group, store, then
    // answer global distinct questions by UNIONING sketches — no rescan
    val orders = Tables.orders(spark, sf001)
    val perStatus = orders.groupBy("o_orderstatus")
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
    val merged = perStatus
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect()(0).getLong(0)
    val exact = orders.select("o_custkey").distinct().count()
    assert(math.abs(merged - exact) <= math.max(1L, (exact * 0.05).toLong),
      s"HLL union estimate $merged vs exact $exact")
    // and each per-group sketch is individually sane
    val statuses = perStatus.collect()
    assert(statuses.length >= 2, "need multiple groups to demonstrate the union")
  }

  test("runtime bloom filter prunes the fact side of a selective join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
      val sel = Tables.orders(spark, sf001).filter(col("o_totalprice") > 400000.0)
      val joined = Tables.lineitem(spark, sf001)
        .join(sel, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom_filter"),
        s"no runtime bloom filter injected:\n$plan")
      // the filtered result is still correct
      val n = joined.count()
      val expected = Tables.lineitem(spark, sf001)
        .join(Tables.orders(spark, sf001), col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_totalprice") > 400000.0).count()
      assert(n === expected)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
