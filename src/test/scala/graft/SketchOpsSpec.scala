package graft

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Scale-mechanism coverage that has no exact cross-engine oracle:
  * mergeable HLL sketches (re-aggregatable distinct counts) and the
  * runtime bloom-filter join pruning Catalyst injects for selective
  * joins — both core levers at 100 TB.
  */
class SketchOpsSpec extends SparkSpec {

  test("count-min: estimate ≥ exact for EVERY key, and shard-merge equals direct build") {
    import org.apache.spark.sql.functions._
    import graft.functions.PortableHash
    val W = 256L
    def bucket(d: org.apache.spark.sql.Column, key: org.apache.spark.sql.Column) =
      pmod(PortableHash.hash60(concat(d.cast("string"), lit(":"), key)), lit(W))
    val ev = Tables.events(spark, sf001)
      .select(col("user_id").cast("string").as("key"))
    def cellsOf(df: org.apache.spark.sql.DataFrame) = df
      .select(col("key"), explode(sequence(lit(0), lit(2))).as("d"))
      .withColumn("bucket", bucket(col("d"), col("key")))
      .groupBy("d", "bucket").agg(count(lit(1)).as("c"))
    val cells = cellsOf(ev)
    // overestimate-only, corpus-wide: every key's min-over-depths ≥ its count
    val allKeys = ev.distinct()
      .select(col("key"), explode(sequence(lit(0), lit(2))).as("d"))
      .withColumn("bucket", bucket(col("d"), col("key")))
    val est = allKeys.join(cells, Seq("d", "bucket"))
      .groupBy("key").agg(min(col("c")).as("est"))
    val bad = est.join(ev.groupBy("key").agg(count(lit(1)).as("exact")), "key")
      .filter(col("est") < col("exact")).count()
    assert(bad === 0L, "count-min must never underestimate")
    // mergeable: two hash shards sketched separately, cells summed, equals direct
    val shardMerged = cellsOf(ev.filter(PortableHash.hash60(col("key")) % 2 === 0))
      .unionByName(cellsOf(ev.filter(PortableHash.hash60(col("key")) % 2 === 1)))
      .groupBy("d", "bucket").agg(sum(col("c")).as("c"))
    val direct = cells.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = shardMerged.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged === direct)
  }

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

  test("kmv_source_overlap estimates track the exact cross-source overlap") {
    import graft.operators.Dedup
    // exact per-pair union / Jaccard from the full per-source hash sets
    val docSrc = Tables.documents(spark, sf0001)
      .filter(col("source").isin("src0", "src1", "src2", "src3"))
      .select("doc_id", "source")
    val sets = Dedup.stagedShingles(spark, sf0001)
      .join(docSrc, "doc_id")
      .select(col("source"), graft.functions.PortableHash.hash60(col("shingle")).as("h"))
      .distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val got = SparkEntry.queries("kmv_source_overlap")(spark, sf0001).collect()
    assert(got.length === 6)
    for (r <- got) {
      val (a, b) = (r.getString(0), r.getString(1))
      val exactU = (sets(a) | sets(b)).size.toDouble
      val exactJ = (sets(a) & sets(b)).size.toDouble / exactU
      val estU = r.getAs[Long]("union_est").toDouble
      val estJppm = r.getAs[Long]("jaccard_ppm")
      // SE of the K-th order statistic estimator is ~1/sqrt(K) ≈ 6%;
      // allow 4 SE. Jaccard compares absolutely (it can be near 0).
      assert(math.abs(estU - exactU) / exactU < 0.25,
        s"$a-$b union est $estU vs exact $exactU")
      assert(math.abs(estJppm - exactJ * 1e6) < 150000,
        s"$a-$b jaccard est $estJppm ppm vs exact ${exactJ * 1e6}")
      assert(r.getAs[Long]("inter_est") <= r.getAs[Long]("union_est"))
    }
  }

  test("registered approx queries bound their sketches IN-PLAN and emit exact twins") {
    // the three formerly oracle-exempt entries now carry their ε
    // contract inside the plan: the sketch estimate is compared to the
    // exact value per row and raise_error fires on violation, while the
    // emitted columns are the exact values a DuckDB oracle replays. So
    // executing each query IS the ε assertion; the flags must be true
    // and the exact columns must match direct exact computations.
    val d = SparkEntry.queries("agg_approx_distinct")(spark, sf001).collect()
    assert(d.nonEmpty && d.forall(_.getAs[Boolean]("within_3rsd")))
    val exactD = Tables.lineitem(spark, sf001)
      .groupBy("l_returnflag").agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    d.foreach(r => assert(r.getAs[Long]("n_parts") === exactD(r.getString(0))))

    val p = SparkEntry.queries("agg_approx_percentile")(spark, sf001).collect()
    assert(p.nonEmpty && p.forall(_.getAs[Boolean]("within_eps")))

    val h = SparkEntry.queries("hll_union_distinct")(spark, sf001).collect()
    assert(h.length === 1 && h(0).getAs[Boolean]("within_eps"))
    val exact = Tables.orders(spark, sf001).select("o_custkey").distinct().count()
    assert(h(0).getAs[Long]("distinct_customers") === exact)
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
