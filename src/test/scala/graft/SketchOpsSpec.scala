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

  test("registered approx queries stay within documented ε of exact values") {
    // the three oracle-exempt entries are approximate BY DESIGN, but
    // "approximate" is a bounded contract, not a free pass: each
    // registered query's output must sit within its sketch's
    // documented error of the exact answer.

    // approx_count_distinct: default rsd 5% ⇒ 3σ bound of 15%
    val approxD = SparkEntry.queries("agg_approx_distinct")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactD = Tables.lineitem(spark, sf001)
      .groupBy("l_returnflag").agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approxD.keySet === exactD.keySet)
    approxD.foreach { case (k, est) =>
      val ex = exactD(k)
      assert(math.abs(est - ex) <= math.max(1L, (ex * 0.15).toLong),
        s"approx_count_distinct($k) = $est vs exact $ex exceeds 15%")
    }

    // approx_percentile at accuracy 10000: rank error ≤ n/10000, so the
    // estimate must land between the exact quantiles at q ∓ 0.002
    val approxP = SparkEntry.queries("agg_approx_percentile")(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val bounds = Tables.lineitem(spark, sf001)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.498, 0.502, 0.948, 0.952))").as("b"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    approxP.foreach { case (k, (p50, p95)) =>
      val Seq(lo50, hi50, lo95, hi95) = bounds(k).toSeq
      assert(p50 >= lo50 - 0.01 && p50 <= hi50 + 0.01,
        s"p50($k)=$p50 outside exact rank band [$lo50, $hi50]")
      assert(p95 >= lo95 - 0.01 && p95 <= hi95 + 0.01,
        s"p95($k)=$p95 outside exact rank band [$lo95, $hi95]")
    }

    // hll_union_distinct (datasketches HLL, lgK default 12): well under
    // 5% at this cardinality — hold it to 5%
    val est = SparkEntry.queries("hll_union_distinct")(spark, sf001)
      .collect()(0).getLong(0)
    val exact = Tables.orders(spark, sf001).select("o_custkey").distinct().count()
    assert(math.abs(est - exact) <= math.max(1L, (exact * 0.05).toLong),
      s"hll_union_distinct $est vs exact $exact exceeds 5%")
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
