package graft

import org.apache.spark.sql.functions._

import graft.functions.Bloom
import graft.operators.Sketches

/** The explicit bloom-membership artifact (graft.functions.Bloom): no
  * false negatives ever, real pruning on disjoint keys, and exactness of
  * the prefilter+confirm composition — including on synthetic data with
  * genuine batch∩corpus overlap, which the driver testdata lacks (its
  * documents are all distinct, so the registered dedup_bloom_ingest
  * exercises the definitely-new path; this spec exercises the drop
  * path).
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every built key probes true") {
    val keys = (1L to 5000L).map(i => i * 7919).toDF("k")
    val bloom = Bloom.buildBytes(keys, col("k"), 8192L)
    assert(keys.filter(!Bloom.mightContain(bloom, col("k"))).count() === 0)
  }

  test("disjoint probe keys are mostly definite misses (fpp bounded)") {
    val keys = (1L to 5000L).map(i => i * 7919).toDF("k")
    val bloom = Bloom.buildBytes(keys, col("k"), 8192L)
    val probes = (1L to 5000L).map(i => i * 7919 + 1).toDF("k")
    val hits = probes.filter(Bloom.mightContain(bloom, col("k"))).count()
    // default fpp is 3%; allow generous slack — the point is that the
    // overwhelming majority of non-members never reach the confirm join
    assert(hits < 500, s"bloom passed $hits of 5000 non-members")
  }

  test("prefilter + exact confirm ≡ plain anti-join under real overlap") {
    val corpus = (1L to 300L).map(i => f"doc-$i%04d").toDF("fp")
    // batch: 100 already-in-corpus docs + 150 new ones
    val batch = ((201L to 300L) ++ (1001L to 1150L))
      .map(i => f"doc-$i%04d").zipWithIndex
      .map { case (fp, id) => (id.toLong, fp) }.toDF("id", "fp")
    val bloom = Bloom.buildBytes(corpus, col("fp"), 1024L)
    val definitelyNew = batch.filter(!Bloom.mightContain(bloom, col("fp")))
    val confirmedNew = batch.filter(Bloom.mightContain(bloom, col("fp")))
      .join(corpus, Seq("fp"), "left_anti")
    val got = definitelyNew.unionByName(confirmedNew)
      .select("id").as[Long].collect().sorted
    val want = batch.join(corpus, Seq("fp"), "left_anti")
      .select("id").as[Long].collect().sorted
    assert(got.sameElements(want))
    assert(got.length === 150, s"expected exactly the 150 new docs, got ${got.length}")
    // and the members really were caught by the filter, not the join:
    // all 100 corpus members must probe true (no false negatives)
    assert(definitelyNew.join(corpus, Seq("fp"), "left_semi").count() === 0)
  }

  test("join_bloom_prefilter ≡ unfiltered semi-join aggregate at sf0.001") {
    val got = SparkEntry.queries("join_bloom_prefilter")(spark, sf0001).collect()
    val dim = graft.core.Tables.customer(spark, sf0001)
      .filter(col("c_acctbal") < 0).select("c_custkey")
    val want = graft.core.Tables.orders(spark, sf0001)
      .join(dim, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        graft.functions.Decimals.rsum2(col("o_totalprice")).as("total_price"))
      .orderBy("o_orderpriority").collect()
    assert(got.sameElements(want))
    assert(got.nonEmpty)
  }

  test("dedup_bloom_ingest returns exactly the batch-minus-corpus set") {
    val got = SparkEntry.queries("dedup_bloom_ingest")(spark, sf0001)
    // driver data has no cross-source exact dups → every batch doc is new
    val batch = graft.core.Tables.documents(spark, sf0001)
      .filter(col("source").isin("src16", "src17", "src18", "src19"))
    assert(got.count() === batch.count())
    assert(Sketches.queries.contains("join_bloom_prefilter"))
  }
}
