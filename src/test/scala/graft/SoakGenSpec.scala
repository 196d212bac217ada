package graft

import org.apache.spark.sql.functions._

import graft.tools.SoakGen

/** The scale-soak claims in BASELINE.md rest on SoakGen replicating the
  * corpus FAITHFULLY: every table N×, foreign keys moving in lockstep
  * with the primary keys they reference (so join cardinalities scale
  * exactly linearly), and fixed dimensions passed through. This spec
  * pins those invariants on a 2× replication of sf0.001.
  */
class SoakGenSpec extends SparkSpec {

  private lazy val dst = {
    val d = java.nio.file.Files.createTempDirectory("soakgen").toString
    SoakGen.run(spark, sf0001, d, 2)
    d
  }
  private def src(t: String) = spark.read.parquet(s"$sf0001/$t.parquet")
  private def out(t: String) = spark.read.parquet(s"$dst/$t.parquet")

  test("every keyed table doubles; fixed dimensions pass through") {
    for (t <- Seq("customer", "orders", "lineitem", "part", "supplier",
        "events", "documents", "embeddings"))
      assert(out(t).count() === 2 * src(t).count(), t)
    for (t <- Seq("region", "nation"))
      assert(out(t).count() === src(t).count(), t)
  }

  test("primary keys stay unique after re-keying") {
    for ((t, k) <- Seq("customer" -> "c_custkey", "orders" -> "o_orderkey",
        "part" -> "p_partkey", "supplier" -> "s_suppkey",
        "documents" -> "doc_id", "embeddings" -> "vec_id",
        "events" -> "event_id")) {
      val df = out(t)
      assert(df.select(k).distinct().count() === df.count(), s"$t.$k")
    }
  }

  test("foreign keys move in lockstep: join cardinality scales exactly 2x") {
    val joinedSrc = src("lineitem").join(src("orders"),
      col("l_orderkey") === col("o_orderkey")).count()
    val joinedOut = out("lineitem").join(out("orders"),
      col("l_orderkey") === col("o_orderkey")).count()
    assert(joinedOut === 2 * joinedSrc,
      "copy i's lineitem must join copy i's orders only")
    // no dangling FKs: every copied lineitem still finds its order
    assert(out("lineitem").join(out("orders"),
      col("l_orderkey") === col("o_orderkey"), "left_anti").count() === 0L)
  }

  test("group-by domains stay fixed while populations scale") {
    // nations are passthrough, so the customer->nation fan-in doubles
    // per key instead of widening the domain — the hot-key shape the
    // soak exists to create
    val perNationSrc = src("customer").groupBy("c_nationkey").count()
      .collect().map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
    val perNationOut = out("customer").groupBy("c_nationkey").count()
      .collect().map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
    assert(perNationOut.keySet === perNationSrc.keySet)
    assert(perNationOut === perNationSrc.map { case (k, v) => k -> 2 * v })
  }

  test("replicated documents are verbatim copies under new ids") {
    // every original text appears exactly `copies` times — the N-way
    // exact-duplicate clusters the dedup soak relies on
    val multiplicity = out("documents").groupBy("text").count()
      .select("count").distinct().collect().map(_.getLong(0)).toSet
    val srcMult = src("documents").groupBy("text").count()
      .select("count").distinct().collect().map(_.getLong(0)).toSet
    assert(multiplicity === srcMult.map(_ * 2))
  }
}
