package graft

import org.apache.spark.sql.functions._

import graft.functions.{CodeLookupSum, DotProductInt}

/** The codegen'd integer scoring kernels (SQ8 dot product, PQ
  * asymmetric-distance lookup-sum) must agree exactly with their
  * interpreted higher-order-function twins and honor the documented
  * null/shape discipline.
  */
class IntCodeOpsSpec extends SparkSpec {

  test("DotProductInt ≡ aggregate(zip_with(...)) over random int codes") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)(
      (Seq.fill(64)(rnd.nextInt(256) - 128), Seq.fill(64)(rnd.nextInt(256) - 128)))
    val both = rows.toDF("a", "b").select(
      DotProductInt(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("long") * y.cast("long")), lit(0L), (acc, v) => acc + v).as("slow"))
    both.collect().foreach(r => assert(r.getLong(0) === r.getLong(1), s"mismatch: $r"))
  }

  test("DotProductInt null/shape discipline: null array, ragged, null element") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq[Integer](1, 2)), Some(Seq[Integer](3, 4))),     // 11
      (None, Some(Seq[Integer](1))),                            // null input
      (Some(Seq[Integer](1, 2)), Some(Seq[Integer](1))),        // ragged
      (Some(Seq[Integer](1, null)), Some(Seq[Integer](1, 1))),  // null element
      (Some(Seq.empty[Integer]), Some(Seq.empty[Integer]))      // empty = 0
    ).toDF("a", "b")
      .select(DotProductInt(col("a"), col("b")).as("d"))
    val rows = df.collect()
    assert(rows(0).getLong(0) === 11L)
    assert(rows(1).isNullAt(0))
    assert(rows(2).isNullAt(0))
    assert(rows(3).isNullAt(0))
    assert(rows(4).getLong(0) === 0L)
  }

  test("CodeLookupSum ≡ explicit per-subspace lookups") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(100)(
      (Seq.fill(8)(rnd.nextInt(16)), Seq.fill(8)(Seq.fill(16)(rnd.nextLong() % 1000000L))))
    val both = rows.toDF("codes", "tab").select(
      CodeLookupSum(col("codes"), col("tab")).as("fast"),
      aggregate(zip_with(col("codes"), col("tab"),
        (c, row) => element_at(row, c + 1)), lit(0L), (acc, v) => acc + v).as("slow"))
    both.collect().foreach(r => assert(r.getLong(0) === r.getLong(1), s"mismatch: $r"))
  }

  test("CodeLookupSum poisons malformed codes instead of reading garbage") {
    import spark.implicits._
    val tab = Seq(Seq(10L, 20L), Seq(30L, 40L))
    val df = Seq(
      (Some(Seq[Integer](1, 0)), Some(tab)),  // 20 + 30
      (Some(Seq[Integer](2, 0)), Some(tab)),  // code out of bounds
      (Some(Seq[Integer](-1, 0)), Some(tab)), // negative code
      (Some(Seq[Integer](1)), Some(tab)),     // |codes| != |table|
      (None, Some(tab))                       // null input
    ).toDF("codes", "tab")
      .select(CodeLookupSum(col("codes"), col("tab")).as("d"))
    val rows = df.collect()
    assert(rows(0).getLong(0) === 50L)
    assert(rows(1).isNullAt(0))
    assert(rows(2).isNullAt(0))
    assert(rows(3).isNullAt(0))
    assert(rows(4).isNullAt(0))
  }

  test("codegen path is active (no fallback) in a whole-stage plan") {
    // parquet-backed input: a local Seq would constant-fold to a
    // LocalTableScan and never exercise doGenCode
    val codes = graft.core.Tables.embeddings(spark, sf0001)
      .select(transform(col("embedding"), x => (x * 100).cast("int")).as("c"))
    val plan = codes.select(DotProductInt(col("c"), col("c")).as("d"))
      .queryExecution.executedPlan.toString
    // "*(n)" marks whole-stage codegen; the kernel must sit inside one
    assert("""\*\(\d+\) Project \[dotproductint""".r.findFirstIn(plan).isDefined,
      s"plan:\n$plan")
  }
}
