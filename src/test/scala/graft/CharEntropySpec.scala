package graft

import org.apache.spark.sql.functions._

import graft.functions.CharEntropy

/** Pins the codegen char-entropy kernel: hand-computed values, the
  * code-point (not UTF-16) alphabet, null/empty edges, the +0.0 sign
  * convention the oracle depends on, equivalence with the declarative
  * explode-per-character aggregate on real corpus text, and the
  * registered query's plan staying a scan-parallel projection. */
class CharEntropySpec extends SparkSpec {

  import spark.implicits._

  private def entropyOf(texts: String*): Seq[java.lang.Double] =
    texts.toSeq.toDF("text")
      .select(CharEntropy(col("text")).as("h"))
      .collect().toSeq.map(r => if (r.isNullAt(0)) null else Double.box(r.getDouble(0)))

  test("hand-computed values: uniform, repeated, and mixed alphabets") {
    val Seq(aaaa, ab, abab, abcd) = entropyOf("aaaa", "ab", "abab", "abcd")
    assert(aaaa === 0.0)
    assert(ab === 1.0)
    assert(abab === 1.0)
    assert(abcd === 2.0)
  }

  test("one-symbol text yields +0.0, not -0.0 (the oracle's hash depends on the sign)") {
    val h = entropyOf("zzzzzz").head.doubleValue()
    assert(h === 0.0)
    assert(java.lang.Double.doubleToRawLongBits(h) === 0L, "must be positive zero")
  }

  test("code points, not UTF-16 units: a non-BMP symbol counts once") {
    // "aa" + one astronaut (non-BMP, 2 UTF-16 chars): 3 symbols, p = {2/3, 1/3}
    val expected = (2.0 / 3) * (math.log(3.0 / 2) / math.log(2)) +
      (1.0 / 3) * (math.log(3.0) / math.log(2))
    val h = entropyOf("aa🚀").head.doubleValue()
    assert(math.abs(h - expected) < 1e-12)
  }

  test("empty string is 0.0; NULL stays NULL") {
    val rows = Seq(Some(""), None).toDF("text")
      .select(CharEntropy(col("text")).as("h")).collect()
    assert(rows(0).getDouble(0) === 0.0)
    assert(rows(1).isNullAt(0))
  }

  test("kernel equals the declarative explode-per-character aggregate on corpus text") {
    val docs = graft.core.Tables.documents(spark, sf0001).select("doc_id", "text")
    val kernel = docs.select(col("doc_id"), round(CharEntropy(col("text")), 9).as("h"))
    val agg = docs
      .select(col("doc_id"), explode(split(col("text"), "")).as("c"))
      .groupBy("doc_id", "c").agg(count(lit(1)).cast("double").as("cnt"))
      .withColumn("n", sum("cnt").over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .groupBy("doc_id")
      .agg(round(sum((col("cnt") / col("n")) * log(2.0, col("n") / col("cnt"))), 9).as("h"))
    assert(kernel.except(agg).isEmpty && agg.except(kernel).isEmpty,
      "row-local kernel must match the shuffle-per-character formulation")
  }

  test("registered query: every doc scored, flag consistent, band sane") {
    val out = SparkEntry.queries("text_char_entropy")(spark, sf0001).collect()
    val nDocs = graft.core.Tables.documents(spark, sf0001).count()
    assert(out.length === nDocs)
    assert(out.forall(r => r.getBoolean(2) === (r.getDouble(1) < 2.0)))
    // natural-language corpus: the bulk of docs sit in a sane entropy band
    assert(out.count(r => r.getDouble(1) > 2.0 && r.getDouble(1) < 6.0) > out.length / 2)
  }
}
