package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** A/B gate for the near-dup family's two physical paths (Dedup.docLevelPath):
  * the ORIGINAL doc-level formulation (self-join over the full shingle
  * index) vs the round-10 rep-collapsed pipeline (self-join over one
  * representative per distinct text + member-map expansion). Both are
  * correct on any corpus; the gate is a cost decision from the corpus's
  * exact within-group pair mass Σ C(k, 2). This spec pins
  *   (a) the decision on both corpus shapes, and
  *   (b) row-for-row output equality of the two paths on BOTH shapes —
  * so a future edit to either path (or to the gate) that drifts the
  * answer fails here before it reaches the oracle. */
class RepCollapseGateSpec extends SparkSpec {

  private val gatedQueries = Seq(
    "dedup_ngram_jaccard", "dedup_ngram_jaccard_capped",
    "dedup_ngram_jaccard_prefix", "dedup_containment",
    "dedup_containment_topk", "dedup_cross_source", "dedup_lsh_tuning")

  private def collectAll(dir: String): Map[String, Seq[String]] =
    gatedQueries.map(n =>
      n -> SparkEntry.queries(n)(spark, dir).collect().map(_.toString).sorted.toSeq).toMap

  private def withConf(mode: String)(body: => Map[String, Seq[String]]): Map[String, Seq[String]] = {
    spark.conf.set("graft.dedup.repcollapse", mode)
    try body finally spark.conf.unset("graft.dedup.repcollapse")
  }

  /** 12 distinct 6-token base texts, 5 of them with a 7-token near-dup
    * variant (J = 4/5 ≥ 0.5 cross-group pairs), every text duplicated
    * 10-fold across two sources → within-group pair mass 17 · C(10,2) =
    * 765 > max(64, 170/100) ⇒ the gate must pick the REP path. */
  private lazy val dupDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-gatespec").toString
    val bases = (0 until 12).map(i => s"a$i b$i c$i d$i e$i f$i")
    val variants = (0 until 5).map(i => s"a$i b$i c$i d$i e$i f$i g$i")
    val texts = bases ++ variants
    val docs = for { t <- texts.indices; k <- 0 until 10 }
      yield ((t * 10 + k).toLong, texts(t), if (k % 2 == 0) "s1" else "s2")
    docs.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("gate decision: dup-free shipped corpus → doc level; 10-way-replicated fixture → rep level") {
    assert(Dedup.docLevelPath(spark, sf0001),
      "sf0.001 (500 distinct texts) must take the doc-level path")
    assert(!Dedup.docLevelPath(spark, dupDir),
      "a corpus of 10-way exact-dup groups must take the rep path")
  }

  test("dup-free corpus: auto (doc-level) output equals the forced rep path, all gated queries") {
    val auto = collectAll(sf0001) // gate → doc level
    val forced = withConf("force")(collectAll(sf0001))
    for (n <- gatedQueries)
      assert(auto(n) === forced(n), s"$n drifted between doc-level and rep paths on sf0.001")
    // non-vacuous: the capped family must actually report pairs here
    assert(auto("dedup_lsh_tuning").nonEmpty)
  }

  test("duplicate-heavy corpus: auto (rep) output equals the pinned doc-level path, all gated queries") {
    val auto = collectAll(dupDir) // gate → rep level
    val doc = withConf("off")(collectAll(dupDir))
    for (n <- gatedQueries)
      assert(auto(n) === doc(n), s"$n drifted between rep and doc-level paths on the dup fixture")
    // non-vacuous: within-group (J = 1) AND cross-group (J = 0.8) pairs both present
    val jac = auto("dedup_ngram_jaccard")
    assert(jac.length === 17 * (10 * 9 / 2) + 5 * 10 * 10,
      s"expected 765 within + 500 cross pairs, got ${jac.length}")
    assert(auto("dedup_cross_source").nonEmpty)
  }
}
