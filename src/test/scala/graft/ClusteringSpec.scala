package graft

import graft.core.Tables

/** Invariant checks for the integer-exact Lloyd k-means at sf0.001 (the
  * cross-engine oracle covers value equality at sf0.01).
  */
class ClusteringSpec extends SparkSpec {

  private def run() = SparkEntry.queries("kmeans_lloyd")(spark, sf0001)

  test("kmeans_lloyd: a partition of the corpus into seeded cells") {
    val rows = run().collect()
    assert(rows.nonEmpty)
    val cells = rows.map(_.getAs[Long]("cell"))
    val n = Tables.embeddings(spark, sf0001).count()
    val k = math.max(16L, math.sqrt(n.toDouble).toLong)
    assert(cells.forall(c => c >= 0 && c < k),
      s"cell ids come from the k=$k corpus-adaptive seeds")
    assert(cells.distinct.length === cells.length, "one row per cell")
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total === Tables.embeddings(spark, sf0001).count(),
      "every vector is assigned to exactly one cell")
    rows.foreach { r =>
      assert(r.getAs[Long]("min_vec") <= r.getAs[Long]("vec_sum"))
      assert(r.getAs[Long]("n") > 0)
    }
  }

  test("kmeans_lloyd: deterministic across runs and shuffle settings") {
    val a = run().collect().map(_.toString).toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      // Genuinely vary the shuffle layout: a different (prime) partition
      // count re-routes every exchange, so any ordering-dependent float
      // accumulation or tiebreak would surface as a value change.
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = run().collect().map(_.toString).toSeq
      assert(a === b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
