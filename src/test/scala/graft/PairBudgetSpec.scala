package graft

/** The Θ(dup²) pair-emitting diagnostics must be impossible to run
  * BLIND at scale: over `graft.pairs.budget` the plan raise_errors and
  * points at the O(docs) supersessions; within budget the output is
  * byte-identical to the unguarded form (the sf0.01 oracle hash pins
  * that side).
  */
class PairBudgetSpec extends SparkSpec {

  private def withBudget[T](b: String)(f: => T): T = {
    spark.conf.set("graft.pairs.budget", b)
    try f finally spark.conf.unset("graft.pairs.budget")
  }

  private def messages(t: Throwable): String = {
    val sb = new StringBuilder
    var c: Throwable = t
    while (c != null) { sb.append(Option(c.getMessage).getOrElse("")); c = c.getCause }
    sb.toString
  }

  test("dedup_simhash_pairs refuses to emit past the pair budget") {
    withBudget("1") {
      val e = intercept[Throwable] {
        SparkEntry.queries("dedup_simhash_pairs")(spark, sf001).collect()
      }
      assert(messages(e).contains("graft.pairs.budget"), messages(e).take(500))
      assert(messages(e).contains("dedup_simhash_clusters"))
    }
  }

  test("dedup_containment refuses to emit past the pair budget") {
    withBudget("1") {
      val e = intercept[Throwable] {
        SparkEntry.queries("dedup_containment")(spark, sf001).collect()
      }
      assert(messages(e).contains("graft.pairs.budget"), messages(e).take(500))
      assert(messages(e).contains("dedup_containment_topk"))
    }
  }

  test("within budget both guarded queries emit normally") {
    assert(SparkEntry.queries("dedup_simhash_pairs")(spark, sf001).count() > 0)
    assert(SparkEntry.queries("dedup_containment")(spark, sf001).count() > 0)
  }
}
