package graft

/** The ungated (sketch-only) branches of the approx-by-design queries
  * are what Bench and Soak measure, but Verify always runs the ε-gated
  * branch — so a bug confined to the sketch-only branch (wrong
  * grouping, column drift) would ship unnoticed while being the
  * benchmarked plan. This suite pins the ungated branch to the gated
  * one on sf0.001: same grouping keys and row count, same column
  * names, and each estimate within the SAME epsilon the gated plan
  * asserts in-plan.
  */
class ApproxGateSpec extends SparkSpec {

  private def runGated(name: String, gate: Boolean) = {
    spark.conf.set("graft.approx.exactGate", gate.toString)
    try SparkEntry.queries(name)(spark, sf0001).collect().toSeq
    finally spark.conf.set("graft.approx.exactGate", "true")
  }

  test("agg_approx_distinct: sketch-only branch matches the gated branch's keys and epsilon") {
    val gated = runGated("agg_approx_distinct", gate = true)
    val sketch = runGated("agg_approx_distinct", gate = false)
    assert(sketch.map(_.schema.fieldNames.toSeq).distinct ===
      Seq(Seq("l_returnflag", "n_parts")))
    assert(sketch.map(_.getString(0)) === gated.map(_.getString(0)),
      "same grouping keys in the same order")
    for ((s, g) <- sketch.zip(gated)) {
      val exact = g.getLong(1).toDouble
      assert(math.abs(s.getLong(1) - exact) <= exact * 0.15,
        s"sketch ${s.getLong(1)} outside 15% of exact $exact for ${s.getString(0)}")
    }
  }

  test("agg_approx_percentile: sketch-only branch matches the gated branch's keys and epsilon") {
    val gated = runGated("agg_approx_percentile", gate = true)
    val sketch = runGated("agg_approx_percentile", gate = false)
    assert(sketch.map(_.schema.fieldNames.toSeq).distinct ===
      Seq(Seq("l_returnflag", "p50", "p95")))
    assert(sketch.map(_.getString(0)) === gated.map(_.getString(0)))
    for ((s, g) <- sketch.zip(gated); i <- 1 to 2) {
      val exact = g.getDouble(i)
      assert(math.abs(s.getDouble(i) - exact) <= math.abs(exact) * 0.02,
        s"approx percentile col $i ${s.getDouble(i)} outside 2% of $exact")
    }
  }

  test("hll_union_distinct: sketch-only branch matches the gated exact within epsilon") {
    val gated = runGated("hll_union_distinct", gate = true)
    val sketch = runGated("hll_union_distinct", gate = false)
    assert(gated.size === 1 && sketch.size === 1)
    assert(sketch.head.schema.fieldNames.toSeq === Seq("distinct_customers"))
    val exact = gated.head.getLong(0).toDouble
    assert(math.abs(sketch.head.getLong(0) - exact) <= exact * 0.05,
      s"hll union ${sketch.head.getLong(0)} outside 5% of exact $exact")
  }
}
