package graft

/** Scale-posture audit: the plans Catalyst actually produces must have
  * the shapes the 100 TB design depends on — pushdown reaching parquet,
  * dimension broadcasts, partial aggregation, top-k without global sort,
  * and no accidental cartesian products.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("parquet pushdown: filter and 2-column pruning reach the scan") {
    val p = plan("scan_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)"), p)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), p)
  }

  test("star joins broadcast their dimension sides") {
    for (q <- Seq("join_broadcast_agg", "q3_top_orders", "q5_region_revenue"))
      assert(plan(q).contains("BroadcastHashJoin"), s"$q lacks broadcast join")
  }

  test("aggregations run partial+final hash aggregation") {
    val p = plan("q1_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // partial + final
    assert(p.contains("Exchange hashpartitioning"), p)
  }

  test("no cartesian product outside the intended all-pairs queries") {
    for (name <- SparkEntry.queries.keys
         if name != "emb_neardup_cosine" && name != "ann_cosine_topk") {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
    }
  }

  test("similarity pair-joins use broadcast nested loop only on the tiny query side") {
    val p = plan("ann_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"), p)
    assert(p.contains("dotproductfloat"), p) // codegen'd expression in use
  }

  test("shuffle-hash hint plans a ShuffledHashJoin (SMJ alternative)") {
    import org.apache.spark.sql.functions.col
    val o = graft.core.Tables.orders(spark, sf0001).hint("shuffle_hash")
    val l = graft.core.Tables.lineitem(spark, sf0001)
    val p = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"), p)
  }

  test("minhash signature aggregation stays in HashAggregate (numeric buffers)") {
    val p = plan("dedup_minhash_lsh")
    assert(!p.contains("SortAggregate"), s"minhash fell back to SortAggregate:\n$p")
  }

  test("trade-graph edges broadcast every dimension; one fact-fact shuffle join") {
    val p = graft.operators.Graph.tradeEdges(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p) // supplier/customer/nation x2
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("sq8 quantization broadcasts the per-dimension stats and query codes") {
    val p = plan("ann_sq8_topk")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("interval outer join keeps the equi key (no nested loop)") {
    val p = plan("join_interval_outer")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }
}
