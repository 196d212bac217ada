package graft

import org.apache.spark.sql.functions._

/** Sanity checks per relational operator at sf0.001 (cross-engine equality
  * is covered by the DuckDB oracle at sf0.01 — tools/check_oracle.py; here
  * we assert shapes and independently checkable facts).
  */
class RelationalSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0001)

  test("events_funnel: stages shrink monotonically from the view cohort") {
    import graft.core.Tables
    val rows = run("events_funnel").collect().sortBy(_.getAs[Long]("stage"))
    assert(rows.map(_.getAs[Long]("stage")).toSeq === Seq(1L, 2L, 3L))
    assert(rows.map(_.getAs[String]("step")).toSeq === Seq("view", "click", "purchase"))
    val users = rows.map(_.getAs[Long]("users"))
    assert(users(0) >= users(1) && users(1) >= users(2), s"funnel widened: ${users.toSeq}")
    val viewers = Tables.events(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("event_type") === "view")
      .select("user_id").distinct().count()
    assert(users(0) === viewers, "stage 1 is exactly the distinct view cohort")
  }

  test("events_gap_fill: spine is contiguous hourly and conserves event counts") {
    import graft.core.Tables
    val rows = run("events_gap_fill").collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    byType.foreach { case (tpe, rs) =>
      val hours = rs.map(r => java.time.LocalDateTime.parse(r.getAs[String]("hour"), fmt)).sorted
      // contiguous: row count == hours spanned inclusive, no duplicates
      val span = java.time.Duration.between(hours.head, hours.last).toHours + 1
      assert(hours.length.toLong === span, s"$tpe spine has holes or dups")
      assert(hours.distinct.length === hours.length)
    }
    // zero-filled rows exist at sf0.001 (sparse hours) and the non-zero
    // rows conserve the exact per-type event totals
    assert(rows.exists(_.getAs[Long]("n") === 0L), "no gap was actually filled")
    val totals = byType.view.mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    val expected = Tables.events(spark, sf0001).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(totals === expected)
  }

  test("events_attribution: purchases fully partitioned across touch types") {
    import graft.core.Tables
    val rows = run("events_attribution").collect()
    val srcs = rows.map(_.getAs[String]("src_type"))
    assert(srcs.toSet.subsetOf(Set("view", "click", "none")))
    val purchases = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getAs[Long]("n_purchases")).sum === purchases,
      "every purchase attributed exactly once")
  }

  test("events_attribution_linear: credit conserved to within 1 µ¢ per purchase") {
    import graft.core.Tables
    val rows = run("events_attribution_linear").collect()
    val credit = rows.map(_.getAs[Long]("credit_ucents")).sum
    val nPurch = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .agg(sum(floor(col("value") * 100).cast("long")), count(lit(1))).collect()(0)
    val exact = nPurch.getLong(0) * 1000000L
    // each touched purchase's two DIV truncations lose at most one
    // micro-cent total; untouched purchases credit 'none' exactly
    assert(credit <= exact && credit >= exact - nPurch.getLong(1),
      s"credit $credit vs exact $exact over ${nPurch.getLong(1)} purchases")
    // both credit models agree on the purchase partition sizes
    val lastTouch = run("events_attribution").collect()
      .map(r => r.getAs[String]("src_type") -> r.getAs[Long]("n_purchases")).toMap
    assert(rows.map(_.getAs[Long]("n_purchases")).sum >= lastTouch.values.sum,
      "linear counts each purchase once per credited type")
  }

  test("events_transitions: bigram totals are events minus distinct users") {
    import graft.core.Tables
    val rows = run("events_transitions").collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    val ev = Tables.events(spark, sf0001)
    // each user with k events contributes exactly k-1 transitions
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(total === expected, s"transition mass $total vs $expected")
    val types = ev.select("event_type").distinct().collect().map(_.getString(0)).toSet
    assert(rows.forall(r => types(r.getAs[String]("from_type")) &&
      types(r.getAs[String]("to_type"))))
  }

  test("text_bpe_train: round-1 merge is the corpus argmax, round 2 can't beat it") {
    val train = run("text_bpe_train").collect().sortBy(_.getAs[Long]("round"))
    assert(train.length === 2)
    val topPair = run("text_bpe_pairs").collect()
      .maxBy(r => (r.getAs[Long]("cnt"), r.getAs[String]("pair")))
    // same ordering as the query: count desc, pair asc — head of the list
    val head = run("text_bpe_pairs").collect().head
    assert(train(0).getAs[String]("merged_pair") === head.getAs[String]("pair"))
    assert(train(0).getAs[Long]("pair_count") === head.getAs[Long]("cnt"))
    // merging only removes occurrences; every post-merge pair count is
    // bounded by the round-1 maximum
    assert(train(1).getAs[Long]("pair_count") <= train(0).getAs[Long]("pair_count"))
    assert(topPair.getAs[Long]("cnt") === train(0).getAs[Long]("pair_count"))
  }

  test("events_retention: day-0 cohorts cover every signup user exactly once") {
    import graft.core.Tables
    import org.apache.spark.sql.functions.col
    val rows = run("events_retention").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("day_offset") >= 0))
    // the signup event itself is day-0 activity, so day-0 cells partition
    // the signup cohort
    val day0 = rows.filter(_.getAs[Long]("day_offset") == 0L)
      .map(_.getAs[Long]("active_users")).sum
    val signups = Tables.events(spark, sf0001)
      .filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(day0 === signups, s"day-0 total $day0 != signup cohort $signups")
    // retention never exceeds its cohort's day-0 size
    val day0ByCohort = rows.filter(_.getAs[Long]("day_offset") == 0L)
      .map(r => r.getAs[String]("cohort_day") -> r.getAs[Long]("active_users")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("active_users") <=
        day0ByCohort(r.getAs[String]("cohort_day")), r.toString)
    }
  }

  test("text_langid_eval: confusion matrix totals the corpus") {
    import graft.core.Tables
    val rows = run("text_langid_eval").collect()
    assert(rows.map(_.getAs[Long]("n")).sum ===
      Tables.documents(spark, sf0001).count())
    val langs = rows.map(_.getAs[String]("lang")).distinct
    assert(langs.length >= 2, "gold labels collapsed")
    assert(rows.forall(r => Set("en", "es", "de", "fr")
      .contains(r.getAs[String]("lang_guess"))))
  }

  test("bpeTrain generalizes the registered query to N rounds") {
    import graft.core.Tables
    import graft.functions.TextAnalysis
    val merges = TextAnalysis.bpeTrain(Tables.documents(spark, sf0001), 4)
    assert(merges.length === 4)
    assert(merges.map(_._1) === Seq(1, 2, 3, 4))
    // each merge removes that round's argmax, so the max can only shrink
    val counts = merges.map(_._3)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b }, counts.toString)
    assert(merges.map(_._2).distinct.length === 4, "merged pairs must be distinct")
    // first two rounds agree with the oracle-checked unrolled query
    // (markers differ — query uses 'A', library uses U+E000 — so compare
    // pairs with the round-1 marker normalized)
    val unrolled = run("text_bpe_train").collect().sortBy(_.getAs[Long]("round"))
      .map(r => (r.getAs[String]("merged_pair").replace('A', ''),
        r.getAs[Long]("pair_count")))
    assert(merges.take(2).map(m => (m._2, m._3)) === unrolled.toSeq)
  }

  test("bpeTrain under Reliable checkpointing ≡ Local, with round state on disk") {
    import graft.core.Tables
    import graft.functions.TextAnalysis
    import graft.operators.CheckpointStrategy
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-ckpt").toString
    val local = TextAnalysis.bpeTrain(Tables.documents(spark, sf0001), 3)
    val reliable = TextAnalysis.bpeTrain(Tables.documents(spark, sf0001), 3,
      CheckpointStrategy.Reliable(dir))
    assert(local === reliable)
    assert(new java.io.File(dir).listFiles != null &&
      new java.io.File(dir).listFiles.nonEmpty, s"no checkpoint data under $dir")
  }

  test("events_outliers: Chebyshev-bounded and totals conserved") {
    import graft.core.Tables
    val rows = run("events_outliers").collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum ===
      Tables.events(spark, sf0001).count())
    rows.foreach { r =>
      val n = r.getAs[Long]("n_events"); val o = r.getAs[Long]("n_outliers")
      // one-sided 2-sigma exceedance is at most 1/4 of any distribution
      assert(o <= n / 4 + 1, s"${r.getAs[String]("event_type")}: $o outliers of $n")
    }
  }

  test("scan_pushdown pushes the filter to the parquet scan") {
    val df = run("scan_pushdown")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"),
      s"expected pushed filter in plan:\n$plan")
    assert(df.columns.toSeq === Seq("l_orderkey", "l_quantity"))
  }

  test("q1 groups are complete and counts add up") {
    val rows = run("q1_pricing_summary").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .filter(col("l_shipdate") <= lit("1998-09-02")).count()
    assert(total === expected)
  }

  test("agg_rollup has grand-total row equal to table count") {
    val rows = run("agg_rollup").collect()
    val grand = rows.filter(r => r.getString(0) == "(all)" && r.getString(1) == "(all)")
    assert(grand.length === 1)
    assert(grand(0).getAs[Long]("n") ===
      spark.read.parquet(s"$sf0001/orders.parquet").count())
  }

  test("agg_cube row count = (|f|+1)*(|s|+1) combos present in data + margins") {
    val rows = run("agg_cube").collect()
    val grand = rows.filter(r => r.getString(0) == "(all)" && r.getString(1) == "(all)")
    assert(grand.length === 1)
  }

  test("join_semi ⊆ orders and join_anti excludes big-order customers") {
    val semi = run("join_semi").select("o_orderkey").collect().map(_.getLong(0)).toSet
    val antiCust = run("join_anti").select("c_custkey").collect().map(_.getLong(0)).toSet
    val bigBuyers = spark.read.parquet(s"$sf0001/orders.parquet")
      .filter(col("o_totalprice") > 450000.0)
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    assert(antiCust.nonEmpty)
    assert(antiCust.intersect(bigBuyers).isEmpty)
    assert(semi.nonEmpty)
  }

  test("join_broadcast_agg plans a BroadcastHashJoin") {
    val plan = run("join_broadcast_agg").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
  }

  test("topk_orders is TakeOrderedAndProject (no global sort) and descending") {
    val df = run("topk_orders")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
    val prices = df.collect().map(_.getDouble(1))
    assert(prices.length === 100)
    assert(prices.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("window_rank keeps at most 3 per customer") {
    val byCust = run("window_rank").collect().groupBy(_.getLong(0))
    assert(byCust.values.forall(_.length <= 3))
    assert(byCust.values.forall(_.map(_.getAs[Int]("rn")).toSet.subsetOf(Set(1, 2, 3))))
  }

  test("json_props sums parse the props JSON") {
    val rows = run("json_props").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(!_.isNullAt(2))) // every event_type has parseable k
  }

  test("array_ops norms are positive and dims constant") {
    val rows = run("array_ops").collect()
    assert(rows.forall(_.getAs[Int]("dim") === 64))
    assert(rows.forall(_.getAs[Double]("l2_norm") > 0))
  }

  test("join_full_outer: null extensions both directions, per-side totals conserved") {
    import graft.core.Tables
    val rows = run("join_full_outer").collect()
    val iDebt = rows.head.fieldIndex("n_debt_cust")
    val iSupp = rows.head.fieldIndex("n_supp")
    // unequal key coverage must survive the join in BOTH directions
    assert(rows.count(_.isNullAt(iDebt)) > 0, "no supplier-only nations")
    assert(rows.count(_.isNullAt(iSupp)) > 0, "no customer-only nations")
    // the full outer drops nothing: each side's counts re-total to its input
    val suppTotal = rows.filterNot(_.isNullAt(iSupp)).map(_.getLong(iSupp)).sum
    assert(suppTotal === Tables.supplier(spark, sf0001).count())
    val debtTotal = rows.filterNot(_.isNullAt(iDebt)).map(_.getLong(iDebt)).sum
    assert(debtTotal === Tables.customer(spark, sf0001)
      .filter(col("c_acctbal") < -500.0).count())
    // coalesced key is unique and never null
    val keys = rows.map(_.getAs[Long]("nationkey"))
    assert(keys.distinct.length === rows.length)
  }

  test("all relational queries return rows at sf0.001") {
    for (name <- Relational.queriesKeys) {
      assert(run(name).count() > 0, s"$name empty")
    }
  }
}

object Relational {
  val queriesKeys: Seq[String] = graft.operators.Relational.queries.keys.toSeq
}
