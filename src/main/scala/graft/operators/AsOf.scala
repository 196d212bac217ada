package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** As-of (time-travel) join: attach to each left row the most recent
  * right row with the same key and right.ts <= left.ts.
  *
  * Spark has no built-in as-of join; per the design preference order we
  * COMPOSE it instead of writing a custom SparkPlan: tag and union both
  * sides, hash-shuffle once on the key, sort within partitions by
  * (ts, side), and carry the latest right-side values forward with
  * last(_, ignoreNulls) over the running window. One Exchange + one
  * sort — the same cost profile a dedicated merge-join operator would
  * have, with AQE/spill/codegen for free.
  */
object AsOf {

  /** leftTs/rightTs must be comparable types; rightCols are carried.
    * Inner semantics: left rows with no prior right row are dropped. */
  def asOfJoin(left: DataFrame, leftKey: String, leftTs: String,
               right: DataFrame, rightKey: String, rightTs: String,
               rightCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    // The carried right-side payload travels as ONE struct column, so
    // last(_, ignoreNulls) always takes every carried value from the SAME
    // right row — carrying each column independently would stitch values
    // from different rows whenever a carried column is null, and a null
    // head-column would wrongly drop a matched row at the inner filter.
    val payloadType = StructType(rightCols.map(c =>
      StructField(c, right.schema(c).dataType, nullable = true)))
    // SQL equi-join semantics: null keys/timestamps never match — without
    // this filter the window partitioning would group null keys TOGETHER
    // and "match" them (unlike the native AsOfJoinExec, which skips them)
    val l = left
      .filter(col(leftKey).isNotNull && col(leftTs).isNotNull)
      .withColumn("_k", col(leftKey)).withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_r", lit(null).cast(payloadType))
    // a null-ts right row would sort first and be carried forward as a
    // "match" — exclude, as the native operator does
    val r = right
      .filter(col(rightKey).isNotNull && col(rightTs).isNotNull)
      .withColumn("_k", col(rightKey)).withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
      .withColumn("_r", struct(rightCols.map(col): _*))
    val rPadded = left.columns.foldLeft(r)((df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select((left.columns.map(col) ++ Seq(col("_k"), col("_ts"), col("_side"), col("_r"))): _*)

    val unioned = l
      .select((left.columns.map(col) ++ Seq(col("_k"), col("_ts"), col("_side"), col("_r"))): _*)
      .unionByName(rPadded)

    // right rows (side 0) sort before left rows (side 1) at equal ts, so
    // a right row exactly at the left ts matches (ts >= semantics). The
    // struct is non-null for every right row (even if all fields are
    // null), so its non-nullness IS the match marker.
    val w = Window.partitionBy("_k").orderBy("_ts", "_side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_last", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .filter(col("_last").isNotNull) // inner as-of
      // getField, not col("_last.name"): a right column whose NAME
      // contains a dot would otherwise parse as a deeper field path
      .select((left.columns.map(col) ++
        rightCols.map(c => col("_last").getField(c).as(c))): _*)
  }

  /** NEAREST as-of: attach the right row minimizing |left.ts − right.ts|
    * per key, either direction, ties to the earlier (backward) match —
    * pandas merge_asof(direction='nearest'). Same union machinery as
    * [[asOfJoin]], but BOTH directions come out of ONE exchange + ONE
    * sort: the backward candidate via last(_, ignoreNulls) over the
    * unbounded-preceding frame and the forward candidate via
    * first(_, ignoreNulls) over the unbounded-following frame share the
    * same (partition, order) spec, so Spark evaluates them in a single
    * WindowExec. Distances compare as exact integer microseconds. */
  def asOfJoinNearest(left: DataFrame, leftKey: String, leftTs: String,
                      right: DataFrame, rightKey: String, rightTs: String,
                      rightCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    // right ts rides inside the payload struct: the winner's distance is
    // measured against the SAME row the carried values come from
    val payloadCols = rightCols :+ rightTs
    val payloadType = StructType(payloadCols.map(c =>
      StructField(c, right.schema(c).dataType, nullable = true)))
    val l = left
      .filter(col(leftKey).isNotNull && col(leftTs).isNotNull)
      .withColumn("_k", col(leftKey)).withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_r", lit(null).cast(payloadType))
    val r = right
      .filter(col(rightKey).isNotNull && col(rightTs).isNotNull)
      .withColumn("_k", col(rightKey)).withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
      .withColumn("_r", struct(payloadCols.map(col): _*))
    val rPadded = left.columns.foldLeft(r)((df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select((left.columns.map(col) ++ Seq(col("_k"), col("_ts"), col("_side"), col("_r"))): _*)
    val unioned = l
      .select((left.columns.map(col) ++ Seq(col("_k"), col("_ts"), col("_side"), col("_r"))): _*)
      .unionByName(rPadded)

    val wPrev = Window.partitionBy("_k").orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("_k").orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // a right row exactly at the left ts sorts before it (side 0 < 1),
    // lands in the backward frame at distance 0, and wins the tie
    val us = unix_micros(col("_ts").cast("timestamp"))
    def rts(c: Column) = unix_micros(c.getField(rightTs).cast("timestamp"))
    val pickPrev = col("_next").isNull ||
      (col("_prev").isNotNull && us - rts(col("_prev")) <= rts(col("_next")) - us)
    unioned
      .withColumn("_prev", last(col("_r"), ignoreNulls = true).over(wPrev))
      .withColumn("_next", first(col("_r"), ignoreNulls = true).over(wNext))
      .filter(col("_side") === 1)
      .withColumn("_best", when(pickPrev, col("_prev")).otherwise(col("_next")))
      .filter(col("_best").isNotNull) // inner: no candidate either side
      .select((left.columns.map(col) ++
        rightCols.map(c => col("_best").getField(c).as(c))): _*)
  }

  /** Same contract as [[asOfJoin]], executed by the native
    * [[graft.plans.AsOfJoinExec]] operator (logical node + planner
    * strategy injected via GraftExtensions): one exchange + one sort
    * per side, then an O(1)-state streaming merge per partition.
    * Requires key and ts columns to have matching types across sides.
    */
  def asOfJoinNative(left: DataFrame, leftKey: String, leftTs: String,
                     right: DataFrame, rightKey: String, rightTs: String,
                     rightCols: Seq[String], outer: Boolean = false): DataFrame = {
    import org.apache.spark.sql.graft.PlanBridge
    val lp = PlanBridge.analyzed(left)
    val rp = PlanBridge.analyzed(right)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    PlanBridge.ofRows(left.sparkSession,
      graft.plans.AsOfJoin(lp, rp,
        attr(lp, leftKey), attr(rp, rightKey),
        attr(lp, leftTs), attr(rp, rightTs),
        rightCols.map(attr(rp, _)), outer))
  }

  /** Events joined to the customer's most recent order, right side
    * deduped to one order per (custkey, orderdate). Shared by the
    * compositional and native queries so both hit the same oracle. */
  private def eventsOrdersAsOf(s: SparkSession, dir: String,
      join: (DataFrame, String, String, DataFrame, String, String, Seq[String]) => DataFrame): DataFrame = {
    val dedupW = Window.partitionBy("o_custkey", "o_orderdate")
      .orderBy(desc("o_orderkey"))
    val ordersDedup = Tables.orders(s, dir)
      .withColumn("_rn", row_number().over(dedupW))
      .filter(col("_rn") === 1)
      .drop("_rn")
    val events = Tables.events(s, dir)
      .select("event_id", "user_id", "ts")
    join(events, "user_id", "ts",
      ordersDedup, "o_custkey", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"))
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
        col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy("event_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Each event joined to the customer's most recent order at event
    // time. Right side deduped to one order per (custkey, orderdate)
    // (max orderkey) so the as-of match is well-defined in both engines.
    "asof_join_events_orders" -> ((s, dir) =>
      eventsOrdersAsOf(s, dir, asOfJoin)),

    // Same semantics through the native whole-operator path
    // (AsOfJoin logical node → AsOfJoinStrategy → AsOfJoinExec merge).
    "asof_join_native" -> ((s, dir) =>
      eventsOrdersAsOf(s, dir, (l, lk, lt, r, rk, rt, cols) =>
        asOfJoinNative(l, lk, lt, r, rk, rt, cols))),

    // NEAREST-direction as-of: each purchase matched to the user's
    // closest click in time, either direction (backward-only would
    // miss the click that lands seconds AFTER checkout — half the
    // matches flip direction on this data). Inner: purchases of
    // click-less users drop. (user_id, ts) is unique among clicks at
    // every sf, so the match is well-defined without the (custkey,
    // orderdate)-style dedup the backward queries apply.
    "asof_join_nearest" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("cts"), col("value"))
      asOfJoinNearest(purchases, "user_id", "ts",
        clicks, "user_id", "cts", Seq("click_id", "value"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
          col("click_id"), round(col("value"), 2).as("click_value"))
        .orderBy("event_id")
    }),

    // LEFT OUTER as-of through the native operator: the right side is
    // thinned to a third of customers so unmatched events genuinely
    // exercise the null-padding path (pandas merge_asof's default
    // keep-unmatched semantics; DuckDB's ASOF LEFT JOIN is the oracle).
    "asof_join_native_outer" -> ((s, dir) => {
      val dedupW = Window.partitionBy("o_custkey", "o_orderdate")
        .orderBy(desc("o_orderkey"))
      val ordersDedup = Tables.orders(s, dir)
        .filter(col("o_custkey") % 3 === 0)
        .withColumn("_rn", row_number().over(dedupW))
        .filter(col("_rn") === 1)
        .drop("_rn")
      val events = Tables.events(s, dir).select("event_id", "user_id", "ts")
      asOfJoinNative(events, "user_id", "ts",
        ordersDedup, "o_custkey", "o_orderdate",
        Seq("o_orderkey", "o_totalprice"), outer = true)
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
          col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy("event_id")
    })
  )

  private val eventsOrdersOracle =
    """WITH o AS (
      |  SELECT o_custkey, o_orderdate,
      |         max(o_orderkey) AS o_orderkey,
      |         arg_max(o_totalprice, o_orderkey) AS o_totalprice
      |  FROM orders GROUP BY 1, 2)
      |SELECT e.event_id, e.user_id,
      |       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
      |       o.o_orderkey, round(o.o_totalprice, 2) AS o_totalprice
      |FROM events e ASOF JOIN o
      |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      |ORDER BY event_id""".stripMargin

  def oracles: Map[String, String] = Map(
    "asof_join_events_orders" -> eventsOrdersOracle,
    "asof_join_native" -> eventsOrdersOracle,
    // Mirrors the union+dual-window formulation (DuckDB's ASOF JOIN is
    // backward-only). Carried columns may ride separately here because
    // every right row has non-null (id, value, ts) — the stitching
    // hazard the Scala struct guards against can't arise.
    "asof_join_nearest" ->
      """WITH l AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |r AS (
        |  SELECT event_id AS click_id, user_id, ts, value
        |  FROM events WHERE event_type = 'click'),
        |u AS (
        |  SELECT user_id AS k, ts, 1 AS side, event_id,
        |         NULL AS r_id, NULL AS r_value, NULL AS r_ts
        |  FROM l
        |  UNION ALL
        |  SELECT user_id, ts, 0, NULL, click_id, value, ts FROM r),
        |c AS (
        |  SELECT k, ts, side, event_id,
        |         last_value(r_id IGNORE NULLS) OVER wp AS pk,
        |         last_value(r_value IGNORE NULLS) OVER wp AS pv,
        |         last_value(r_ts IGNORE NULLS) OVER wp AS pts,
        |         first_value(r_id IGNORE NULLS) OVER wn AS nk,
        |         first_value(r_value IGNORE NULLS) OVER wn AS nv,
        |         first_value(r_ts IGNORE NULLS) OVER wn AS nts
        |  FROM u
        |  WINDOW wp AS (PARTITION BY k ORDER BY ts, side
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wn AS (PARTITION BY k ORDER BY ts, side
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_id, k AS user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |       CASE WHEN pk IS NULL THEN nk WHEN nk IS NULL THEN pk
        |            WHEN epoch_us(ts) - epoch_us(pts) <= epoch_us(nts) - epoch_us(ts)
        |            THEN pk ELSE nk END AS click_id,
        |       round(CASE WHEN pk IS NULL THEN nv WHEN nk IS NULL THEN pv
        |            WHEN epoch_us(ts) - epoch_us(pts) <= epoch_us(nts) - epoch_us(ts)
        |            THEN pv ELSE nv END, 2) AS click_value
        |FROM c WHERE side = 1 AND (pk IS NOT NULL OR nk IS NOT NULL)
        |ORDER BY event_id""".stripMargin,

    "asof_join_native_outer" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderdate,
        |         max(o_orderkey) AS o_orderkey,
        |         arg_max(o_totalprice, o_orderkey) AS o_totalprice
        |  FROM orders WHERE o_custkey % 3 = 0 GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id,
        |       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |       o.o_orderkey, round(o.o_totalprice, 2) AS o_totalprice
        |FROM events e ASOF LEFT JOIN o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY event_id""".stripMargin
  )
}
