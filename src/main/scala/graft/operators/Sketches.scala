package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.FreqItems

/** Sketch-aggregate surface: engine-level approximate aggregates whose
  * state is fixed-size per group (the 100 TB path for heavy hitters /
  * distinct-ish questions — no raw-value shuffle, O(k) merge).
  * Complements the typed BottomK Aggregator (doc_kmv_sketch) with a
  * native TypedImperativeAggregate ([[graft.functions.FreqItemsSketch]]).
  */
object Sketches {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Misra-Gries heavy hitters over o_orderpriority (5-value domain,
    // k=16 → sketch is exact, so the DuckDB GROUP BY oracle matches).
    "freq_items_priority" -> ((s, dir) => {
      val sk = Tables.orders(s, dir)
        .agg(FreqItems.freqItemsSketch(col("o_orderpriority"), 16).as("sk"))
      sk.select(explode(col("sk")).as("e"))
        .select(col("e.item").as("item"), col("e.cnt").as("cnt"))
        .orderBy("item")
    }),

    // Mergeable HLL distinct: per-status customer sketches unioned into
    // a global estimate — the re-aggregatable rollup pattern (store the
    // sketch, answer distinct questions without rescanning). Approximate
    // by design → no DuckDB oracle (driver records a rows-only check).
    "hll_union_distinct" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy("o_orderstatus")
        .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("distinct_customers"))
    }),

    // Explicit bloom-prefiltered semi-join (see graft.functions.Bloom):
    // the selective dim key set (negative-balance customers) folds into
    // a fixed-size filter; fact rows that definitely miss drop at the
    // scan with no shuffle, and only possible members reach the exact
    // confirm semi-join — so the result is EXACT and the oracle is the
    // plain semi-join aggregate. The automatic cousin (Catalyst's
    // runtime bloom join pruning) is asserted in SketchOpsSpec; this is
    // the user-controlled artifact a pipeline persists and reuses
    // across ingest jobs.
    "join_bloom_prefilter" -> ((s, dir) => {
      val dim = Tables.customer(s, dir)
        .filter(col("c_acctbal") < 0)
        .select(col("c_custkey"))
      val bloom = graft.functions.Bloom.stagedBytes(
        s, s"$dir|bloom|negcust", dim, col("c_custkey"), 1L << 17)
      Tables.orders(s, dir)
        .filter(graft.functions.Bloom.mightContain(bloom, col("o_custkey")))
        .join(dim, col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          graft.functions.Decimals.rsum2(col("o_totalprice")).as("total_price"))
        .orderBy("o_orderpriority")
    }),

    // Grouped variant: per order-status priority frequencies; the sketch
    // runs as a partial/final hash aggregate keyed by o_orderstatus.
    "freq_items_by_status" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(FreqItems.freqItemsSketch(col("o_orderpriority"), 16).as("sk"))
        .select(col("o_orderstatus"), explode(col("sk")).as("e"))
        .select(col("o_orderstatus"), col("e.item").as("item"), col("e.cnt").as("cnt"))
        .orderBy("o_orderstatus", "item")
    })
  )

  def oracles: Map[String, String] = Map(
    "join_bloom_prefilter" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_price
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    "freq_items_priority" ->
      """SELECT o_orderpriority AS item, count(*) AS cnt
        |FROM orders GROUP BY 1 ORDER BY item""".stripMargin,
    "freq_items_by_status" ->
      """SELECT o_orderstatus, o_orderpriority AS item, count(*) AS cnt
        |FROM orders GROUP BY 1, 2 ORDER BY o_orderstatus, item""".stripMargin
  )
}
