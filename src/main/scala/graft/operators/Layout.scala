package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Staged, Tables}
import graft.functions.Decimals

/** Z-order (Morton-curve) data layout — the multi-dimensional clustering
  * pass a 100 TB lakehouse runs so range predicates on EITHER of two
  * columns prune files (the OPTIMIZE ZORDER operation of modern table
  * formats). Rows are keyed by bit-interleaving two normalized 16-bit
  * coordinates; `repartitionByRange($"zval")` then lays co-located
  * rectangles of (user_id, value) space into the same files, and each
  * file's min/max column stats cover a bounded rectangle instead of the
  * whole domain.
  *
  * Everything is integer-exact: coordinates normalize via BIGINT
  * arithmetic ((v - min) * 65535 / range, integer division), the
  * interleave is 32 shift-and-mask terms folded into one codegen'd
  * expression, and value enters as cents (floor(value * 100)) so no
  * float ever reaches the key — both engines agree bit-for-bit.
  *
  * Scale shape: one scalar stats row (broadcast), one narrow projection
  * per row, one aggregation on the 32 static z-range buckets. The
  * registered query reports each bucket's extents — exactly the
  * file-skipping statistics a reader would exploit — rather than
  * materializing the rewrite.
  */
object Layout {

  /** Interleave the low 16 bits of x (even positions) and y (odd):
    * the Morton code both engines compute with identical integer ops. */
  private def morton16(x: Column, y: Column): Column =
    (0 until 16).map { j =>
      shiftright(x, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j)) +
        shiftright(y, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j + 1))
    }.reduce(_ + _)

  /** floor((v - min) * 65535 / range): the long multiply is exact, the
    * division is one correctly-rounded IEEE op, and the floor/truncate
    * agree across engines because the operand is non-negative. */
  private def norm16(v: Column, mn: Column, mx: Column): Column =
    ((v - mn) * lit(65535L) / greatest(mx - mn, lit(1L))).cast("long")

  /** Number of buckets for the co-located join demo. Fixed and small so
    * the sf0.001 plan audit is cheap; at 100 TB the same code runs with
    * buckets sized so one bucket of the FACT table fits an executor
    * (e.g. 4096) — the bucket count is the only knob that changes. */
  private val NumBuckets = 8

  /** Bucketed copies of orders and lineitem, written once per
    * (session, sf dir): both sides bucketed AND sorted by the join key
    * into the same bucket count, one file per bucket (the
    * `repartition(n, key)` aligns write tasks with buckets — Spark's
    * bucket id is the same murmur3-mod-n as HashPartitioning — so each
    * task writes exactly its own bucket's file, which is also what lets
    * the scan report the within-bucket sort order). This is THE
    * shuffle-elimination layout for a fact-to-fact join a 100 TB
    * warehouse maintains: the one-time bucketed write pays the shuffle
    * once, and every subsequent orders⋈lineitem join — the workload's
    * hottest edge — runs with ZERO exchanges (PlanAuditSpec pins that).
    * Tables are registered in the session catalog with an explicit
    * temp-dir path (external), so nothing lands in the warehouse dir
    * and the data dies with the JVM like every other staged artifact. */
  private def bucketedOrdersLineitem(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val base = Staged.materialize(s, s"$dir|bucketed") { d =>
      val tag = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")
        .repartition(NumBuckets, col("o_orderkey"))
        .write.mode("overwrite").option("path", s"$d/orders")
        .bucketBy(NumBuckets, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(s"graft_bk_orders_$tag")
      Tables.lineitem(s, dir).select("l_orderkey", "l_extendedprice", "l_discount")
        .repartition(NumBuckets, col("l_orderkey"))
        .write.mode("overwrite").option("path", s"$d/lineitem")
        .bucketBy(NumBuckets, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(s"graft_bk_lineitem_$tag")
    }
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(base.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    (s.table(s"graft_bk_orders_$tag"), s.table(s"graft_bk_lineitem_$tag"))
  }

  /** Events rewritten partitioned by event_type, once per (session, sf
    * dir) — the coarse-grained file-skipping layout (hive-style
    * partition dirs) that complements z-order's fine-grained min/max
    * skipping: a predicate on the partition column prunes whole
    * directories at PLANNING time, before a single file is opened.
    * PlanAuditSpec pins that the pruned scan touches exactly one of the
    * five type partitions. */
  private def typePartitionedEvents(s: SparkSession, dir: String): String = {
    val base = Staged.materialize(s, s"$dir|evbytype") { d =>
      Tables.events(s, dir)
        .select("event_id", "ts", "user_id", "value", "event_type")
        .write.mode("overwrite").partitionBy("event_type").parquet(s"$d/events")
    }
    s"$base/events"
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Zero-shuffle fact-to-fact join off the bucketed layout: per-order
    // revenue (join + same-key aggregate) with NO Exchange anywhere in
    // the plan — scan-local join, scan-local aggregation, top-k via
    // TakeOrderedAndProject. The layout pays the shuffle once at write
    // time; this query (and every join on the same key after it) rides
    // it for free. Oracle replays the identical join/agg over the raw
    // tables — the layout must not change a single row.
    "layout_bucketed_join" -> ((s, dir) => {
      val (o, l) = bucketedOrdersLineitem(s, dir)
      // merge hint, not broadcast: both sides are FACT tables that scale
      // with sf, so at target scale neither can ship to every executor —
      // the sort-merge path is what rides the bucketed layout exchange-
      // free. (At test sf Catalyst would otherwise broadcast the small
      // orders side and hide exactly the plan this query exists to pin.)
      o.hint("merge").join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderpriority"))
        .agg(Decimals.rsum2(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(desc("revenue"), col("o_orderkey"))
        .limit(100)
    }),

    // Partition-pruned scan off the type-partitioned layout: the
    // `event_type = 'purchase'` predicate prunes 4 of 5 directories
    // during planning (PartitionFilters, not PushedFilters — no row
    // group is even opened in the pruned dirs). Daily purchase totals;
    // oracle replays the same filter/agg over the raw events table.
    "layout_partition_prune" -> ((s, dir) => {
      s.read.parquet(typePartitionedEvents(s, dir))
        .filter(col("event_type") === "purchase")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"), Decimals.rsum2(col("value")).as("total_value"))
        .orderBy("day")
    }),

    // Small-file COMPACTION planner — the maintenance pass every
    // day-partitioned ingest needs: tiny per-(type, day) shard files
    // bin-pack into target-size outputs. Runs over shard METADATA (one
    // row per shard, never per data row — at 100 TB the shard listing is
    // ~10⁶ rows where the data is 10¹¹), with the target size a
    // corpus-proportional broadcast 1-row aggregate (total div 40,
    // integer-exact). Packing is the contiguous greedy rule real
    // compactors use: within each event_type, shards in day order, bin =
    // exclusive-running-rows div target — so every output file covers a
    // CONTIGUOUS day range and partition-prune locality survives the
    // rewrite. The rewrite itself is bin-parallel (each output written
    // by one task reading only its shards); CompactionSpec executes it
    // and proves file count and locality. The window partitions by
    // event_type — bounded keys, each holding only its own day rows.
    "layout_compaction" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
      val shards = ev
        .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_rows"))
      val target = ev.agg(
        expr("greatest(cast(1 as bigint), count(1) div 40)").as("target"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
      shards.crossJoin(broadcast(target))
        .withColumn("cum_before", coalesce(sum(col("n_rows")).over(w), lit(0L)))
        .withColumn("bin", expr("cast(cum_before div target as bigint)"))
        .select(col("event_type"), col("day"), col("n_rows"), col("bin"))
        .orderBy("event_type", "day")
    }),

    // Per-z-bucket extents over events (user_id × value cents): 32
    // static buckets from the top 5 bits of the 32-bit Morton code.
    // Bounded min/max rectangles per bucket are the proof the layout
    // clusters BOTH dimensions at once.
    "layout_zorder" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          floor(col("value") * 100).cast("long").as("cents"))
      val stats = ev.agg(
        min("user_id").as("u_mn"), max("user_id").as("u_mx"),
        min("cents").as("c_mn"), max("cents").as("c_mx"))
      val keyed = ev.crossJoin(broadcast(stats))
        .select(col("event_id"), col("user_id"), col("cents"),
          morton16(
            norm16(col("user_id"), col("u_mn"), col("u_mx")),
            norm16(col("cents"), col("c_mn"), col("c_mx"))).as("zval"))
      keyed
        .groupBy(shiftright(col("zval"), 27).as("zbucket"))
        .agg(count(lit(1)).as("n"),
          min("user_id").as("min_user"), max("user_id").as("max_user"),
          min("cents").as("min_cents"), max("cents").as("max_cents"))
        .orderBy("zbucket")
    })
  )

  private val mortonSql = (0 until 16).map { j =>
    s"((x >> $j) & 1) * ${1L << (2 * j)} + ((y >> $j) & 1) * ${1L << (2 * j + 1)}"
  }.mkString(" + ")

  def oracles: Map[String, String] = Map(
    "layout_bucketed_join" ->
      """SELECT o_orderkey, o_orderpriority,
        |       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)
        |            AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1, 2
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 100""".stripMargin,
    "layout_partition_prune" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
        |       CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY day""".stripMargin,
    "layout_compaction" ->
      """WITH shards AS (
        |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |         count(*) AS n_rows
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT greatest(1, count(*) // 40) AS target FROM events),
        |c AS (
        |  SELECT event_type, day, n_rows,
        |         COALESCE(sum(n_rows) OVER (PARTITION BY event_type ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM shards)
        |SELECT event_type, day, n_rows,
        |       CAST(cum_before // t.target AS BIGINT) AS bin
        |FROM c, t ORDER BY event_type, day""".stripMargin,
    "layout_zorder" ->
      s"""WITH ev AS (
         |  SELECT event_id, user_id,
         |         CAST(floor(value * 100) AS BIGINT) AS cents
         |  FROM events),
         |st AS (SELECT min(user_id) AS u_mn, max(user_id) AS u_mx,
         |              min(cents) AS c_mn, max(cents) AS c_mx FROM ev),
         |nrm AS (
         |  SELECT event_id, user_id, cents,
         |         CAST(floor(CAST((user_id - u_mn) * 65535 AS DOUBLE)
         |           / greatest(u_mx - u_mn, 1)) AS BIGINT) AS x,
         |         CAST(floor(CAST((cents - c_mn) * 65535 AS DOUBLE)
         |           / greatest(c_mx - c_mn, 1)) AS BIGINT) AS y
         |  FROM ev, st),
         |keyed AS (SELECT event_id, user_id, cents, $mortonSql AS zval FROM nrm)
         |SELECT zval >> 27 AS zbucket, count(*) AS n,
         |       min(user_id) AS min_user, max(user_id) AS max_user,
         |       min(cents) AS min_cents, max(cents) AS max_cents
         |FROM keyed GROUP BY 1 ORDER BY zbucket""".stripMargin
  )
}
