package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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
