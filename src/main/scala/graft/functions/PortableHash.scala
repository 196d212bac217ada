package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The cross-engine deterministic hash used wherever a result must
  * hash-compare against the DuckDB oracle: the first 15 hex digits of
  * md5 as a non-negative BIGINT. Numeric (not the md5 string) so
  * min/max/mod aggregate in HashAggregate with primitive buffers —
  * string agg buffers force SortAggregate.
  */
object PortableHash {

  /** 60-bit numeric hash of a string column. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB twin: exact digit-shift sum over the first 15 md5 hex chars
    * (16^k via BIGINT shifts — never double pow, which drifts). */
  def sql(arg: String): String =
    (1 to 15).map { k =>
      s"(CAST(strpos('0123456789abcdef', substr(md5($arg), $k, 1)) - 1 AS BIGINT) << ${4 * (15 - k)})"
    }.mkString("(", " + ", ")")
}
