package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The cross-engine exact money/measure sums every oracle-checked query
  * routes through — ONE definition, because the rounding subtleties here
  * have already been re-tuned once (the q7 .xx5 incident) and a stale
  * copy silently diverges the engines.
  */
object Decimals {

  /** Exact sum via DECIMAL(18,4), then cast: Spark and DuckDB agree
    * bit-for-bit on decimal addition where double summation is
    * partition-order dependent. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Sum rounded to 2 places ON THE DECIMAL, then cast to double: both
    * engines round decimals HALF_UP exactly, whereas rounding the
    * double-cast sum hits .xx5 representation boundaries where Spark
    * (BigDecimal HALF_UP) and DuckDB (scaled nearbyint) disagree.
    * DuckDB twin: CAST(round(sum(CAST(x AS DECIMAL(18,4))), 2) AS DOUBLE). */
  def rsum2(c: Column): Column =
    round(sum(c.cast(DecimalType(18, 4))), 2).cast("double")
}
