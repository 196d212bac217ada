package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{ParityQueries, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers a named query bound to the parquet
  * testdata plus (where SQL-expressible) a DuckDB oracle over the same
  * tables. Conventions, enforced module-by-module:
  *   - column names aliased identically on both sides (the driver sorts
  *     columns by name before hashing);
  *   - double sums routed through DECIMAL(18,4) so Spark and DuckDB agree
  *     bit-for-bit, then rounded;
  *   - timestamps formatted to strings in outputs;
  *   - deterministic ORDER BY (+ tiebreak keys) everywhere.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ Relational.queries

  def oracleSql: Map[String, String] =
    ParityQueries.oracles ++ Relational.oracles
}
