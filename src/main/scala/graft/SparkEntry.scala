package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Parity

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers a named query bound to the parquet
  * testdata plus (where SQL-expressible) a DuckDB oracle over the same
  * tables. Column names are aliased identically on both sides; doubles are
  * rounded to fixed decimals so the driver's hash-compare is stable across
  * engines; outputs carry a deterministic ORDER BY.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    parityQueries ++ relationalQueries

  def oracleSql: Map[String, String] = parityOracles ++ relationalOracles

  // ----------------------------------------------------------------------
  // Parity trio (reference app/*_topology.py), bound to testdata tables.
  // ----------------------------------------------------------------------

  private def parityQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O1+O3+O4+O5: tokenize + count (reference app/word_count_topology.py)
    "wordcount" -> ((s, dir) =>
      Parity.wordCount(Tables.documents(s, dir), textCol = "text")
        .orderBy("word")),

    // O6+O7: one contribution round, weight 1/(n+1)
    // (reference app/page_rank_topology.py:13-18). Adjacency derived from
    // orders: src=o_custkey, neighbors=its o_orderkeys.
    "pagerank_contribs" -> ((s, dir) => {
      val adj = Tables.orders(s, dir)
        .groupBy(col("o_custkey").cast("string").as("src"))
        .agg(collect_list(col("o_orderkey").cast("string")).as("neighbors"))
      Parity.pageRankContribs(adj)
        .select(col("url"), round(col("rank"), 6).as("rank"))
        .orderBy("url")
    }),

    // O8+O9: strict > 50 filter + single ('result', N) row
    // (reference app/twitter_user_filter_topology.py:13-14,30)
    "twitter_filter_count" -> ((s, dir) =>
      Parity.filterCount(Tables.customer(s, dir), "c_acctbal", 50.0))
  )

  private def parityOracles: Map[String, String] = Map(
    "wordcount" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word ORDER BY word""".stripMargin,

    "pagerank_contribs" ->
      """WITH deg AS (SELECT o_custkey, count(*) AS outdeg FROM orders GROUP BY 1)
        |SELECT CAST(o_orderkey AS VARCHAR) AS url,
        |       round(sum(CAST(1.0 AS DOUBLE) / (outdeg + 1)), 6) AS rank
        |FROM orders JOIN deg USING (o_custkey)
        |GROUP BY 1 ORDER BY url""".stripMargin,

    "twitter_filter_count" ->
      "SELECT 'result' AS name, count(*) AS cnt FROM customer WHERE c_acctbal > 50"
  )

  // ----------------------------------------------------------------------
  // Relational breadth (filled in incrementally — SURVEY.md §7.2 step 4).
  // ----------------------------------------------------------------------

  /** Exact cross-engine sum: double sums differ between engines in the
    * last ulp, which can flip a round() at a .xx5 boundary. Casting each
    * term to DECIMAL(18,4) first makes the sum exact (and identical) in
    * both Spark and DuckDB; the result is cast back to double.
    * DuckDB twin: CAST(sum(CAST(x AS DECIMAL(18,4))) AS DOUBLE). */
  private def dsum(c: Column): Column =
    sum(c.cast(org.apache.spark.sql.types.DecimalType(18, 4))).cast("double")

  private def relationalQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: partial+final hash agg, one shuffle
    // on the (tiny-cardinality) group key; map-side combine makes this
    // scan-bound at 100 TB.
    "q1_pricing_summary" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(dsum(col("l_quantity")), 2).as("sum_qty"),
          round(dsum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(dsum(col("l_quantity")) / count(lit(1)), 6).as("avg_qty"),
          round(dsum(col("l_discount")) / count(lit(1)), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"))
  )

  private def relationalOracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_qty,
        |       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_base_price,
        |       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_disc_price,
        |       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS avg_qty,
        |       round(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
