package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Driver-contract bindings of the parity trio to the testdata tables
  * (the reference's own CSV fixtures are covered by golden tests in
  * ParitySpec; the DuckDB oracle runs over parquet tables only).
  */
object ParityQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O1+O3+O4+O5: tokenize + count (reference app/word_count_topology.py)
    "wordcount" -> ((s, dir) =>
      Parity.wordCount(Tables.documents(s, dir), textCol = "text")
        .orderBy("word")),

    // O6+O7: one contribution round, weight 1/(n+1)
    // (reference app/page_rank_topology.py:13-18). Adjacency derived from
    // orders: src=o_custkey, neighbors=its o_orderkeys. collect_list
    // exercises the adjacency-build operator; with skewed fan-out at
    // scale, prefer the pure degree-join form (groupBy count + join) that
    // never materializes neighbor arrays — Parity.pageRankContribs
    // accepts either since it explodes immediately.
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

  def oracles: Map[String, String] = Map(
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
}
