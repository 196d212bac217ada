package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The three reference pipelines (shingjan/Crane `app/&#42;_topology.py`),
  * re-expressed as declarative DataFrame transforms.
  *
  * Each transform takes an input DataFrame and returns the result frame, so
  * the same operator runs over the reference's own CSV fixtures (golden
  * tests), the parquet testdata (driver oracle), or a streaming DataFrame
  * (graft.streaming) — Catalyst plans partial/final aggregation and the
  * hash shuffle that Crane approximated with random routing + master-side
  * merge (reference `crane_master.py:95-98`, `crane_slave.py:61-64`).
  *
  * Semantic fine print preserved (SURVEY.md §2.2):
  *   - wordcount splits on a SINGLE space keeping empty tokens
  *     (reference `app/word_count_topology.py:12-13`) → `split(col, " ", -1)`;
  *   - pagerank weight is 1/(outdegree+1), one contribution round, and
  *     isolated nodes emit nothing (reference `app/page_rank_topology.py:13-18`);
  *   - twitter filter is strict `> 50` and yields the single row
  *     ('result', N) even on empty input (reference
  *     `app/twitter_user_filter_topology.py:13-14,30`).
  */
object Parity {

  /** WordCount over a column of text lines → (word, cnt).
    * Maps reference O1/O3/O4/O5: source → tokenizing flatMap → partial
    * hash agg → final agg. Spark's HashAggregateExec does the
    * partial/final split automatically; at 100 TB this is a single
    * map-side-combined shuffle on `word`.
    */
  def wordCount(lines: DataFrame, textCol: String = "value"): DataFrame =
    lines
      .select(explode(split(col(textCol), " ", -1)).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** One round of PageRank contributions over an adjacency-list frame
    * with columns (src, neighbors: array<string>). Weight = 1/(n+1) per
    * the Crane topology (NOT the 1/n of the reference's own Spark twin —
    * SURVEY.md §2.2.1). Isolated nodes (empty neighbor list) emit nothing.
    */
  def pageRankContribs(adj: DataFrame): DataFrame =
    adj
      .filter(size(col("neighbors")) > 0)
      .select(
        explode(col("neighbors")).as("url"),
        (lit(1.0) / (size(col("neighbors")) + lit(1))).as("contrib"))
      .groupBy("url")
      .agg(sum("contrib").as("rank"))

  /** Parse reference tab-separated adjacency lines ("src\tn1\t…\tnK")
    * into (src, neighbors). Isolated nodes have K=0. */
  def parseAdjacency(lines: DataFrame, textCol: String = "value"): DataFrame = {
    val parts = split(col(textCol), "\t")
    lines.select(
      parts.getItem(0).as("src"),
      slice(parts, 2, Int.MaxValue).as("neighbors"))
  }

  /** Filter rows by a strict numeric predicate and emit the single row
    * ('result', N). A global aggregate returns one row even on empty
    * input, matching the reference's counter bolt. */
  def filterCount(rows: DataFrame, predicateCol: String, threshold: Double): DataFrame =
    rows
      .filter(col(predicateCol) > threshold)
      .agg(count(lit(1)).as("cnt"))
      .select(lit("result").as("name"), col("cnt"))

  /** Parse reference "name,followers" CSV lines. */
  def parseTwitter(lines: DataFrame, textCol: String = "value"): DataFrame = {
    val parts = split(col(textCol), ",")
    lines.select(
      parts.getItem(0).as("name"),
      parts.getItem(1).cast("int").as("followers"))
  }
}
