package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off staging diagnostics: df-distribution volume terms for the
  * capped shared-count staging at a given corpus dir.
  *
  * Usage: runMain graft.tools.DiagStage <sfDir>
  */
object DiagStage {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // local-mode heartbeats share the JVM with the work; a GC pause
      // past spark.network.timeout kills the context (see Soak.scala)
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sh = graft.operators.Dedup.stagedShingles(spark, dir)
    val dfTab = sh.groupBy("shingle").agg(count(lit(1)).as("df")).cache()
    val nDocs = sh.select("doc_id").distinct().count()
    val cap = math.max(64L, (nDocs + 199) / 200)
    println(s"DIAG n_docs=$nDocs cap=$cap")
    val agg = dfTab.agg(
      count(lit(1)).as("vocab"),
      sum("df").as("postings"),
      max("df").as("max_df"),
      sum(expr("df * (df - 1) / 2")).as("pairs_all"),
      sum(when(col("df") <= cap, expr("df * (df - 1) / 2")).otherwise(0L)).as("pairs_rare"),
      sum(when(col("df") > cap, expr("df * (df - 1) / 2")).otherwise(0L)).as("pairs_stop"),
      sum(when(col("df") > cap, 1L).otherwise(0L)).as("stop_vocab"),
      sum(when(col("df") > cap, col("df")).otherwise(0L)).as("stop_postings")
    ).collect()(0)
    println(s"DIAG ${agg.schema.fieldNames.zip(agg.toSeq).map { case (k, v) => s"$k=$v" }.mkString(" ")}")
    // per-doc stop-set sizes
    val stop = dfTab.filter(col("df") > cap).select("shingle")
    val perDoc = sh.join(stop, Seq("shingle")).groupBy("doc_id").agg(count(lit(1)).as("nstop"))
      .agg(max("nstop").as("max_stop_per_doc"), avg("nstop").as("avg_stop_per_doc"),
        count(lit(1)).as("docs_with_stop")).collect()(0)
    println(s"DIAG ${perDoc.schema.fieldNames.zip(perDoc.toSeq).map { case (k, v) => s"$k=$v" }.mkString(" ")}")
    spark.stop()
  }
}
