package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-file sink — the literal output format of the reference stack:
  * its Spark twin drains counts with `saveAsTextFiles`
  * (reference `spark_app/spark_wordcount.py:46`), and its master dumps
  * the final result as `k --- v` lines
  * (reference `crane_master.py:166-169`). Rendering is one projection
  * (concat_ws over string-cast columns), so the write is a plain
  * distributed text save: no driver collect, one file per partition,
  * same scale behavior as any other columnar sink.
  */
object TextSink {

  /** Render rows as the reference master's dump lines: all columns
    * string-cast and joined with " --- " into a single `value` column
    * (the schema `format("text")` requires). */
  def craneDump(df: DataFrame): DataFrame =
    df.select(concat_ws(" --- ", df.columns.map(c => col(c).cast("string")): _*)
      .as("value"))

  /** Write a result as text files in the reference dump format. */
  def write(df: DataFrame, dir: String): Unit =
    craneDump(df).write.mode("overwrite").format("text").save(dir)

  /** Read `key --- count` lines back into a typed two-column frame —
    * the inverse of [[write]] for count-shaped results. */
  def readCounts(spark: SparkSession, dir: String,
                 keyCol: String = "word", cntCol: String = "cnt"): DataFrame =
    spark.read.text(dir)
      .select(split(col("value"), " --- ").as("p"))
      .select(col("p").getItem(0).as(keyCol),
        col("p").getItem(1).cast("long").as(cntCol))
}
