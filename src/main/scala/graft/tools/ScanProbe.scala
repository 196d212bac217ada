package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: cost of decode vs decode+repartition on the single-row-group
  * testdata files. Usage: runMain graft.tools.ScanProbe <sfDir>
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"$label pass $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    val li = () => spark.read.parquet(s"$sfDir/lineitem.parquet")
    time("decode-only       ")(li().queryExecution.toRdd.foreach(_ => ()))
    val agg = (df: org.apache.spark.sql.DataFrame) => df
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity"), sum("l_extendedprice"), avg("l_discount"), count(lit(1)))
    time("q1-shaped direct  ")(agg(li()).queryExecution.toRdd.foreach(_ => ()))
    time("q1-shaped repart  ")(agg(li().repartition(32)).queryExecution.toRdd.foreach(_ => ()))
    val docs = () => spark.read.parquet(s"$sfDir/documents.parquet")
    val shingle = (df: org.apache.spark.sql.DataFrame) => df
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
      .groupBy("doc_id").agg(countDistinct("h"))
    time("shingle direct    ")(shingle(docs()).queryExecution.toRdd.foreach(_ => ()))
    time("shingle repart    ")(shingle(docs().repartition(32)).queryExecution.toRdd.foreach(_ => ()))
    spark.stop()
  }
}
