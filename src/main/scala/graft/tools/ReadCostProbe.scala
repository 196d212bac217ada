package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: isolated cost of `spark.read.parquet` relation resolution
  * (file listing + footer schema read) per table, repeated — the part of
  * every query's build cost a catalog-cached relation would amortize.
  * Usage: runMain graft.tools.ReadCostProbe <sfDir>
  */
object ReadCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (t <- Seq("lineitem", "orders", "documents", "events", "nation")) {
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        spark.read.parquet(s"$sfDir/$t.parquet")
        val dt = (System.nanoTime() - t0) / 1e6
        println(f"read $t pass $i: $dt%.1f ms")
      }
    }
    spark.stop()
  }
}
