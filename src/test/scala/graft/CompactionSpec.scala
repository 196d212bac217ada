package graft

import org.apache.spark.sql.functions._

/** The compaction planner must drive a REAL rewrite: many small
  * day-shard files collapse into one file per planned bin, losing no
  * rows and keeping each output file on a contiguous day range (the
  * locality that lets partition-prune-style day predicates keep
  * skipping files after compaction).
  */
class CompactionSpec extends SparkSpec {

  test("executing the plan compacts small files into contiguous-day bins") {
    val ev = graft.core.Tables.events(spark, sf0001)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))

    // the small-file mess: one file per (event_type, day) shard
    val smallDir = java.nio.file.Files.createTempDirectory("graft-small").toString
    ev.repartition(col("event_type"), col("day"))
      .write.mode("overwrite").partitionBy("event_type", "day").parquet(smallDir)
    def dataFiles(dir: String): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty
      walk(new java.io.File(dir))
    }
    val smallCount = dataFiles(smallDir).size
    assert(smallCount >= 100, s"expected a small-file mess, got $smallCount files")

    // plan + execute: join the bin assignment back, one output file per bin
    val plan = SparkEntry.queries("layout_compaction")(spark, sf0001)
    val nBins = plan.select(countDistinct(col("event_type"), col("bin")))
      .collect()(0).getLong(0)
    val outDir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    spark.read.parquet(smallDir)
      .withColumn("day", col("day").cast("string"))
      .join(plan.select("event_type", "day", "bin"), Seq("event_type", "day"))
      .repartition(nBins.toInt, col("event_type"), col("bin"))
      .write.mode("overwrite").partitionBy("event_type", "bin").parquet(outDir)

    // each (event_type, bin) dir holds exactly one data file
    val outFiles = dataFiles(outDir)
    val binDirs = outFiles.map(_.getParentFile.toString).distinct
    assert(binDirs.size.toLong === nBins, s"${binDirs.size} bin dirs vs $nBins planned")
    binDirs.foreach { d =>
      val n = outFiles.count(_.getParentFile.toString == d)
      assert(n === 1, s"$d holds $n files; compaction should leave 1")
    }

    // no rows lost, and every output bin covers a contiguous day range
    val out = spark.read.parquet(outDir)
    assert(out.count() === ev.count())
    val plc = plan.collect()
    val byTypeBin = plc.groupBy(r =>
      (r.getAs[String]("event_type"), r.getAs[Long]("bin")))
    // contiguity is judged against THAT event_type's own day list (the
    // planner's window partitions by event_type): a day present globally
    // but absent for one type must not read as a gap in that type's bins
    val dayOrderByType = plc.groupBy(_.getAs[String]("event_type"))
      .map { case (t, rows) => t -> rows.map(_.getAs[String]("day")).distinct.sorted }
    byTypeBin.foreach { case ((t, b), rows) =>
      val days = rows.map(_.getAs[String]("day")).sorted
      val idx = days.map(d => dayOrderByType(t).indexOf(d))
      assert(idx.max - idx.min === idx.length - 1,
        s"bin ($t,$b) days not contiguous: ${days.mkString(",")}")
    }
  }
}
