package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.VersionedStore

class VersionedStoreSpec extends SparkSpec {

  test("versioned writes, latest/specific/multi-version reads") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-versions").toString

    assert(VersionedStore.write(Seq(1, 2, 3).toDF("x"), base) === 1)
    assert(VersionedStore.write(Seq(4, 5).toDF("x"), base) === 2)
    assert(VersionedStore.write(Seq(6).toDF("x"), base) === 3)

    assert(VersionedStore.listVersions(base) === Seq(1, 2, 3))
    assert(VersionedStore.readLatest(spark, base).as[Int].collect().sorted.toSeq === Seq(6))
    assert(VersionedStore.readVersion(spark, base, 1)
      .as[Int].collect().sorted.toSeq === Seq(1, 2, 3))

    val last2 = VersionedStore.readVersions(spark, base, 2)
    assert(last2.select("_version").distinct().collect().map(_.getLong(0)).sorted.toSeq === Seq(2L, 3L))
    assert(last2.count() === 3)

    // a new write never mutates existing versions (append-only layout)
    VersionedStore.write(Seq(7).toDF("x"), base)
    assert(VersionedStore.readVersion(spark, base, 1)
      .as[Int].collect().sorted.toSeq === Seq(1, 2, 3))
  }

  test("foreachBatch versioned sink: one version per batch, exactly-once on rerun") {
    val in = Files.createTempDirectory("graft-vsink-in")
    Files.writeString(in.resolve("a.txt"), "alpha\nbeta\n")
    Files.writeString(in.resolve("b.txt"), "gamma\n")
    val base = Files.createTempDirectory("graft-vsink-store").toString
    val cp = Files.createTempDirectory("graft-vsink-cp").toString

    // one file per micro-batch → one store version per batch
    val stream = spark.readStream.option("maxFilesPerTrigger", 1).text(in.toString)
    graft.streaming.Streams.runVersionedSink(stream, base, cp)

    val versions = VersionedStore.listVersions(base)
    assert(versions.size === 2, s"expected one version per micro-batch, got $versions")
    val total = versions.map(v =>
      VersionedStore.readVersion(spark, base, v).count()).sum
    assert(total === 3, "sink must write every input line exactly once")

    // rerun with the same checkpoint: the drained source has no new
    // data, so no new versions and no duplicated rows
    graft.streaming.Streams.runVersionedSink(
      spark.readStream.option("maxFilesPerTrigger", 1).text(in.toString), base, cp)
    assert(VersionedStore.listVersions(base) === versions)
    assert(versions.map(v => VersionedStore.readVersion(spark, base, v).count()).sum === 3)
  }
}
