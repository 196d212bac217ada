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
    assert(last2.select("_version").distinct().collect().map(_.getInt(0)).sorted.toSeq === Seq(2, 3))
    assert(last2.count() === 3)

    // a new write never mutates existing versions (append-only layout)
    VersionedStore.write(Seq(7).toDF("x"), base)
    assert(VersionedStore.readVersion(spark, base, 1)
      .as[Int].collect().sorted.toSeq === Seq(1, 2, 3))
  }
}
