package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Pipeline
import graft.sources.VersionedStore
import graft.streaming.CdcApply

/** Streaming CDC apply: the versioned per-batch fold must equal a
  * from-scratch latest-wins replay of the whole changelog, batch replay
  * must be idempotent (version-pinned pre-state), and every
  * intermediate snapshot version must stay readable.
  */
class CdcApplySpec extends SparkSpec {

  private def writeOne(df: DataFrame, dest: java.nio.file.Path): Unit = {
    val tmp = Files.createTempDirectory("graft-cdc-stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, dest): Unit
  }

  test("CDC fold equals global replay; restart resumes; versions time-travel") {
    val ev = Tables.events(spark, sf0001)
      .select("user_id", "ts", "event_id", "event_type", "value")
    val cut = "2024-01-15"
    val seed = Pipeline.latestPerKey(ev.filter(col("ts") < lit(cut)))
      .filter(col("event_type") =!= "error")
      .select("user_id", "ts", "event_type", "value")
    val rest = ev.filter(col("ts") >= lit(cut))

    val in = Files.createTempDirectory("graft-cdc-in")
    val cp = Files.createTempDirectory("graft-cdc-cp").toString
    val base = Files.createTempDirectory("graft-cdc-store").toString + "/state"

    // three chronological changelog chunks, one file (= one batch) each
    writeOne(rest.filter(col("ts") < lit("2024-01-20")), in.resolve("c1.parquet"))
    Thread.sleep(1100) // strictly later mtime => deterministic batch order
    writeOne(rest.filter(col("ts") >= lit("2024-01-20") && col("ts") < lit("2024-01-25")),
      in.resolve("c2.parquet"))
    Thread.sleep(1100)

    CdcApply.start(spark, ev, seed, in.toString, base, cp).awaitTermination()
    assert(VersionedStore.listVersions(base) === Seq(0L, 1L, 2L),
      "seed + one version per batch")

    // restart with the same checkpoint over a grown changelog: only the
    // new file folds, as batch 2 against pinned pre-state v=2
    writeOne(rest.filter(col("ts") >= lit("2024-01-25")), in.resolve("c3.parquet"))
    CdcApply.start(spark, ev, seed, in.toString, base, cp).awaitTermination()
    assert(VersionedStore.listVersions(base) === Seq(0L, 1L, 2L, 3L))

    // final snapshot == from-scratch latest-wins replay of ALL events
    val want = Pipeline.latestPerKey(ev)
      .filter(col("event_type") =!= "error")
      .select("user_id", "ts", "event_type", "value")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    val got = VersionedStore.readLatest(spark, base)
      .select("user_id", "ts", "event_type", "value")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(got === want)

    // time travel: v=1 is exactly seed folded with chunk 1 alone
    val v1want = CdcApply.foldState(
        seed, Pipeline.latestPerKey(rest.filter(col("ts") < lit("2024-01-20"))))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    val v1got = VersionedStore.readVersion(spark, base, 1L)
      .select("user_id", "ts", "event_type", "value")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(v1got === v1want)

    // seed immutability: a restart with a DIFFERENT seed must not
    // rewrite v=0 — the existing immutable seed wins (a changed seed on
    // restart would silently fork history; a crash mid-rewrite would
    // leave v=0 half-written under readable later versions)
    val v0Before = VersionedStore.readVersion(spark, base, 0L)
      .collect().map(_.toSeq).sortBy(_.toString)
    CdcApply.start(spark, ev, seed.limit(1), in.toString, base, cp)
      .awaitTermination()
    val v0After = VersionedStore.readVersion(spark, base, 0L)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(v0After === v0Before, "restart must not rewrite seed v=0")
    assert(VersionedStore.listVersions(base) === Seq(0L, 1L, 2L, 3L))
  }
}
