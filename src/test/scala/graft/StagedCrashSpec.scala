package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.core.Staged

/** Crash consistency of the session-scoped staging layer (round-9
  * finding: one OOM'd staging build cascaded PATH_NOT_FOUND into every
  * later consumer). Two invariants:
  *  - a build that dies MID-WRITE registers nothing — the next consumer
  *    of the same key rebuilds cleanly instead of reading a half dir;
  *  - a registered dir that VANISHES (external cleanup, crashed-session
  *    debris) fails marker revalidation and is rebuilt fresh, never
  *    surfaced as a missing-path error.
  */
class StagedCrashSpec extends SparkSpec {

  private def rmrf(d: String): Unit = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(d)
    if (Files.exists(root))
      Files.walk(root).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
  }

  test("a build that dies mid-write is not registered; the next consumer rebuilds") {
    import spark.implicits._
    val key = "crash|midwrite"
    val bad = spark.range(100).select(col("id"),
      when(col("id") < 50, col("id"))
        .otherwise(raise_error(lit("induced mid-write failure")).cast("long"))
        .as("v"))
    val e = intercept[Exception] { Staged(spark, key)(bad).count() }
    assert(e.getMessage != null)
    // same key, healthy build: must succeed — a half-written dir from
    // the failed attempt must not be trusted (or even visible)
    val good = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(Staged(spark, key)(good).count() === 2)
  }

  test("a vanished registered dir is revalidated and rebuilt, not read") {
    import spark.implicits._
    val key = "crash|vanish"
    var builds = 0
    def build = { builds += 1; Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "v") }
    val first = Staged(spark, key)(build)
    assert(first.count() === 3 && builds === 1)
    // find the staged dir from the reader's file list and delete it out
    // from under the registration — the round-9 cascade scenario
    val dir = first.inputFiles.head.stripPrefix("file:").reverse.dropWhile(_ != '/').tail.reverse
    rmrf(dir)
    assert(!Files.exists(java.nio.file.Paths.get(dir)))
    val again = Staged(spark, key)(build)
    assert(again.count() === 3, "consumer after deletion must see a rebuilt stage")
    assert(builds === 2, "the vanished dir must have triggered exactly one rebuild")
    // and a further read reuses the rebuilt dir without building again
    assert(Staged(spark, key)(build).count() === 3)
    assert(builds === 2)
  }
}
