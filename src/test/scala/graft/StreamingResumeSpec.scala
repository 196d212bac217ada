package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Parity
import graft.streaming.Streams

/** The delivery-guarantee upgrade over the reference: Crane replays whole
  * batches after a 40 s timeout and can double-count (at-least-once,
  * SURVEY.md §2.2.6). Structured Streaming checkpoints give exactly-once:
  * restarting a query over a grown input must not recount old data.
  */
class StreamingResumeSpec extends SparkSpec {

  test("checkpointed restart is exactly-once: no double-counting on resume") {
    val in = Files.createTempDirectory("graft-resume-in").toString
    val cp = Files.createTempDirectory("graft-resume-cp").toString
    Files.writeString(Paths.get(in, "a.txt"), "x y\nx z\n")

    def runOnce(name: String): Map[String, Long] = {
      val q = Streams.wordCountStream(spark, in)
        .writeStream.outputMode("complete").format("memory").queryName(name)
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.table(name).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }

    val first = runOnce("resume_run1")
    assert(first === Map("x" -> 2L, "y" -> 1L, "z" -> 1L))

    // grow the input, restart from the same checkpoint
    Files.writeString(Paths.get(in, "b.txt"), "x w\n")
    val second = runOnce("resume_run2")
    // exactly-once: old file not reprocessed twice, new file counted once
    assert(second === Map("x" -> 3L, "y" -> 1L, "z" -> 1L, "w" -> 1L))
  }

  test("maxFilesPerTrigger bounds each micro-batch (Crane's batch-size knob)") {
    val in = Files.createTempDirectory("graft-mbatch-in").toString
    for (i <- 1 to 4)
      Files.writeString(Paths.get(in, s"f$i.txt"), s"tok$i\n")
    val q = Streams.wordCountStream(spark, in, maxFilesPerTrigger = Some(1))
      .writeStream.outputMode("complete").format("memory").queryName("mbatch")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val progress = q.recentProgress
    assert(progress.count(_.numInputRows > 0) >= 4,
      s"expected ≥4 micro-batches of 1 file each, got ${progress.map(_.numInputRows).mkString(",")}")
    assert(spark.table("mbatch").count() === 4)
  }
}
