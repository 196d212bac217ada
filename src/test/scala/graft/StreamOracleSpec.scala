package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.streaming.StreamOracle

/** The oracle-registered streaming twins (graft.streaming.StreamOracle)
  * must (a) agree exactly with their batch formulations and (b) actually
  * run MULTI-batch — the whole point of registering them is that the
  * state store carries counts / windows / dedup keys across triggers,
  * which a single-micro-batch replay would never exercise. */
class StreamOracleSpec extends SparkSpec {

  private def rows(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf0001)
      .collect().map(_.mkString("|")).toSeq

  test("documents text is newline-free (the text-file round-trip invariant)") {
    val bad = Tables.documents(spark, sf0001)
      .filter(col("text").contains("\n") || col("text").contains("\r"))
      .count()
    assert(bad === 0L)
  }

  test("stream_wordcount equals batch wordcount after 4 micro-batches") {
    assert(rows("stream_wordcount") === rows("wordcount"))
  }

  test("stream_tumbling equals the batch tumbling windows") {
    val batch = SparkEntry.queries("events_tumbling")(spark, sf0001)
      .select("window_start", "event_type", "n")
      .collect().map(_.mkString("|")).toSeq
    assert(rows("stream_tumbling") === batch)
  }

  test("stream_dedup_keys emits exactly the distinct key set") {
    val batch = Tables.events(spark, sf0001)
      .select("user_id", "event_type").distinct()
      .orderBy("user_id", "event_type")
      .collect().map(_.mkString("|")).toSeq
    assert(rows("stream_dedup_keys") === batch)
  }

  test("stream_dedup_sink: distributed file sink equals the memory-sink twin; replay writes nothing") {
    val viaSink = rows("stream_dedup_sink")
    assert(viaSink === rows("stream_dedup_keys"),
      "file-sink drain must equal the memory-sink twin key set")
    // exactly-once on restart: re-running the SAME topology over the same
    // checkpoint + sink must commit no new batch and add no file — the
    // file sink's transaction log plus the source's processed-files log
    // make the replay a no-op
    val d = graft.core.Staged.materialize(spark, s"$sf0001|streamdedupsink")(_ =>
      fail("dedup sink staging should already exist from the twin run"))
    def sinkFiles() = new java.io.File(d, "data").listFiles()
      .filter(_.getName.startsWith("part-")).map(f => (f.getName, f.length)).sorted.toSeq
    val before = sinkFiles()
    graft.streaming.StreamOracle.dedupSinkRun(spark, sf0001, d)
    assert(sinkFiles() === before, "replay over the same checkpoint must be a sink no-op")
    assert(rows("stream_dedup_sink") === viaSink)
  }

  test("staged stream inputs are multi-file: >= 2 micro-batches per query") {
    // maxFilesPerTrigger=1 makes file count a lower bound on executed
    // triggers; the bytes-derived staging (floor 2 — see
    // StreamOracle.nBatches) must therefore leave >= 2 non-empty data
    // files even at the smallest scale factor
    for (key <- Seq("streamtext", "streamevents")) {
      val d = graft.core.Staged.materialize(spark, s"$sf0001|$key")(_ =>
        fail(s"$key staging should already exist from the twin runs"))
      val files = new java.io.File(d, "data").listFiles()
        .filter(f => f.getName.startsWith("part-") && f.length() > 0)
      assert(files.length >= 2, s"$key staged only ${files.length} non-empty files")
    }
  }
}
