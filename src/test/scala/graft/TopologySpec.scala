package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Parity
import graft.streaming.{Streams, Topology}

class TopologySpec extends SparkSpec {

  test("Topology facade reproduces the wordcount pipeline (batch and stream)") {
    // file source needs a directory for streaming: stage the fixture
    val streamDir = Files.createTempDirectory("graft-topo-in")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/reference/app/wordcount2k.csv"),
      streamDir.resolve("part-0.txt"))
    val topo = Topology("word_count")
      .spout(streamDir.toString)
      .bolt(Parity.wordCount(_))
    val batch = topo.run(spark).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Parity.wordCount(spark.read.text("/root/reference/app/wordcount2k.csv"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(batch === direct)

    val q = topo.runStream(spark).writeStream
      .outputMode("complete").format("memory").queryName("topo_wc")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("topo_wc").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === direct)
  }

  test("topology with versioned top-k sink: one version per batch, resume picks up new data") {
    import graft.sources.VersionedStore
    val in = Files.createTempDirectory("graft-topk-in")
    Files.writeString(in.resolve("a.txt"), "b b b a a c\n")
    Files.writeString(in.resolve("b.txt"), "a a d d e\n")
    val base = Files.createTempDirectory("graft-topk-store").toString
    val cp = Files.createTempDirectory("graft-topk-cp").toString

    // Crane's "final result dump", upgraded: complete-mode aggregation
    // state → per-trigger top-5 → one immutable store version per
    // micro-batch, exactly-once via checkpoint + idempotent versions.
    def runOnce(): Unit = {
      val counts = Parity.wordCount(
        spark.readStream.option("maxFilesPerTrigger", 1).text(in.toString))
      val q = counts.writeStream.outputMode("complete")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          VersionedStore.writeBatch(
            batch.orderBy(desc("cnt"), col("word")).limit(5), base, id): Unit
        }
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    runOnce()
    val versions1 = VersionedStore.listVersions(base)
    assert(versions1.size === 2, s"one version per micro-batch, got $versions1")

    def topOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq

    // a third file lands; resume from the same checkpoint processes ONLY it
    Files.writeString(in.resolve("c.txt"), "e e e e\n")
    runOnce()
    val versions2 = VersionedStore.listVersions(base)
    assert(versions2.size === 3, s"resume adds exactly one version, got $versions2")

    val want = topOf(Parity.wordCount(spark.read.text(in.toString))
      .orderBy(desc("cnt"), col("word")).limit(5))
    assert(topOf(VersionedStore.readLatest(spark, base)
      .orderBy(desc("cnt"), col("word"))) === want)
  }

  test("two topologies run concurrently in one session (the master-registry analogue)") {
    // Crane's master runs ONE topology selected from its registry
    // (reference crane_master.py:177-193); SparkEntry.queries is that
    // registry here, and one SparkSession supersets the master by
    // running several checkpointed streaming topologies AT ONCE — each
    // with its own source dir, checkpoint, and sink, draining
    // independently to correct results.
    val wcIn = Files.createTempDirectory("graft-conc-wc-in")
    val twIn = Files.createTempDirectory("graft-conc-tw-in")
    Files.writeString(wcIn.resolve("a.txt"), "x y\nx z\n")
    Files.writeString(twIn.resolve("a.txt"), "alice,60\nbob,40\ncarol,80\n")

    val wcQ = Streams.wordCountStream(spark, wcIn.toString)
      .writeStream.outputMode("complete").format("memory").queryName("conc_wc")
      .option("checkpointLocation", Files.createTempDirectory("graft-conc-wc-cp").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    val twQ = Streams.twitterStream(spark, twIn.toString)
      .writeStream.outputMode("complete").format("memory").queryName("conc_tw")
      .option("checkpointLocation", Files.createTempDirectory("graft-conc-tw-cp").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()

    // both live at once before either drains
    assert(spark.streams.active.count(q => q.name == "conc_wc" || q.name == "conc_tw") === 2,
      "both topologies must be active concurrently")
    wcQ.awaitTermination()
    twQ.awaitTermination()

    val wc = spark.table("conc_wc").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wc === Map("x" -> 2L, "y" -> 1L, "z" -> 1L))
    val tw = spark.table("conc_tw").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(tw.toSeq === Seq(("result", 2L))) // strict > 50: alice, carol
  }

  test("streaming dedup drops watermark-horizon duplicates") {
    val ev = Tables.events(spark, sf0001)
    val dir = Files.createTempDirectory("graft-dedup-in").toString
    // duplicate every event once → exact dup stream
    ev.union(ev).write.mode("overwrite").parquet(dir)
    val streamed = spark.readStream.schema(ev.schema).parquet(dir)
    val q = Streams.dedupStream(streamed, Seq("event_id"))
      .writeStream.outputMode("append").format("memory").queryName("dedup_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val n = spark.table("dedup_stream").count()
    assert(n === ev.count(), s"expected ${ev.count()} unique events, got $n")
  }
}
