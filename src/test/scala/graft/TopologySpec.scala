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
