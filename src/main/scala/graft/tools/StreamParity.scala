package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Parity
import graft.streaming.Streams

/** Driver-visible stream ≡ batch parity artifact: run the three
  * reference topology twins (wordcount / pagerank-contribs / twitter
  * filter-count) BOTH as Structured Streaming (file source,
  * Trigger.AvailableNow, checkpointed) and as batch over the
  * reference's own shipped CSVs, and log one JSONL row per topology
  * with row counts and an exact-equality verdict — the same evidence
  * StreamingSpec asserts in sbt, persisted where the round artifacts
  * live (like the soak JSONLs) so the O2/O11 chain is inspectable
  * without running the test suite.
  *
  * Usage: runMain graft.tools.StreamParity [outJsonl]
  */
object StreamParity {
  def main(args: Array[String]): Unit = {
    val outPath = if (args.length > 0) args(0) else "bench_local/stream_parity_r8.jsonl"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val log = new java.io.PrintWriter(new java.io.FileWriter(outPath, false), true)

    def stage(file: String): (String, String) = {
      val in = Files.createTempDirectory("graft-parity-in")
      val cp = Files.createTempDirectory("graft-parity-cp")
      Files.copy(java.nio.file.Paths.get(file), in.resolve("part-0.txt"))
      (in.toString, cp.toString)
    }
    // canonical sorted (key, value-as-string) rendering: equal iff the
    // stream and batch results are exactly the same multiset of rows
    def canon(df: DataFrame): Seq[(String, String)] =
      df.collect().map(r => (String.valueOf(r.get(0)), String.valueOf(r.get(1))))
        .toSeq.sorted

    def check(name: String, src: String,
              stream: String => DataFrame, batch: () => DataFrame): Unit = {
      val (in, cp) = stage(src)
      val t0 = System.nanoTime()
      val got = canon(Streams.runToCompletion(spark, stream(in),
        s"parity_$name", checkpoint = Some(cp)))
      val secs = (System.nanoTime() - t0) / 1e9
      val want = canon(batch())
      val equal = got == want
      log.println(
        s"""{"topology":"$name","src":"${src.split('/').last}","stream_rows":${got.size},""" +
        s""""batch_rows":${want.size},"equal":$equal,"stream_secs":${f"$secs%.2f"}}""")
      if (!equal) {
        System.err.println(s"PARITY MISMATCH in $name")
        sys.exit(1)
      }
    }

    val app = "/root/reference/app"
    check("wordcount", s"$app/wordcount2k.csv",
      in => Streams.wordCountStream(spark, in),
      () => Parity.wordCount(spark.read.text(s"$app/wordcount2k.csv")))
    check("pagerank_contribs", s"$app/pagerank_42k.csv",
      in => Streams.pageRankStream(spark, in),
      () => Parity.pageRankContribs(
        Parity.parseAdjacency(spark.read.text(s"$app/pagerank_42k.csv"))))
    for (f <- Seq("twitter_1k.csv", "twitter_5k.csv"))
      check(s"twitter_filter_${f.takeWhile(_ != '.')}", s"$app/$f",
        in => Streams.twitterStream(spark, in),
        () => Parity.filterCount(
          Parity.parseTwitter(spark.read.text(s"$app/$f")), "followers", 50.0))

    log.close()
    println(s"stream parity artifact written: $outPath")
    spark.stop()
  }
}
