package graft.tools

import java.util.concurrent.{Callable, ExecutionException, Executors, TimeUnit, TimeoutException}

import org.apache.spark.sql.SparkSession

/** Scale soak: run the ENTIRE registered query surface against a
  * SoakGen-replicated directory (~10x the largest shipped scale factor)
  * and record per-query status, wall clock, and output cardinality.
  *
  * Unlike Bench this is a survival run, not a latency measurement: each
  * query gets a hard per-query timeout (default 600 s) enforced by
  * `cancelJobGroup` so one quadratic blowup cannot hang the whole soak,
  * and results stream to a JSONL log line-by-line so a crash (OOM, host
  * reset) still leaves the per-query record up to that point. The log is
  * the committed artifact: at 10x data a linear query shows ~10x the
  * sf0.1 bench time, and anything wildly super-linear (or timed out) is
  * a scale cliff the small-SF bench hid.
  *
  * FAILURE ISOLATION (round-9 finding): an executor-thread OOM can stop
  * the local-mode SparkContext; the round-9 30x soak kept submitting
  * queries to the dead context and recorded 7 spurious failures for one
  * real one. Now every iteration checks `sparkContext.isStopped` after
  * the query returns and REBUILDS the session before the next query —
  * one blowup yields one failure row, and the rebuild is logged as its
  * own JSONL line (`session_rebuilt`) so the artifact shows exactly
  * where isolation kicked in. A rebuilt session re-stages its shared
  * artifacts from scratch (Staged keys are session-scoped), so later
  * queries never read a dir the dying session half-wrote.
  *
  * Output rows are drained distributed through the same
  * `queryExecution.toRdd.foreach` full-materialization path as Bench,
  * with a LongAccumulator counting rows — cardinality is evidence (e.g.
  * the N-way exact-duplicate clusters SoakGen plants must multiply dedup
  * pair counts ~N^2/2-fold, and a pair generator whose count scales
  * WORSE than that is broken, not just slow).
  *
  * Usage: runMain graft.tools.Soak [sfDir] [outJsonl] [name ...]
  * (trailing names restrict the soak to those queries — the incremental
  * re-soak path for queries added/changed since the last full run)
  * Env: SPARK_GRAFT_SOAK_TIMEOUT (sec/query), SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_SOAK_CONF ("k=v,k=v" extra session confs — e.g. a tiny
  * graft.stage.budget to induce a failure and prove isolation).
  */
object Soak {

  /** Fresh soak session (also the rebuild path after a dead context). */
  private[tools] def buildSession(cpus: String): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val builder = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Heartbeats ride the same JVM as the work in local mode: a
      // GC/compute pause longer than spark.network.timeout (120 s
      // default) makes HeartbeatReceiver declare the in-process
      // executor dead, which STOPS the whole context — observed once
      // draining an 855 M-row pair output at 100x (a 132 s starvation).
      // A soak exists to survive exactly that class of pause.
      .config("spark.network.timeout", "600s")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    // A heartbeat-death stop runs asynchronously; a rebuild racing it
    // can be handed the half-stopped context (stopped flag up, active
    // registration not yet cleared) and throws from the session
    // constructor. Back off until the stop finishes deregistering.
    var spark: SparkSession = null
    var waitedMs = 0L
    while (spark == null) {
      try spark = builder.getOrCreate()
      catch {
        // Only the half-stopped-context race is worth waiting out; any
        // other IllegalStateException is a real misconfiguration and
        // must fail fast instead of burning the full 120 s backoff.
        // Every retry is logged so a stuck rebuild is visible in the
        // soak's stderr, not silently absorbed.
        case e: IllegalStateException
            if waitedMs < 120000 &&
              Option(e.getMessage).exists(m =>
                m.contains("stopped") || m.contains("shutdown")) =>
          System.err.println(
            s"SOAK: context stop in flight, retrying getOrCreate (waited ${waitedMs}ms): ${e.getMessage}")
          Thread.sleep(2000); waitedMs += 2000
          SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      }
    }
    spark.sparkContext.setLogLevel("WARN")
    // Soak measures scale survival of the SCALE shape: approx queries
    // run their sketch alone (see graft.core.ApproxGate); Verify keeps
    // the ε-gated form for the correctness gate.
    spark.conf.set("graft.approx.exactGate", "false")
    for (kv <- sys.env.getOrElse("SPARK_GRAFT_SOAK_CONF", "").split(',') if kv.contains('='))
      spark.conf.set(kv.takeWhile(_ != '='), kv.dropWhile(_ != '=').drop(1))
    spark
  }

  /** The isolation primitive, factored out for SoakIsolationSpec: a live
    * session passes through untouched; a stopped context is replaced by
    * a fresh session so the next query runs against real infrastructure
    * instead of cascading "stopped SparkContext" errors. */
  private[tools] def ensureLive(spark: SparkSession, cpus: String): (SparkSession, Boolean) =
    if (spark.sparkContext.isStopped) (buildSession(cpus), true) else (spark, false)

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "bench_local/soak_sf1"
    val outPath = if (args.length > 1) args(1) else "bench_local/soak_r7.jsonl"
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_SOAK_TIMEOUT", "600").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var spark = buildSession(cpus)

    val outFile = new java.io.File(outPath)
    Option(outFile.getParentFile).foreach(_.mkdirs())
    val log = new java.io.PrintWriter(new java.io.FileWriter(outFile, false), true)
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", " ").take(300)

    val names = {
      val all = graft.SparkEntry.queries.keys.toSeq.sorted
      if (args.length > 2) {
        val want = args.drop(2).toSet
        val unknown = want -- all.toSet
        require(unknown.isEmpty, s"unknown query names: ${unknown.mkString(", ")}")
        all.filter(want)
      } else all
    }
    // a stuck worker thread (cancel not honored) must not block the rest
    // of the soak: abandon its executor and continue on a fresh one
    var exec = Executors.newSingleThreadExecutor()
    var okN, errN, toN, rebuilds = 0
    for (name <- names) {
      val s = spark // stable reference for the worker thread
      val acc = s.sparkContext.longAccumulator(s"rows_$name")
      val t0 = System.nanoTime()
      val fut = exec.submit(new Callable[Unit] {
        def call(): Unit = {
          // job-group tagging is thread-local: set it on the thread that
          // actually triggers the jobs so cancelGroup reaches them
          s.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
          // bind to a call-local: referencing the outer `acc` field would
          // make the lambda capture this Callable (and its SparkSession),
          // which is not serializable
          val a = acc
          graft.SparkEntry.queries(name)(s, sfDir)
            .queryExecution.toRdd.foreach { _ => a.add(1L) }
        }
      })
      val (status, err) =
        try { fut.get(timeoutSec, TimeUnit.SECONDS); ("ok", "") }
        catch {
          case _: TimeoutException =>
            s.sparkContext.cancelJobGroup(name)
            try fut.get(30, TimeUnit.SECONDS) catch { case _: Throwable => () }
            if (!fut.isDone) { exec.shutdownNow(); exec = Executors.newSingleThreadExecutor() }
            ("timeout", s"exceeded ${timeoutSec}s")
          case e: ExecutionException =>
            val c = Option(e.getCause).getOrElse(e)
            ("error", s"${c.getClass.getSimpleName}: ${Option(c.getMessage).getOrElse("")}")
        }
      val sec = (System.nanoTime() - t0) / 1e9
      status match {
        case "ok" => okN += 1; case "timeout" => toN += 1; case _ => errN += 1
      }
      val secS = String.format(java.util.Locale.ROOT, "%.1f", Double.box(sec))
      log.println(s"""{"q":"$name","status":"$status","sec":$secS,"rows":${acc.value},"err":"${esc(err)}"}""")
      println(s"SOAK $name: $status ${secS}s rows=${acc.value} $err")
      // failure isolation: a fatal error (OOM) that stopped the context
      // must cost exactly one failure row, not the rest of the run. If
      // the rebuild itself is impossible (a deadlocked context stop),
      // record THAT and fall through to the summary — a crashed main
      // loses the artifact's tail, which is worse than a partial run.
      try {
        val (live, rebuilt) = ensureLive(spark, cpus)
        if (rebuilt) {
          spark = live
          rebuilds += 1
          log.println(s"""{"session_rebuilt":true,"after":"$name"}""")
          println(s"SOAK session rebuilt after $name (context was stopped)")
        }
      } catch {
        case e: Throwable =>
          errN += 1
          log.println(s"""{"session_rebuild_failed":true,"after":"$name","err":"${esc(e.toString)}"}""")
          println(s"SOAK session rebuild FAILED after $name: $e — aborting remaining queries")
          log.println(s"""{"summary":true,"sf":"$sfDir","queries":${names.size},"ok":$okN,"error":$errN,"timeout":$toN,"session_rebuilds":$rebuilds,"aborted":true}""")
          log.close()
          sys.exit(1)
      }
    }
    log.println(s"""{"summary":true,"sf":"$sfDir","queries":${names.size},"ok":$okN,"error":$errN,"timeout":$toN,"session_rebuilds":$rebuilds}""")
    log.close()
    println(s"SOAK DONE ok=$okN error=$errN timeout=$toN rebuilds=$rebuilds -> $outPath")
    spark.stop()
    // abandoned stuck threads would otherwise keep the JVM alive
    sys.exit(if (errN + toN == 0) 0 else 1)
  }
}
