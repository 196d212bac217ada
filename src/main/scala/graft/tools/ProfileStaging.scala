package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolated A/B profile of the df-capped shared-count staging chain —
  * the one artifact whose 10× cost swung 65–136 s between identical
  * soak runs (BASELINE.md round 8). Two questions, answered with
  * instruments rather than attribution:
  *
  *  1. WHERE the time goes: the shingle staging, the capped shared-count
  *     staging, and the consumer query are timed separately (each phase
  *     cold exactly once per session — `Staged` keys are session-scoped,
  *     so a fresh JVM re-stages from scratch).
  *  2. WHETHER the swing is host CPU steal: each phase reads
  *     /proc/stat's steal jiffies before/after — a slow pass with high
  *     steal_pct is the hypervisor's fault; a slow pass with ~0 steal
  *     is real work and needs a plan fix.
  *
  * Run it twice (two JVMs) for the A/B: the artifact APPENDS, so both
  * sessions land in one committed jsonl.
  *
  * Usage: runMain graft.tools.ProfileStaging [sfDir] [outJsonl] [passes]
  */
object ProfileStaging {

  /** JVM-internal suspects for run-to-run variance at ~zero host steal:
    * cumulative stop-the-world GC time and JIT compiler-thread time
    * (C2 recompilation of the big generated join kernels). */
  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }
  private def jitMillis(): Long =
    java.lang.management.ManagementFactory.getCompilationMXBean.getTotalCompilationTime

  /** The -XX:CICompilerCount this JVM actually runs with (0 = JVM
    * default, i.e. the flag was not passed) — makes the A/B artifact
    * self-describing: flag-on and flag-off sessions are distinguishable
    * in the jsonl without cross-referencing shell history. */
  private def ciCount(): Int = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getRuntimeMXBean.getInputArguments.asScala
      .collectFirst { case a if a.startsWith("-XX:CICompilerCount=") =>
        a.stripPrefix("-XX:CICompilerCount=").toInt }
      .getOrElse(0)
  }

  /** (steal jiffies, total jiffies) from the aggregate cpu line. */
  private def cpuStat(): (Long, Long) = {
    val src = scala.io.Source.fromFile("/proc/stat")
    try {
      val f = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
      (if (f.length > 7) f(7) else 0L, f.sum)
    } finally src.close()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "bench_local/soak_sf1"
    val outPath = if (args.length > 1) args(1) else "bench_local/profile_staging_r9.jsonl"
    val passes = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // local-mode heartbeats share the JVM with the work; a GC pause
      // past spark.network.timeout kills the context (see Soak.scala)
      .config("spark.network.timeout", "600s")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sid = java.util.UUID.randomUUID().toString.take(8)
    val f = new java.io.File(outPath)
    Option(f.getParentFile).foreach(_.mkdirs())
    val log = new java.io.PrintWriter(new java.io.FileWriter(f, true), true)
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def timed(phase: String)(body: => Unit): Unit = {
      val (st0, tot0) = cpuStat(); val gc0 = gcMillis(); val jit0 = jitMillis()
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      val (st1, tot1) = cpuStat()
      val steal = 100.0 * (st1 - st0) / math.max(1L, tot1 - tot0)
      log.println(s"""{"session":"$sid","sf":"$sfDir","phase":"$phase","ci_count":${ciCount()},"sec":${fmt(sec)},"steal_pct":${fmt(steal)},"gc_ms":${gcMillis() - gc0},"jit_ms":${jitMillis() - jit0}}""")
      println(s"PROFILE $sid $phase: ${fmt(sec)}s steal=${fmt(steal)}% gc=${gcMillis() - gc0}ms jit=${jitMillis() - jit0}ms")
    }

    // phase 1: shingle staging alone (cold — first reference this JVM)
    timed("staging_shingles") {
      graft.operators.Dedup.stagedShingles(spark, sfDir)
        .queryExecution.toRdd.foreach(_ => ())
    }
    // phase 2: rep-level capped shared-count staging (shingles warm)
    timed("staging_cappedshared") {
      graft.operators.Dedup.stagedCappedSharedReps(spark, sfDir)
        .queryExecution.toRdd.foreach(_ => ())
    }
    // phases 3..: the consumer query over the now-warm staged artifact
    for (p <- 1 to passes) timed(s"dedup_containment_pass$p") {
      graft.SparkEntry.queries("dedup_containment")(spark, sfDir)
        .queryExecution.toRdd.foreach(_ => ())
    }
    log.close()
    spark.stop()
  }
}
