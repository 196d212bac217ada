package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: decompose a query's per-execution latency into
  * (a) DataFrame construction + analysis + optimization + physical
  * planning (forcing executedPlan) and (b) distributed execution
  * (toRdd.foreach). Usage:
  *   runMain graft.tools.FloorProbe <sfDir> <queryName> [passes]
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val rawSfDir = args(0)
    val name = args(1)
    val passes = if (args.length > 2) args(2).toInt else 6
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.ExecMaster.configure(
        SparkSession.builder().withExtensions(new graft.plans.GraftExtensions), cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set(graft.core.ScanLayout.EnabledKey,
      sys.env.getOrElse("SPARK_GRAFT_AUTOLAYOUT", "false"))
    for (v <- sys.env.get("SPARK_GRAFT_SPLIT_BYTES"))
      spark.conf.set(graft.core.ScanLayout.SplitBytesKey, v)
    for (v <- sys.env.get("SPARK_GRAFT_SPLITS"))
      spark.conf.set(graft.core.ScanLayout.SplitsKey, v)
    // Arbitrary session-conf pass-through for A/B probes:
    // SPARK_GRAFT_CONF="k1=v1,k2=v2" (no escaping — probe keys/values
    // never contain ',' or '=')
    for (kvs <- sys.env.get("SPARK_GRAFT_CONF"); kv <- kvs.split(',');
         Array(k, v) <- Option(kv.split("=", 2)) if kv.nonEmpty)
      spark.conf.set(k, v)
    val sfDir = graft.core.ScanLayout.ensure(spark, rawSfDir)
    // Per-stage wall + task counts: pins how much of a query's latency is
    // single-task stages (the one-row-group testdata files cannot split).
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int, Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for (s <- si.submissionTime; c <- si.completionTime) yield c - s).getOrElse(-1L)
        // callsite (first token of the stage name) so a slow stage is
        // attributable to the operator that scheduled it
        stages.add((si.stageId, si.numTasks, wall, si.name.takeWhile(_ != '\n').take(40)))
      }
    })
    val fn = graft.SparkEntry.queries(name)
    (1 to passes).foreach { i =>
      stages.clear()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      val qe = df.queryExecution
      qe.executedPlan // forces analysis + optimization + physical planning
      val t2 = System.nanoTime()
      qe.toRdd.foreach(_ => ())
      val t3 = System.nanoTime()
      Thread.sleep(200) // let stage-completed events drain
      val st = stages.toArray(Array.empty[(Int, Int, Long, String)]).sortBy(_._1)
      val stStr = st.map { case (id, n, w, nm) =>
        if (w >= 1000) s"s$id[${n}t ${w}ms $nm]" else s"s$id[${n}t ${w}ms]" }.mkString(" ")
      println(f"pass $i: build=${(t1 - t0) / 1e9}%.3f plan=${(t2 - t1) / 1e9}%.3f exec=${(t3 - t2) / 1e9}%.3f total=${(t3 - t0) / 1e9}%.3f  $stStr")
    }
    spark.stop()
  }
}
