package graft.core

import org.apache.spark.sql.SparkSession

/** Master-string selection for every runnable main (Bench/Verify/probes).
  *
  * Default is in-process `local[cpus]`. Setting SPARK_GRAFT_MASTER to a
  * `local-cluster[workers,coresPerWorker,memPerWorkerMB]` string runs the
  * SAME code across a real process boundary: the Worker launches each
  * executor as a separate JVM, so task closures, custom Expressions,
  * TypedImperativeAggregate buffers and stateful processors must survive
  * real serialization and Netty shuffle — the one dimension plain local
  * mode never exercises. Requires SPARK_HOME to point at a full Spark
  * distribution (the Worker builds the executor command from it) and the
  * application classes on the executor classpath, which local mode gets
  * for free from the driver's loader:
  *   - spark.executor.extraClassPath ← SPARK_GRAFT_EXEC_CLASSPATH
  *     (default: ./target/scala-2.13/classes, sbt's output dir)
  *   - spark.executor.memory ← SPARK_GRAFT_EXEC_MEM (default 2600m,
  *     sized under the worker grant so one executor fits per worker)
  *
  * Also export SPARK_SCALA_VERSION=2.13: the in-process Worker builds
  * the executor command via the launcher's AbstractCommandBuilder, which
  * resolves the Scala version from that env var (normally exported by
  * the dist's load-spark-env.sh, which a local-cluster master bypasses);
  * without it every executor launch fails with "Cannot find any build
  * directories".
  */
object ExecMaster {
  def master(defaultCpus: String): String =
    sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$defaultCpus]")

  def isCluster: Boolean =
    sys.env.get("SPARK_GRAFT_MASTER").exists(_.startsWith("local-cluster"))

  /** Apply master + (when clustered) executor classpath/memory to a
    * builder. Call in place of `.master(s"local[$cpus]")`. */
  def configure(b: SparkSession.Builder, defaultCpus: String): SparkSession.Builder = {
    val m = master(defaultCpus)
    val withMaster = b.master(m)
    if (!m.startsWith("local-cluster")) withMaster
    else {
      val cp = sys.env.getOrElse("SPARK_GRAFT_EXEC_CLASSPATH",
        new java.io.File("target/scala-2.13/classes").getAbsolutePath)
      // executor memory must fit the per-worker grant (3rd field of the
      // master string) or SparkContext refuses to start; default to the
      // full grant so one executor occupies each worker
      val workerMb = """local-cluster\[\s*\d+\s*,\s*\d+\s*,\s*(\d+)\s*\]""".r
        .findFirstMatchIn(m).map(_.group(1)).getOrElse("2048")
      withMaster
        .config("spark.executor.extraClassPath", cp)
        .config("spark.executor.memory",
          sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", s"${workerMb}m"))
    }
  }
}
