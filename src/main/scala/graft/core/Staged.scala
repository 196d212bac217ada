package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped parquet staging for multiply-referenced intermediates.
  *
  * A DataFrame referenced from several plan branches (or several
  * registered queries) is lazily re-evaluated per reference; staging it
  * once and reading the parquet back is the local analogue of
  * checkpointing a shared artifact (an inverted index, a signature
  * table, an edge list) before fanning out at cluster scale. Keys are
  * (session id, caller key); every stage dir is purged when the JVM
  * exits.
  */
object Staged {

  private val dirs = scala.collection.concurrent.TrieMap.empty[String, String]

  sys.addShutdownHook {
    dirs.values.foreach { d =>
      try {
        import java.nio.file.{Files, Paths}
        import scala.jdk.CollectionConverters._
        val root = Paths.get(d)
        if (Files.exists(root))
          Files.walk(root).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      } catch { case _: Throwable => () }
    }
  }

  /** Stable unique id per session, minted once into the session-local
    * runtime conf — hashCode can collide and doesn't identify a session. */
  private def sessionId(s: SparkSession): String = synchronized {
    val k = "graft.stage.session.id"
    s.conf.getOption(k).getOrElse {
      val id = java.util.UUID.randomUUID().toString
      s.conf.set(k, id)
      id
    }
  }

  /** Build-once, read-many: materialize `build` to a temp parquet dir on
    * first use of (session, key) and return a reader over it. */
  def apply(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    s.read.parquet(materialize(s, key)(d => build.write.mode("overwrite").parquet(d)))

  /** Generalized build-once: hand `build` a fresh temp dir on first use of
    * (session, key) and return that dir ever after — for stagings that are
    * not a plain parquet dump (partitioned layouts, bucketed tables). The
    * dir joins the same shutdown-purge list as [[apply]]'s stages. */
  def materialize(s: SparkSession, key: String)(build: String => Unit): String =
    dirs.getOrElseUpdate(sessionId(s) + "|" + key, {
      val d = java.nio.file.Files.createTempDirectory("graft-stage").toString
      build(d)
      d
    })
}
