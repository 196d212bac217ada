package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet snapshots — the Spark-native mapping of the
  * reference DFS's `sdfsname-v<N>` file versioning and `get-versions`
  * (reference `dfs/dfs_server.py:280-298,318-346`, SURVEY.md §3.3):
  * each write lands under `<base>/v=<N>`; reads address the latest or a
  * specific version. Replication/repair is the filesystem's job
  * (HDFS/S3), exactly as the survey scoped it.
  *
  * Layout is plain partition-style paths, so at scale a version is a
  * normal parquet dataset: pruned scans, schema per snapshot,
  * object-store friendly (no renames of existing data, append-only).
  */
object VersionedStore {

  private def versionDirs(base: String): Seq[(Long, String)] = {
    val p = Paths.get(base)
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val stream = Files.list(p) // must close: holds a directory handle
      try {
        val it = stream.iterator()
        val out = Seq.newBuilder[(Long, String)]
        while (it.hasNext) {
          val d = it.next()
          val name = d.getFileName.toString
          if (name.startsWith("v=") && Files.isDirectory(d))
            scala.util.Try(name.drop(2).toLong).toOption
              .foreach(v => out += v -> d.toString)
        }
        out.result().sortBy(_._1)
      } finally stream.close()
    }
  }

  def listVersions(base: String): Seq[Long] = versionDirs(base).map(_._1)

  /** True iff `v=<version>` exists AND carries the committer's _SUCCESS
    * marker — i.e. the snapshot write ran to completion. A directory
    * without the marker is a crashed write: callers deciding whether a
    * seed/first write already happened must use this, not bare
    * directory existence, or a half-written snapshot becomes permanent. */
  def isComplete(base: String, version: Long): Boolean =
    Files.exists(Paths.get(base, s"v=$version", "_SUCCESS"))

  /** One row per stored version with file count and byte size — the
    * analogue of the reference DFS's `ls` listing (its client prints
    * each stored replica per sdfs name, `dfs/dfs_client.py:146-157`);
    * here a version's "replicas" are its parquet part files and
    * durability is the filesystem's job, so the useful listing is
    * (version, files, bytes). Metadata-only: nothing reads row data. */
  def ls(base: String): Seq[VersionInfo] =
    versionDirs(base).map { case (v, dir) =>
      val stream = Files.walk(Paths.get(dir))
      try {
        var files = 0L
        var bytes = 0L
        val it = stream.iterator()
        while (it.hasNext) {
          val p = it.next()
          if (Files.isRegularFile(p) &&
              !p.getFileName.toString.startsWith("_") &&
              !p.getFileName.toString.startsWith(".")) {
            files += 1
            bytes += Files.size(p)
          }
        }
        VersionInfo(v, files, bytes)
      } finally stream.close()
    }

  final case class VersionInfo(version: Long, files: Long, bytes: Long)

  /** Write the next version; returns its number (1-based). */
  def write(df: DataFrame, base: String): Long = {
    val next = listVersions(base).lastOption.getOrElse(0L) + 1
    df.write.mode("errorifexists").parquet(s"$base/v=$next")
    next
  }

  /** Idempotent per-micro-batch write for streaming foreachBatch sinks:
    * the version number is derived from the batch id, and a replayed
    * batch (restart between sink write and checkpoint commit) OVERWRITES
    * its own version instead of appending a duplicate — upgrading
    * foreachBatch's at-least-once to exactly-once, the same trick as
    * the reference's replay timer but with deterministic content. */
  def writeBatch(df: DataFrame, base: String, batchId: Long): Long = {
    // version stays a Long: truncating the batch id to Int would wrap a
    // long-lived stream past Int.MaxValue batches into colliding versions
    val v = batchId + 1
    df.write.mode("overwrite").parquet(s"$base/v=$v")
    v
  }

  /** Race- and crash-safe variant of [[writeBatch]] for DETERMINISTIC
    * snapshot content (same inputs ⇒ bit-identical rows, the contract
    * every graft index build meets): the snapshot is written to a
    * scratch dir UNDER the store base and atomically RENAMED into
    * `v=<batchId+1>` — first writer wins. [[writeBatch]]'s overwrite
    * mode lets two JVMs racing the same version interleave
    * delete/commit and leave a MIX of both jobs' part files under one
    * _SUCCESS marker (duplicated rows that isComplete then trusts
    * forever); a rename publishes all-or-nothing. An already COMPLETE
    * target is left untouched and the write skipped entirely
    * (idempotent re-runs are free); an INCOMPLETE leftover (crashed
    * writer) is tombstoned and replaced. */
  def writeBatchAtomic(df: DataFrame, base: String, batchId: Long): Long = {
    val v = batchId + 1
    if (isComplete(base, v)) return v
    val scratch = Paths.get(base, s".build-v$v-${java.util.UUID.randomUUID()}")
    // a failed SNAPSHOT WRITE must reclaim its scratch too, not just a
    // lost publish race: an abandoned .build-* holds partial corpus-
    // sized part files under a durable store base, and every failed or
    // killed build would otherwise accumulate disk across sessions
    try {
      df.write.mode("overwrite").parquet(scratch.toString)
      val target = Paths.get(base, s"v=$v")
      // a half-written target (no _SUCCESS) blocks the rename: tombstone
      // it the same way deleteVersion does
      if (Files.isDirectory(target) && !isComplete(base, v)) {
        val tomb = Paths.get(base, s".deleting-v$v-${System.nanoTime()}")
        try { Files.move(target, tomb); reclaim(tomb) }
        catch { case _: java.nio.file.NoSuchFileException => () }
      }
      Files.move(scratch, target, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } catch {
      // lost the publish race: fine IFF the winner's version is
      // complete (content is deterministic); anything else is a real
      // failure and must surface — after the scratch is reclaimed
      case _: java.io.IOException if isComplete(base, v) => reclaim(scratch)
      case e: Throwable => reclaim(scratch); throw e
    }
    v
  }

  /** Latest-wins upsert — the MERGE INTO shape without a table format:
    * incoming rows replace same-key rows of the latest snapshot, all
    * other rows carry forward, and the result lands as the next
    * immutable version (prior versions stay readable — time travel is
    * free). One left-anti join on the key (an ingest batch is usually
    * broadcast-able against the corpus scan) plus a union; no file in
    * place is ever rewritten, so object stores and concurrent readers
    * are safe. Caller supplies key-distinct incoming rows (the usual
    * CDC-batch contract). */
  def upsert(df: DataFrame, base: String, keyCols: Seq[String]): Long = {
    import org.apache.spark.sql.functions.col
    val merged =
      if (listVersions(base).isEmpty) df
      else readLatest(df.sparkSession, base)
        .join(df.select(keyCols.map(col): _*), keyCols, "left_anti")
        .unionByName(df)
    write(merged, base)
  }

  def readVersion(spark: SparkSession, base: String, version: Long): DataFrame =
    spark.read.parquet(s"$base/v=$version")

  def readLatest(spark: SparkSession, base: String): DataFrame = {
    val vs = listVersions(base)
    require(vs.nonEmpty, s"no versions under $base")
    readVersion(spark, base, vs.last)
  }

  /** Union of the last `n` versions tagged with their version number —
    * the analogue of the reference's get-versions (≤5 concatenated
    * versions, `dfs/dfs_client.py:158-170`). */
  def readVersions(spark: SparkSession, base: String, n: Int = 5): DataFrame = {
    import org.apache.spark.sql.functions._
    val vs = listVersions(base).takeRight(n)
    require(vs.nonEmpty, s"no versions under $base")
    vs.map(v => readVersion(spark, base, v).withColumn("_version", lit(v)))
      .reduce(_ unionByName _)
  }

  /** Remove one version — the `delete` verb of the reference DFS client
    * (`dfs/dfs_client.py:146-157`). The directory is RENAMED to a
    * tombstone first (atomic on a real filesystem), then reclaimed:
    * a concurrent reader listing versions either sees the complete
    * `v=<N>` directory or none — never a half-deleted snapshot that a
    * parquet scan would fail on. Returns false if the version did not
    * exist (idempotent, like re-deleting an sdfs name). */
  def deleteVersion(base: String, version: Long): Boolean = {
    val dir = Paths.get(base, s"v=$version")
    if (!Files.isDirectory(dir)) false
    else {
      // nanoTime nonce: a crashed earlier delete leaves its tombstone
      // behind without blocking this one
      val tomb = Paths.get(base, s".deleting-v$version-${System.nanoTime()}")
      try {
        Files.move(dir, tomb) // atomic dir rename: readers see all-or-nothing
      } catch {
        // a concurrent delete won the rename between our isDirectory
        // check and the move — the version is gone, which is exactly
        // the idempotent "did not exist" outcome this method promises
        case _: java.nio.file.NoSuchFileException => return false
      }
      reclaim(tomb)
      true
    }
  }

  /** Delete every version — the reference's whole-file delete. */
  def delete(base: String): Int =
    listVersions(base).count(deleteVersion(base, _))

  /** Retention: drop all but the newest `keep` versions — the reference
    * server retains/serves at most 5 (`dfs/dfs_server.py:318-346`,
    * counter capped at 5), but keeps older bytes forever; a streaming
    * sink calling [[writeBatch]] every trigger needs this or snapshot
    * growth is unbounded. Versions are listed ONCE and deleted oldest
    * first, so a concurrent writer appending new versions can never
    * cause more than `keep` survivors from this call's snapshot to go. */
  def prune(base: String, keep: Int = 5): Seq[Long] = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val doomed = listVersions(base).dropRight(keep)
    doomed.filter(deleteVersion(base, _))
  }

  /** Best-effort recursive reclaim of a tombstoned directory. Files.walk
    * holds directory handles open until closed — the stream must be
    * closed explicitly or every delete leaks one. */
  private def reclaim(root: java.nio.file.Path): Unit = {
    val stream = Files.walk(root)
    try {
      val it = stream.sorted(java.util.Comparator.reverseOrder()).iterator()
      while (it.hasNext) Files.deleteIfExists(it.next())
    } finally stream.close()
  }
}
