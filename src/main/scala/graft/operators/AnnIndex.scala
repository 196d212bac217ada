package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sources.VersionedStore

/** Persisted trained-IVF index lifecycle — the 100 TB serving shape.
  *
  * The other `ann_ivf_trained_*` queries re-train the coarse quantizer
  * per session (session-staged via `Staged`). At scale you train ONCE,
  * land the index as an immutable [[VersionedStore]] version, and every
  * later session/job serves — and upserts — against the STORED artifact:
  * train → v1; each ingest batch assigns against the stored centroids
  * and lands the merged assignment as the next version; serving reads
  * the latest version. Nothing ever re-runs Lloyd training unless the
  * corpus itself changes.
  *
  * Index content per version: `<base>/assign` (vec_id, cell — the
  * inverted file) and `<base>/cents` (cid, carr — the micro-quantized
  * centroids future batches are assigned against). A production index
  * would inline the vectors next to the assignment to skip the serve
  * join; here the corpus parquet IS the vector store and the serve path
  * joins on vec_id — one co-partitioned shuffle join at scale.
  *
  * Store identity: a corpus fingerprint (row count + vec_id checksum)
  * stands in for the explicit corpus-version id a production pipeline
  * carries — two different corpora (sf0.01 vs a 10× soak dir, or a
  * regenerated testdata drop) can never alias each other's index. The
  * fingerprint costs one tiny vec_id-only aggregate, computed once per
  * (JVM, dir). First build is crash-safe the same way CdcApply's seed
  * is: a version directory without the committer's _SUCCESS marker is
  * rewritten (overwrite mode), never trusted.
  */
object AnnIndex {

  private val fpCache = TrieMap.empty[String, String]

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def storeBase(s: SparkSession, dir: String, flavor: String): String = {
    val fp = fpCache.getOrElseUpdate(s"$dir|$flavor", {
      // bounded 1-row fetch (the allowed driver-side pattern): corpus
      // identity, not corpus data
      val r = Tables.embeddings(s, dir)
        .agg(count(lit(1)).as("n"), sum(col("vec_id")).as("sv")).head()
      md5hex(s"$dir|$flavor|${r.getLong(0)}|${r.getLong(1)}")
    })
    s"${sys.props("java.io.tmpdir")}/graft-ann-index/$fp"
  }

  private def writeV1(assign: DataFrame, cents: DataFrame, base: String): Unit = {
    // writeBatch(batchId=0) → v=1 in overwrite mode: a crashed half-build
    // (directory without _SUCCESS) is repaired on the next call
    VersionedStore.writeBatch(assign, s"$base/assign", 0L): Unit
    VersionedStore.writeBatch(cents, s"$base/cents", 0L): Unit
  }

  private def built(base: String): Boolean =
    VersionedStore.isComplete(s"$base/assign", 1L) &&
      VersionedStore.isComplete(s"$base/cents", 1L)

  /** Train-once on the FULL corpus; returns the store base. Subsequent
    * calls (any session, any JVM) see the committed v1 and skip
    * training entirely. */
  def ensureFull(s: SparkSession, dir: String): String = {
    val base = storeBase(s, dir, "full")
    if (!built(base)) {
      val (emb, cents1) = Clustering.trained(s, dir)
      writeV1(Clustering.assign(emb, cents1).select(col("vec_id"), col("cell")),
        cents1, base)
    }
    base
  }

  /** Train-once on the 80% base slice (ann_ivf_upsert's split, same
    * in-plan seed-coverage guard) — the index the persisted UPSERT
    * folds the remaining 20% "arriving" batch into. */
  def ensureBase80(s: SparkSession, dir: String): String = {
    val base = storeBase(s, dir, "base80")
    if (!built(base)) {
      val emb = Tables.embeddings(s, dir)
      val split = Clustering.upsertSplit(emb)
      val baseSlice = emb.crossJoin(broadcast(split))
        .filter(col("vec_id") < col("s")).select("vec_id", "embedding")
      val (qemb, cents1) = Clustering.trainedOn(baseSlice)
      writeV1(Clustering.assign(qemb, cents1).select(col("vec_id"), col("cell")),
        cents1, base)
    }
    base
  }
}
