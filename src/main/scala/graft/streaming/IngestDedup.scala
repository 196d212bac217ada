package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Dedup
import graft.sources.VersionedStore

/** Streaming ingest-time near-dup detection — the reference's
  * spout→bolt→versioned-sink topology shape (reference
  * `crane_master.py:148-164` batching + `dfs/dfs_server.py:280-288`
  * versioned writes) applied to the LLM-corpus dedup ops: documents
  * arriving in micro-batches are MinHash-LSH checked against a fixed
  * corpus, and each batch's (corpus_doc, new_doc, jaccard) pairs land as
  * one immutable [[VersionedStore]] version.
  *
  * Scale shape: the corpus-side artifacts (shingle index + LSH band
  * signatures) are built ONCE and cached — per-trigger work is
  * proportional to the BATCH, not the corpus (the same steady-state
  * contract as the batch `dedup_incremental_minhash` query): the batch's
  * band signatures equi-join the corpus bands (bucketed candidates, never
  * corpus×batch all-pairs), and only candidate docs' shingle sets are
  * materialized for the exact-Jaccard verify. Exactly-once: the sink
  * version number derives from the batch id ([[VersionedStore.writeBatch]]
  * overwrites on replay), upgrading foreachBatch's at-least-once — the
  * reference's replay timer can double-count (SURVEY.md §2.2.6); this
  * cannot.
  */
object IngestDedup {

  /** Near-dup pairs of one ingest batch against the prepared corpus
    * artifacts: LSH band candidates (corpus × batch only), then exact
    * Jaccard ≥ `threshold` on full shingle sets. */
  def pairsVsCorpus(corpusSh: DataFrame, corpusBands: DataFrame,
                    batchDocs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val shB = Dedup.shingles(batchDocs)
    val bandsB = Dedup.lshBands(Dedup.minhashSignature(shB))
    val cand = corpusBands.select(col("doc_id").as("doc_a"), col("band"), col("sig"))
      .join(bandsB.select(col("doc_id").as("doc_b"), col("band"), col("sig")),
        Seq("band", "sig"))
      .select("doc_a", "doc_b").distinct()
    Dedup.jaccardBySets(cand, corpusSh.unionByName(shB))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a").as("corpus_doc"), col("doc_b").as("new_doc"),
        round(col("jaccard"), 6).as("jaccard"))
      .orderBy("corpus_doc", "new_doc")
  }

  /** Start the ingest-dedup stream: parquet documents (corpus schema)
    * arriving under `inDir` → per-micro-batch near-dup pairs versioned
    * under `outBase`. `maxFilesPerTrigger` is the reference's batch-size
    * knob (CRANE_BATCH_SIZE analogue). The returned query is started with
    * Trigger.AvailableNow, so `awaitTermination()` drains what's there —
    * re-starting with the same checkpoint processes only new files. */
  def start(spark: SparkSession, corpusDocs: DataFrame, inDir: String,
            outBase: String, checkpointDir: String,
            maxFilesPerTrigger: Int = 1, threshold: Double = 0.5): StreamingQuery = {
    // Corpus artifacts built once per stream start and cached: at cluster
    // scale these would be staged to parquet (as Dedup.staged* does for
    // the batch queries); within one driver, cached DataFrames give every
    // micro-batch the same reuse without re-shingling the corpus.
    val corpusSh = Dedup.shingles(corpusDocs)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val corpusBands = Dedup.lshBands(Dedup.minhashSignature(corpusSh))
      .persist(StorageLevel.MEMORY_AND_DISK)
    spark.readStream
      .schema(corpusDocs.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        VersionedStore.writeBatch(
          pairsVsCorpus(corpusSh, corpusBands, batch, threshold),
          outBase, batchId): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
