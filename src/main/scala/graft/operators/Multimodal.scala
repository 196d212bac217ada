package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Multimodal-column plumbing: media as opaque binary columns + typed
  * metadata, processed partition-batch-wise.
  *
  * The container has no image/audio codecs, so decode is a STUB — a
  * deterministic fake deriving "decoded" dimensions from the bytes. What
  * is real, and what a cluster run needs: the binary column schema, the
  * partition-wise batched processing shape (mapPartitions — the Scala
  * analogue of arrow-batched UDFs: amortize per-batch setup, stream rows,
  * never collect), and the oracle-checkable byte-level metadata.
  */
object Multimodal {

  case class MediaMeta(doc_id: Long, n_bytes: Int, first_byte: Int,
                       fake_width: Int, fake_height: Int)

  /** STUB decoder: real systems call the codec here, once per partition
    * batch. Deterministic fake: dimensions derived from payload size. */
  def decodeStub(blob: Array[Byte]): (Int, Int) =
    (blob.length % 64 + 1, (blob.length / 64) % 64 + 1)

  /** Partition-wise "decode": the mapPartitions shape a real media
    * pipeline uses (per-partition codec init, streamed rows). */
  def decodeMeta(docs: DataFrame): Dataset[MediaMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition setup would open the codec once, here
        rows.map { case (id, blob) =>
          val (w, h) = decodeStub(blob)
          MediaMeta(id, blob.length, if (blob.isEmpty) -1 else blob(0) & 0xff, w, h)
        }
      }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Declarative twin of decodeMeta (same arithmetic in pure columns) so
    // the binary plumbing is oracle-checked end to end.
    "multimodal_meta" -> ((s, dir) => {
      val blobLen = length(col("text").cast("binary"))
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          blobLen.as("n_bytes"),
          when(length(col("text")) === 0, lit(-1))
            .otherwise(ascii(substring(col("text"), 1, 1))).as("first_byte"),
          (blobLen % 64 + 1).as("fake_width"),
          (floor(blobLen / 64) % 64 + 1).cast("int").as("fake_height"))
        .orderBy("doc_id")
    }),

    "multimodal_meta_mp" -> ((s, dir) =>
      decodeMeta(Tables.documents(s, dir)).toDF().orderBy("doc_id"))
  )

  private val metaSql =
    """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
      |       CASE WHEN length(text) = 0 THEN -1 ELSE ascii(substr(text, 1, 1)) END AS first_byte,
      |       octet_length(encode(text)) % 64 + 1 AS fake_width,
      |       (octet_length(encode(text)) // 64) % 64 + 1 AS fake_height
      |FROM documents ORDER BY doc_id""".stripMargin

  def oracles: Map[String, String] = Map(
    "multimodal_meta" -> metaSql,
    "multimodal_meta_mp" -> metaSql
  )
}
