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
    // the binary plumbing is oracle-checked end to end. first_byte is the
    // raw first UTF-8 BYTE (hex of the binary cast), matching the
    // mapPartitions twin's blob(0) & 0xff — ascii(substring(text,1,1))
    // would be the first CHARACTER's codepoint, which diverges on any
    // non-ASCII document.
    "multimodal_meta" -> ((s, dir) => {
      val blob = col("text").cast("binary")
      val blobLen = length(blob)
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          blobLen.as("n_bytes"),
          when(blobLen === 0, lit(-1))
            .otherwise(conv(substring(hex(blob), 1, 2), 16, 10).cast("int"))
            .as("first_byte"),
          (blobLen % 64 + 1).as("fake_width"),
          (floor(blobLen / 64) % 64 + 1).cast("int").as("fake_height"))
        .orderBy("doc_id")
    }),

    "multimodal_meta_mp" -> ((s, dir) =>
      decodeMeta(Tables.documents(s, dir)).toDF().orderBy("doc_id"))
  )

  // first_byte = raw first UTF-8 byte via hex digits (DuckDB has no
  // direct blob[0] → int), matching Spark's conv(substr(hex(blob),1,2))
  private val metaSql =
    """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
      |       CASE WHEN octet_length(encode(text)) = 0 THEN -1
      |            ELSE CAST(16*(strpos('0123456789ABCDEF', substr(hex(encode(text)),1,1))-1)
      |                    + strpos('0123456789ABCDEF', substr(hex(encode(text)),2,1))-1 AS INT)
      |       END AS first_byte,
      |       octet_length(encode(text)) % 64 + 1 AS fake_width,
      |       (octet_length(encode(text)) // 64) % 64 + 1 AS fake_height
      |FROM documents ORDER BY doc_id""".stripMargin

  def oracles: Map[String, String] = Map(
    "multimodal_meta" -> metaSql,
    "multimodal_meta_mp" -> metaSql
  )
}
