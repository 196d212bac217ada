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
      decodeMeta(Tables.documents(s, dir)).toDF().orderBy("doc_id")),

    // Frame sampling — the video-pipeline shape: chop each blob into
    // fixed 256-byte frames, keep every 4th, fingerprint each kept
    // frame. Runs over the hex encoding so the per-frame slice +
    // fingerprint is pure engine-portable column algebra (a real
    // pipeline would hand the sliced bytes to a codec UDF at exactly
    // this point). explode(sequence) fans out rows — never a
    // driver-side loop — and everything before the final sort is a
    // narrow per-row pass.
    "multimodal_frame_sample" -> ((s, dir) => {
      val frameBytes = 256
      val hexPerFrame = frameBytes * 2
      Tables.documents(s, dir)
        .select(col("doc_id"), hex(col("text").cast("binary")).as("h"))
        .withColumn("n_frames",
          ceil(length(col("h")).cast("double") / hexPerFrame).cast("int"))
        .filter(col("n_frames") > 0)
        .select(col("doc_id"), col("h"), col("n_frames"),
          explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
        .filter(col("frame_idx") % 4 === 0)
        .select(col("doc_id"), col("frame_idx"), col("n_frames"),
          md5(expr(s"substring(h, frame_idx * $hexPerFrame + 1, $hexPerFrame)"))
            .as("frame_md5"))
        .orderBy("doc_id", "frame_idx")
    })
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
    "multimodal_meta_mp" -> metaSql,
    "multimodal_frame_sample" ->
      """WITH hx AS (
        |  SELECT doc_id, hex(encode(text)) AS h,
        |         CAST(ceil(CAST(length(hex(encode(text))) AS DOUBLE) / 512) AS INT) AS n_frames
        |  FROM documents),
        |frames AS (
        |  SELECT doc_id, h, n_frames,
        |         CAST(unnest(generate_series(0, n_frames - 1)) AS INT) AS frame_idx
        |  FROM hx WHERE n_frames > 0)
        |SELECT doc_id, frame_idx, n_frames,
        |       md5(substr(h, frame_idx * 512 + 1, 512)) AS frame_md5
        |FROM frames WHERE frame_idx % 4 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin
  )
}
