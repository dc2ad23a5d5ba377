package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** An opaque media payload with typed metadata — the multimodal column
  * pattern: the content is an uninterpreted `binary`, everything the
  * engine plans on (ids, type, dimensions) is a typed column beside it.
  */
case class MediaRecord(
  doc_id: Long, media: Array[Byte], media_type: String, width: Int, height: Int)

/** Features "decoded" from a media payload (see [[Multimodal.decodeFeatures]]). */
case class MediaFeatures(
  doc_id: Long, media_type: String, n_bytes: Long, feature64: Long)

/** Multimodal-column plumbing for LLM training-data pipelines: media as
  * opaque binary + typed metadata, with decode/feature-extraction executed
  * per-partition over a typed `Dataset` (`mapPartitions` — the
  * imperative-boundary operator, justified here because a real decoder is
  * a native library call, not an expression).
  *
  * The DECODER IS A STUB: this container has no image/audio libraries, so
  * [[decodeFeatures]] extracts a deterministic fake feature (first 7 bytes
  * of the payload, big-endian) where a real pipeline would run JPEG/PCM
  * decode. Everything AROUND the stub — the binary column, the typed
  * schema, the Dataset encoders, the partition-wise batching shape, the
  * oracle check — is real and tested. Swapping in a real decoder changes
  * only the body of the map function.
  *
  * Scale notes: `mapPartitions` keeps the decode batched per partition
  * (amortizing library init, the same reason Python pipelines use
  * `mapInPandas`), stays narrow (no shuffle), and the binary column rides
  * parquet page compression. At 100 TB the knob that matters is input
  * split size (`spark.sql.files.maxPartitionBytes`) so one task's media
  * batch fits executor memory.
  */
object Multimodal {

  /** Deterministic media fixture: a 32-byte "payload" (sha-256 of the
    * text — stands in for real image bytes) + metadata columns.
    */
  def mediaFixture(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        unhex(sha2(col("text"), 256)).as("media"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        ((col("doc_id") % 64 + 1) * 16).cast("int").as("width"),
        ((col("doc_id") % 48 + 1) * 16).cast("int").as("height"))
      .as[MediaRecord]
  }

  /** Per-partition decode/feature-extract. STUB decoder (see scaladoc):
    * feature64 = first 7 payload bytes big-endian (56 bits, non-negative,
    * mirrored in SQL as the first 14 hex chars of the digest).
    */
  def decodeFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { records =>
      // real pipeline: init decoder library once per partition here
      records.map { m =>
        val fp = m.media.take(7).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xFFL))
        MediaFeatures(m.doc_id, m.media_type, m.media.length.toLong, fp)
      }
    }
  }

  def qMmDecode(spark: SparkSession, sfDir: String): DataFrame =
    decodeFeatures(mediaFixture(spark, sfDir)).toDF().orderBy(col("doc_id"))

  val qMmDecodeSql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |       WHEN doc_id % 3 = 1 THEN 'audio'
      |       ELSE 'video' END AS media_type,
      |  CAST(octet_length(unhex(sha256(text))) AS BIGINT) AS n_bytes,
      |  CAST(('0x' || substr(sha256(text), 1, 14)) AS BIGINT) AS feature64
      |FROM documents ORDER BY doc_id""".stripMargin
}
