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

  /** Resize planning + frame sampling — the two remaining multimodal prep
    * ops, both REAL computations on the typed metadata (only pixel/sample
    * decode needs the stub): fit-within-224×224 target dimensions
    * preserving aspect ratio (never upscale), and for videos an exploded
    * ~8-frame uniform sample of the frame index range (images/audio emit
    * their single "frame" 0). The generator (`sequence`+`explode`) runs
    * per row executor-side — the fan-out shape a real frame extractor
    * feeds into, and the row set a downstream decode (qMmDecode's
    * mapPartitions) would consume.
    *
    * Scale: narrow projection + per-row generator, no shuffle; fan-out is
    * bounded by the sample budget (ceil(n/floor(n/8)) ≤ 15 rows/video),
    * so output size is O(corpus), not O(total frames).
    */
  def qMmResizeSample(spark: SparkSession, sfDir: String): DataFrame = {
    val m = mediaFixture(spark, sfDir).toDF()
      .withColumn("scale",
        least(lit(224.0) / col("width"), lit(224.0) / col("height"), lit(1.0)))
      .withColumn("out_w", greatest(lit(1L), floor(col("width") * col("scale"))))
      .withColumn("out_h", greatest(lit(1L), floor(col("height") * col("scale"))))
      .withColumn("n_frames",
        when(col("media_type") === "video", col("doc_id") % 240 + 8).otherwise(lit(1L)))
      .withColumn("sample_step", greatest(lit(1L), floor(col("n_frames") / 8)))
      .withColumn("frame_idx",
        explode(sequence(lit(0L), col("n_frames") - 1, col("sample_step"))))
    m.select(col("doc_id"), col("media_type"), col("out_w"), col("out_h"),
        col("n_frames"), col("frame_idx"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val qMmResizeSampleSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio'
      |         ELSE 'video' END AS media_type,
      |    (doc_id % 64 + 1) * 16 AS width,
      |    (doc_id % 48 + 1) * 16 AS height
      |  FROM documents
      |),
      |r AS (
      |  SELECT *, least(CAST(224 AS DOUBLE) / width, CAST(224 AS DOUBLE) / height,
      |    CAST(1.0 AS DOUBLE)) AS scale
      |  FROM m
      |),
      |d AS (
      |  SELECT doc_id, media_type,
      |    greatest(1, CAST(floor(width * scale) AS BIGINT)) AS out_w,
      |    greatest(1, CAST(floor(height * scale) AS BIGINT)) AS out_h,
      |    CASE WHEN media_type = 'video' THEN doc_id % 240 + 8 ELSE 1 END AS n_frames
      |  FROM r
      |),
      |s AS (
      |  SELECT *, greatest(1, CAST(floor(n_frames / 8) AS BIGINT)) AS sample_step FROM d
      |)
      |SELECT doc_id, media_type, out_w, out_h, n_frames,
      |  unnest(range(0, n_frames, sample_step)) AS frame_idx
      |FROM s
      |ORDER BY doc_id, frame_idx""".stripMargin
}
