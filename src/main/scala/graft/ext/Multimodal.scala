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

/** A media payload's blockhash perceptual code (see [[Multimodal.blockhashOf]]). */
case class MediaHash(doc_id: Long, blockhash: Long)

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

  // ------------------------------------------------------------------
  // Training-sample assembly: modality-aware token-budget manifest
  // ------------------------------------------------------------------

  /** Per-sample context budget (tokens). */
  val sampleBudget = 8192L

  /** ViT-style patch edge (pixels per square patch). */
  val patchPx = 16L

  /** Flat token cost assigned to an audio clip by the budget policy. */
  val audioTokens = 128L

  /** Training-sample assembly: the manifest a multimodal training
    * pipeline batches from — one row per sample joining its TEXT (token
    * count), its MEDIA (modality token cost under a ViT-style budget
    * policy: image = output-resolution patches, video = sampled frames ×
    * patches, audio = flat [[audioTokens]]) and its EMBEDDING (present
    * or not — only part of a corpus has precomputed vectors), with the
    * total-cost-vs-[[sampleBudget]] fit decision a batcher applies.
    *
    * Mechanics: documents ⋈ media metadata on doc_id (media is narrow
    * per-row arithmetic — resize dims, frame sampling count — no explode:
    * the manifest needs counts, not rows) plus a LEFT join to embeddings
    * (coverage flag). All token arithmetic is integer (ceil-division via
    * `div`), so both engines agree bit-for-bit.
    *
    * Scale (100 TB): two doc_id-keyed equi-joins (media metadata rides
    * WITH the documents in production — same table, zero joins; the join
    * form here mirrors the separate-store layout) and the standard AQE
    * choice for the embedding side. Everything else is narrow.
    */
  def qMmSampleAssembly(spark: SparkSession, sfDir: String): DataFrame = {
    val text = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("text_tokens"))
    val media = mediaFixture(spark, sfDir).toDF()
      .withColumn("scale",
        least(lit(224.0) / col("width"), lit(224.0) / col("height"), lit(1.0)))
      .withColumn("out_w", greatest(lit(1L), floor(col("width") * col("scale"))))
      .withColumn("out_h", greatest(lit(1L), floor(col("height") * col("scale"))))
      .withColumn("n_frames",
        when(col("media_type") === "video", col("doc_id") % 240 + 8).otherwise(lit(1L)))
      .withColumn("sample_step", greatest(lit(1L), floor(col("n_frames") / 8)))
      .withColumn("frames_sampled",
        expr("(n_frames - 1) div sample_step") + 1L)
      .withColumn("patches",
        expr(s"((out_w + ${patchPx - 1}) div $patchPx) * ((out_h + ${patchPx - 1}) div $patchPx)"))
      .select(col("doc_id"), col("media_type"),
        when(col("media_type") === "image", col("patches"))
          .when(col("media_type") === "video", col("frames_sampled") * col("patches"))
          .otherwise(lit(audioTokens)).as("media_tokens"))
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("doc_id"), lit(true).as("has_embedding"))
    text.join(media, "doc_id")
      .join(emb, Seq("doc_id"), "left")
      .select(col("doc_id"), col("media_type"), col("text_tokens"),
        col("media_tokens"),
        (col("text_tokens") + col("media_tokens")).as("total_tokens"),
        coalesce(col("has_embedding"), lit(false)).as("has_embedding"),
        (col("text_tokens") + col("media_tokens") <= sampleBudget).as("fits_budget"))
      .orderBy(col("doc_id"))
  }

  val qMmSampleAssemblySql: String =
    s"""WITH text_side AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS text_tokens
       |  FROM documents
       |),
       |m AS (
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
       |  SELECT *,
       |    greatest(1, CAST(floor(n_frames / 8) AS BIGINT)) AS sample_step
       |  FROM d
       |),
       |mm AS (
       |  SELECT doc_id, media_type,
       |    CASE WHEN media_type = 'image'
       |           THEN ((out_w + ${patchPx - 1}) // $patchPx) * ((out_h + ${patchPx - 1}) // $patchPx)
       |         WHEN media_type = 'video'
       |           THEN ((n_frames - 1) // sample_step + 1) *
       |                ((out_w + ${patchPx - 1}) // $patchPx) * ((out_h + ${patchPx - 1}) // $patchPx)
       |         ELSE $audioTokens END AS media_tokens
       |  FROM s
       |)
       |SELECT t.doc_id, media_type, text_tokens, media_tokens,
       |  text_tokens + media_tokens AS total_tokens,
       |  e.vec_id IS NOT NULL AS has_embedding,
       |  text_tokens + media_tokens <= $sampleBudget AS fits_budget
       |FROM text_side t
       |JOIN mm USING (doc_id)
       |LEFT JOIN embeddings e ON t.doc_id = e.vec_id
       |ORDER BY t.doc_id""".stripMargin

  // ------------------------------------------------------------------
  // Perceptual-hash near-dup: binary-code dedup for media assets
  // ------------------------------------------------------------------

  /** Max hamming distance considered "the same asset" (re-encode /
    * resize / watermark survivors in a real pHash space).
    */
  val phashMaxHamming = 3

  /** Perceptual-hash near-duplicate mining over the media corpus — the
    * IMAGE/AUDIO member of the dedup family: where text near-dup compares
    * token sets ([[graft.ext.Dedup]] MinHash/SimHash), media near-dup
    * compares fixed-width binary codes (pHash/aHash for images,
    * chromaprint for audio) under HAMMING distance. The decoder that
    * would produce a real pHash is this container's stub (see class
    * scaladoc): the 60-bit code here is the payload digest's head —
    * uniform-random, so genuine near pairs are PLANTED as re-encodes
    * (every 7th asset gets a twin in a disjoint id space — ids offset by
    * a broadcast max+1, the [[graft.ext.Dedup]] injection rule — with 1-2
    * code bits flipped at id-derived positions). The mining mechanics are
    * the production ones and find EXACTLY the ≤ [[phashMaxHamming]]
    * pairs.
    *
    * Multi-index (Minsky-style) banding: the 60-bit code splits into 4
    * bands of 15 bits; hamming ≤ 3 can corrupt at most 3 bands, so every
    * true pair shares AT LEAST one intact band (pigeonhole — the same
    * exactness argument as MinHash banding, but deterministic, not
    * probabilistic). Candidates come from ONE (band, value) equi-join —
    * never an all-pairs hamming scan — then one narrow
    * `bit_count(a XOR b)` pass verifies exactly.
    *
    * Scale (100 TB): the shuffle key is (band, 15-bit value) — 4×
    * replication of an 8-byte code per asset, independent of media size;
    * candidate fan-in per bucket is corpus/2¹⁵ per band (salt the band
    * key wider for billion-asset corpora). The verify is codegen'd
    * integer ops. This is the binary-code regime FAISS/SCANN use for
    * web-scale image dedup.
    */
  def qMmPhashDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        conv(substring(sha2(col("text"), 256), 1, 15), 16, 10)
          .cast("long").as("ph"))
    val off = base.agg((max(col("doc_id")) + 1L).as("off"))
    val twins = base.filter(col("doc_id") % 7 === 0)
      .crossJoin(broadcast(off))
      .select((col("doc_id") + col("off")).as("doc_id"),
        expr("""ph ^ (shiftleft(1L, cast(doc_id * 13 % 60 as int)) |
               |      shiftleft(1L, cast(doc_id * 29 % 60 as int)))""".stripMargin)
          .as("ph"))
    val allCodes = base.unionByName(twins)
    val bands = allCodes
      .select(col("doc_id"), col("ph"), explode(expr("array(0,1,2,3)")).as("b"))
      .withColumn("bv", expr("shiftright(ph, b * 15) & 32767"))
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        col("x.ph").as("ph_a"), col("y.ph").as("ph_b"))
      .distinct()
    cand
      .withColumn("hamming", expr("cast(bit_count(ph_a ^ ph_b) as int)"))
      .filter(col("hamming") <= phashMaxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .orderBy(col("id_a"), col("id_b"))
  }

  // ------------------------------------------------------------------
  // Blockhash near-dup: the perceptual hash COMPUTED from the media bytes
  // ------------------------------------------------------------------

  /** Brightness shift (+3 per byte, mod 256) applied to the planted
    * re-encode twins' PAYLOAD BYTES — the perturbation lives in pixel
    * space, and the blockhash construction absorbs it (see
    * [[qMmBlockhashDedup]]). */
  final val blockhashShift = 3

  /** Blockhash over the stub-decoded payload: treat the payload bytes as
    * the decoded block means (the [[decodeFeatures]] stub boundary — a
    * real pipeline decodes pixels and averages blocks here), threshold
    * each against the EXACT lower median (16th smallest of 32 — an order
    * statistic, not an interpolated median, so both engines pick the
    * same integer), and pack the 32 comparison bits into one code. The
    * median thresholding is what makes blockhash a PERCEPTUAL hash: a
    * global brightness shift moves every block AND the median together,
    * so bits only flip where a byte wraps mod 256.
    *
    * Payloads longer than 64 bytes are first REDUCED to 32 block means
    * (contiguous byte ranges, integer floor mean) — the real blockhash
    * contract, where an image of any size averages down to a fixed block
    * grid. Without the reduction the `1L << i` packing would wrap at bit
    * 64 and silently OR unrelated byte positions into one bit (the r12
    * advice catch); ≤64-byte payloads keep the historical byte-direct
    * form (the 32-byte digest fixture is bit-for-bit unchanged).
    */
  def blockhashOf(ds: Dataset[MediaRecord]): Dataset[MediaHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { records =>
      // real pipeline: init the image decoder once per partition here
      records.map { m =>
        val raw = m.media.map(_ & 0xFF)
        // >64 bytes: average contiguous ranges down to the 32-block grid
        // so every block mean owns exactly one bit of the code
        val px =
          if (raw.length <= 64) raw
          else Array.tabulate(32) { i =>
            val lo = i * raw.length / 32
            val hi = (i + 1) * raw.length / 32
            raw.slice(lo, hi).sum / (hi - lo)
          }
        // degenerate payloads (corrupt/empty assets) hash to 0 instead of
        // killing the stage — flagged-as-identical beats a task failure
        val h =
          if (px.length < 2) 0L
          else {
            val thr = px.sorted.apply(px.length / 2 - 1)
            px.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
              if (v >= thr) acc | (1L << i) else acc
            }
          }
        MediaHash(m.doc_id, h)
      }
    }
  }

  /** BLOCKHASH NEAR-DUP — the media-BYTES member of the dedup family,
    * upgrading [[qMmPhashDedup]]'s code-space fixture to the full
    * pipeline a real image-dedup pass runs: the perceptual code is
    * COMPUTED FROM THE BINARY COLUMN through the stub-decode boundary
    * ([[blockhashOf]] — mapPartitions over the typed media records, the
    * E11 plumbing), the planted near-dups are RE-ENCODES whose
    * perturbation happens in byte space (a +[[blockhashShift]]
    * brightness shift on every payload byte — never a hand-flipped hash
    * bit), and the hash construction itself absorbs the perturbation:
    * the median threshold shifts with the bytes, so only mod-256
    * wraparounds (≈ 3/256 of bytes) flip bits — the planted twins land
    * at hamming ≈ 0–2 of their sources BECAUSE blockhash is
    * shift-invariant, which is the property the op exists to exploit.
    * Exact duplicate payloads (also planted, disjoint id space) come
    * out at hamming 0 — subsumed by the same mining pass. The radius is
    * a genuine RECALL knob, not a formality: a wrapped byte also drags
    * the median down one rank, flipping extra near-threshold bits, so
    * ~4% of the +3-shift twins land at hamming 4 and are (correctly)
    * outside radius 3 — the mining is EXACT at its radius (LlmOpsSpec
    * replays it exhaustively); the radius-vs-perturbation calibration
    * is the same tradeoff a production pHash dedup tunes.
    *
    * Mining is the [[qMmPhashDedup]] multi-index discipline on the
    * 32-bit code: 4 bands × 8 bits, hamming ≤ [[phashMaxHamming]] = 3
    * corrupts at most 3 bands, so every true pair shares an intact band
    * (pigeonhole — exact, not probabilistic); candidates from ONE
    * (band, value) equi-join, one narrow `bit_count(xor)` verify.
    *
    * Scale (100 TB): the decode+hash is a narrow per-partition pass over
    * the binary column (the split-size note in the class scaladoc); the
    * shuffle carries (band, 8-bit value, code) — bytes per asset,
    * independent of media size; widen the band key for billion-asset
    * corpora. The max-id offsets for the planted id spaces are one
    * constant driver scalar (sanctioned model state).
    */
  def qMmBlockhashDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // persisted: the max-id probe plus all three corpus branches read it —
    // without the cache each branch re-reads documents and re-digests
    val base = mediaFixture(spark, sfDir).persist()
    val off = base.toDF().agg(max(col("doc_id"))).collect()(0).getLong(0) + 1L
    val reencoded = base.filter(_.doc_id % 7 == 0).map(m => MediaRecord(
      m.doc_id + off,
      m.media.map(b => (((b & 0xFF) + blockhashShift) % 256).toByte),
      m.media_type, m.width, m.height))
    val exactCopies = base.filter(_.doc_id % 11 == 0).map(m =>
      MediaRecord(m.doc_id + 2 * off, m.media, m.media_type, m.width, m.height))
    val codes = blockhashOf(base.union(reencoded).union(exactCopies)).toDF()

    val bands = codes
      .select(col("doc_id"), col("blockhash").as("ph"), explode(expr("array(0,1,2,3)")).as("b"))
      .withColumn("bv", expr("shiftright(ph, b * 8) & 255"))
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        col("x.ph").as("ph_a"), col("y.ph").as("ph_b"))
      .distinct()
    cand
      .withColumn("hamming", expr("cast(bit_count(ph_a ^ ph_b) as int)"))
      .filter(col("hamming") <= phashMaxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"),
        (col("hamming") === 0).as("is_exact"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val qMmBlockhashDedupSql: String =
    s"""WITH px AS (
       |  SELECT doc_id, list_transform(generate_series(1, 32),
       |    i -> CAST(('0x' || substr(sha256(text), 2 * i - 1, 2)) AS INTEGER)) AS bytes
       |  FROM documents
       |),
       |off AS (SELECT max(doc_id) + 1 AS off FROM px),
       |allpx AS (
       |  SELECT doc_id, bytes FROM px
       |  UNION ALL
       |  SELECT doc_id + off AS doc_id,
       |    list_transform(bytes, b -> (b + $blockhashShift) % 256) AS bytes
       |  FROM px, off WHERE doc_id % 7 = 0
       |  UNION ALL
       |  SELECT doc_id + 2 * off AS doc_id, bytes FROM px, off WHERE doc_id % 11 = 0
       |),
       |thr AS (SELECT doc_id, bytes, list_sort(bytes)[16] AS t FROM allpx),
       |codes AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(generate_series(1, 32),
       |        i -> CASE WHEN bytes[i] >= t THEN (1::BIGINT << (i - 1))
       |             ELSE 0::BIGINT END)),
       |      (a, b) -> a + b) AS ph
       |  FROM thr
       |),
       |bands AS (
       |  SELECT doc_id, ph, b, (ph >> (b * 8)) & 255 AS bv
       |  FROM codes, (SELECT unnest([0,1,2,3]) AS b)
       |),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
       |    x.ph AS ph_a, y.ph AS ph_b
       |  FROM bands x JOIN bands y
       |    ON x.b = y.b AND x.bv = y.bv AND x.doc_id < y.doc_id
       |)
       |SELECT id_a, id_b, CAST(bit_count(xor(ph_a, ph_b)) AS INTEGER) AS hamming,
       |  bit_count(xor(ph_a, ph_b)) = 0 AS is_exact
       |FROM cand WHERE bit_count(xor(ph_a, ph_b)) <= $phashMaxHamming
       |ORDER BY id_a, id_b""".stripMargin

  val qMmPhashDedupSql: String =
    s"""WITH base AS (
       |  SELECT doc_id,
       |    CAST(('0x' || substr(sha256(text), 1, 15)) AS BIGINT) AS ph
       |  FROM documents
       |),
       |off AS (SELECT max(doc_id) + 1 AS off FROM base),
       |twins AS (
       |  SELECT doc_id + off AS doc_id,
       |    xor(ph, (1::BIGINT << CAST(doc_id * 13 % 60 AS INTEGER)) |
       |            (1::BIGINT << CAST(doc_id * 29 % 60 AS INTEGER))) AS ph
       |  FROM base, off WHERE doc_id % 7 = 0
       |),
       |al AS (SELECT * FROM base UNION ALL SELECT * FROM twins),
       |bands AS (
       |  SELECT doc_id, ph, b, (ph >> (b * 15)) & 32767 AS bv
       |  FROM al, (SELECT unnest([0,1,2,3]) AS b)
       |),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
       |    x.ph AS ph_a, y.ph AS ph_b
       |  FROM bands x JOIN bands y
       |    ON x.b = y.b AND x.bv = y.bv AND x.doc_id < y.doc_id
       |)
       |SELECT id_a, id_b, CAST(bit_count(xor(ph_a, ph_b)) AS INTEGER) AS hamming
       |FROM cand WHERE bit_count(xor(ph_a, ph_b)) <= $phashMaxHamming
       |ORDER BY id_a, id_b""".stripMargin
}
