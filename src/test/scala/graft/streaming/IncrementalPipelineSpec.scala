package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSuite
import graft.etl.{StarSchema, TaxiFixture}

/** The streaming wrapper must produce exactly the batch pipeline's output
  * when draining a directory of dropped files (SURVEY §2.9). The two drops
  * are DISJOINT slices (dedup is per micro-batch, as in the reference's
  * per-file job runs — cross-file duplicates are an operational re-drop
  * concern there too), so per-batch counts sum to the global batch count
  * however the source groups files into micro-batches.
  */
class IncrementalPipelineSpec extends SparkSuite {

  test("AvailableNow drain over dropped files matches the batch transform") {
    val inDir = Files.createTempDirectory("graft_stream_in").toString
    val ckDir = Files.createTempDirectory("graft_stream_ck").toString

    val raw = TaxiFixture.raw(spark, sf)
    // land each drop as a single FILE directly in the watched directory
    // (the source lists files, not nested dataset directories) — the same
    // shape as the reference's monthly S3 object drops
    def drop(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_drop").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      Files.move(part, java.nio.file.Paths.get(inDir, name))
    }
    drop(raw.filter(col("VendorID") <= 2), "yellow_tripdata_2024-01a.parquet")
    drop(raw.filter(col("VendorID") >= 3), "yellow_tripdata_2024-01b.parquet")
    val dropped = spark.read.parquet(s"$inDir/*.parquet")
    val expected = StarSchema.transform(dropped, "2024", "1").count()
    assert(expected > 0)

    var total = 0L
    var batches = 0
    IncrementalPipeline.runAvailableNow(
      spark, inDir, raw.schema, "2024", "1", ckDir) { fact =>
      total += fact.count()
      batches += 1
    }
    assert(batches >= 1)
    assert(total === expected)
  }

  test("incremental packer: arriving shards extend the layout; union == batch op; re-run and retry are no-ops") {
    import graft.ext.TextOps
    import graft.model.Tables
    val inDir = Files.createTempDirectory("graft_pack_in").toString
    val ckDir = Files.createTempDirectory("graft_pack_ck").toString
    val layoutDir = Files.createTempDirectory("graft_pack_layout").toString + "/layout"

    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    def drop(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_drop").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      Files.move(part, java.nio.file.Paths.get(inDir, name))
    }

    // two arrivals drained SEPARATELY (same checkpoint): the second run's
    // base offset must come from the persisted layout, not process state
    drop(docs.filter(col("doc_id") < 250), "docs_shard_a.parquet")
    IncrementalPipeline.packAvailableNow(spark, inDir, docs.schema, layoutDir, ckDir)
    drop(docs.filter(col("doc_id") >= 250), "docs_shard_b.parquet")
    IncrementalPipeline.packAvailableNow(spark, inDir, docs.schema, layoutDir, ckDir)

    def layoutMap() = spark.read.parquet(layoutDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("tok_start"),
          r.getAs[Long]("chunk_first"), r.getAs[Long]("chunk_last"),
          r.getAs[Long]("n_chunks"))).toMap
    val incremental = layoutMap()
    // union of incremental appends == the batch op over the whole corpus
    val expected = TextOps.qDocPackChunks(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("tok_start"),
          r.getAs[Long]("chunk_first"), r.getAs[Long]("chunk_last"),
          r.getAs[Long]("n_chunks"))).toMap
    assert(incremental === expected,
      "incrementally appended layout must equal the batch packing layout")
    // genuinely incremental: the two arrivals landed as distinct batches
    // (batch_id is the partition directory column — inferred int, cast up)
    def batchIdsOf(dir: String) = spark.read.parquet(dir)
      .select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    val batchIds = batchIdsOf(layoutDir)
    assert(batchIds.size >= 2, s"expected >=2 micro-batches, got $batchIds")

    // the compacted state table ≡ what a full layout recompute would say:
    // end offset = max(tok_start + n_tokens), high-water mark = max batch
    val st = StreamState.read(spark, layoutDir + "_state")
    val endFromLayout = incremental.values.map(v => v._2 + v._1).max
    assert(st.endOffset === endFromLayout,
      "state end offset must equal the layout-recomputed end offset")
    assert(st.maxBatch === batchIds.max,
      "state high-water mark must equal the max committed batch id")

    // E58 discipline 1: a re-RUN with no new files is a checkpoint no-op
    IncrementalPipeline.packAvailableNow(spark, inDir, docs.schema, layoutDir, ckDir)
    assert(layoutMap() === expected, "re-run must not change the layout")
    // E58 discipline 2: a RETRIED micro-batch (same batchId) is a no-op
    IncrementalPipeline.appendPackedBatch(
      spark, docs.filter(col("doc_id") < 250), batchIds.min, layoutDir)
    assert(layoutMap() === expected, "batch retry must not double-append")

    // O(1) state proof: the per-batch audit read touches ONLY the state
    // table. With the layout data deleted outright, a retried batch is
    // still a recorded no-op (nothing recreated, nothing scanned — the
    // r12 form would have read the missing layout as "empty", zeroed the
    // offset, and re-appended the batch)...
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(layoutDir))
    IncrementalPipeline.appendPackedBatch(
      spark, docs.filter(col("doc_id") < 250), batchIds.min, layoutDir)
    assert(!new java.io.File(layoutDir).exists(),
      "retry of a committed batch must not touch the layout dir")
    // ...and a genuinely new batch lays out from the state's end offset,
    // not from a layout rescan
    IncrementalPipeline.appendPackedBatch(
      spark, docs.filter(col("doc_id") < 10), batchIds.max + 1, layoutDir)
    val resumedStart = spark.read.parquet(layoutDir)
      .agg(org.apache.spark.sql.functions.min(col("tok_start")))
      .collect()(0).getLong(0)
    assert(resumedStart === endFromLayout,
      "new batch must continue from the committed end offset")
  }

  test("decontam screen: per-shard flags union == batch gate; re-run and retry are no-ops") {
    import org.apache.spark.sql.functions.expr
    import graft.ext.Dedup
    import graft.model.Tables
    val inDir = Files.createTempDirectory("graft_scr_in").toString
    val ckDir = Files.createTempDirectory("graft_scr_ck").toString
    val flagDir = Files.createTempDirectory("graft_scr_flags").toString + "/flags"

    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val eval = docs.filter(col("doc_id") % 50 === 0)
    val clean = docs.filter(col("doc_id") % 50 =!= 0)
    // paraphrased benchmark copies (the batch gate's own perturbation)
    // planted into BOTH shards, so both micro-batches carry contamination
    val planted = eval.select((-col("doc_id") - 1).as("doc_id"),
      expr(Dedup.perturbExpr).as("text"))
    val shardA = clean.filter(col("doc_id") < 250)
      .unionAll(planted.filter(-col("doc_id") - 1 < 250))
    val shardB = clean.filter(col("doc_id") >= 250)
      .unionAll(planted.filter(-col("doc_id") - 1 >= 250))

    def drop(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_drop").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      Files.move(part, java.nio.file.Paths.get(inDir, name))
    }
    drop(shardA, "docs_scr_a.parquet")
    IncrementalPipeline.decontamAvailableNow(
      spark, inDir, docs.schema, eval, flagDir, ckDir)
    drop(shardB, "docs_scr_b.parquet")
    IncrementalPipeline.decontamAvailableNow(
      spark, inDir, docs.schema, eval, flagDir, ckDir)

    def flags() = spark.read.parquet(flagDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("eval_doc_id"),
        r.getAs[Double]("jaccard"), r.getAs[Boolean]("caught_exact"))).toSet
    val screened = flags()
    // the screen is exactly shard-decomposable: union of per-batch flags
    // == the batch fuzzy gate over the union corpus
    val expected = Dedup.fuzzyContamPairs(spark, shardA.unionAll(shardB), eval)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("eval_doc_id"),
        r.getAs[Double]("jaccard"), r.getAs[Boolean]("caught_exact"))).toSet
    assert(screened === expected)
    assert(screened.exists(_._1 < 0), "planted contamination not flagged")
    val batchIds = spark.read.parquet(flagDir)
      .select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(batchIds.size >= 2, s"expected >=2 contaminated micro-batches, got $batchIds")
    // the seen-check keys on the state marker, not on flag rows — the
    // high-water mark records every screened batch, clean ones included
    assert(StreamState.read(spark, flagDir + "_state").maxBatch === batchIds.max)

    // E58 discipline: checkpointed re-run and batch retry are both no-ops
    IncrementalPipeline.decontamAvailableNow(
      spark, inDir, docs.schema, eval, flagDir, ckDir)
    assert(flags() === expected, "re-run must not change the flag table")
    IncrementalPipeline.appendContamFlags(
      spark, shardA, eval, batchIds.min, flagDir)
    assert(flags() === expected, "batch retry must not double-append")
    spark.catalog.clearCache()
  }

  test("quality gate at ingest: per-shard verdicts union == frozen batch gate; re-run and retry are no-ops") {
    import org.apache.spark.sql.functions.{concat, expr, lit}
    import graft.ext.CorpusOps
    import graft.model.Tables
    val inDir = Files.createTempDirectory("graft_qg_in").toString
    val ckDir = Files.createTempDirectory("graft_qg_ck").toString
    val verdictDir = Files.createTempDirectory("graft_qg_out").toString + "/verdicts"

    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    // frozen reference model trains on the base; arrivals = held-out docs
    // plus the three E312 defect plants (negative id space)
    val base = docs.filter(col("doc_id") % 10 =!= 0)
    def inj(m: Int, textCol: org.apache.spark.sql.Column) =
      docs.filter(col("doc_id") % 40 === m)
        .select((-col("doc_id") - 1).as("doc_id"), textCol.as("text"))
    val arrivals = docs.filter(col("doc_id") % 10 === 0)
      .unionAll(inj(1, concat(expr("repeat('spam ', 60)"), lit("tail"),
        col("doc_id").cast("string"))))
      .unionAll(inj(3, expr("concat_ws(' ', transform(split(text, ' '), " +
        "t -> concat(t, 'z', CAST(doc_id AS STRING))))")))
      .unionAll(inj(4, expr("concat_ws(' ', slice(split(text, ' '), 1, 10))")))
    // two shards split on the plant's SOURCE id so both carry defects
    val shardA = arrivals.filter(col("doc_id").between(-251, 249))
    val shardB = arrivals.filter(col("doc_id") < -251 || col("doc_id") >= 250)

    def drop(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_drop").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      Files.move(part, java.nio.file.Paths.get(inDir, name))
    }
    drop(shardA, "docs_qg_a.parquet")
    IncrementalPipeline.qualityAvailableNow(
      spark, inDir, docs.schema, base, verdictDir, ckDir)
    drop(shardB, "docs_qg_b.parquet")
    IncrementalPipeline.qualityAvailableNow(
      spark, inDir, docs.schema, base, verdictDir, ckDir)

    def verdicts() = spark.read.parquet(verdictDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("rep_ratio"), r.getAs[Double]("avg_bigram_p"),
        r.getAs[Long]("xent_micronat"), r.getAs[Double]("quality_score"),
        r.getAs[String]("drop_reason"))).toSet
    val screened = verdicts()
    // per-doc scoring under a FIXED model is exactly shard-decomposable:
    // union of per-batch verdicts == the batch gate over the union corpus
    val model = CorpusOps.frozenQualityModel(base).persistAll()
    val (batchGate, cached) = CorpusOps.qualityGateFrozenWith(
      spark, shardA.unionAll(shardB), model)
    val expected = batchGate.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("rep_ratio"), r.getAs[Double]("avg_bigram_p"),
        r.getAs[Long]("xent_micronat"), r.getAs[Double]("quality_score"),
        r.getAs[String]("drop_reason"))).toSet
    cached.unpersist()
    assert(screened === expected)
    // each plant family attributes to its arm: spam → repetition;
    // unique-vocab → bigram_lm FIRST under the frozen model (p = 0 for
    // every OOV adjacency) with fail_xent true besides; truncation →
    // token floor
    val byReason = spark.read.parquet(verdictDir)
      .filter(col("doc_id") < 0).collect()
      .groupBy(r => -(r.getAs[Long]("doc_id")) - 1 match {
        case d if d % 40 == 1 => "spam"
        case d if d % 40 == 3 => "unique"
        case _ => "trunc"
      })
    byReason("spam").foreach(r =>
      assert(r.getAs[String]("drop_reason") === "repetition"))
    byReason("unique").foreach { r =>
      assert(r.getAs[String]("drop_reason") === "bigram_lm")
      assert(r.getAs[Boolean]("fail_xent"),
        "100%-OOV plant must also trip the frozen perplexity arm")
    }
    byReason("trunc").foreach(r =>
      assert(r.getAs[String]("drop_reason") === "low_quality"))
    val batchIds = spark.read.parquet(verdictDir)
      .select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(batchIds.size >= 2, s"expected >=2 micro-batches, got $batchIds")

    // E58 discipline: checkpointed re-run and batch retry are both no-ops
    IncrementalPipeline.qualityAvailableNow(
      spark, inDir, docs.schema, base, verdictDir, ckDir)
    assert(verdicts() === expected, "re-run must not change the verdicts")
    val model2 = CorpusOps.frozenQualityModel(base).persistAll()
    IncrementalPipeline.appendQualityVerdicts(
      spark, shardA, model2, batchIds.min, verdictDir)
    model2.unpersistAll()
    assert(verdicts() === expected, "batch retry must not double-append")
    spark.catalog.clearCache()
  }

  test("streaming publish: foreachBatch appends each micro-batch to the JDBC warehouse") {
    // the stream-to-warehouse production pattern (reference: Job-2 publish,
    // pg:77-89, but fed continuously): each micro-batch of the incremental
    // pipeline appends to the target over JDBC; the checkpointed file log
    // makes a re-run a no-op, so the warehouse is not double-loaded
    val inDir = Files.createTempDirectory("graft_pub_in").toString
    val ckDir = Files.createTempDirectory("graft_pub_ck").toString
    val url = "jdbc:derby:memory:graftstreampub;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")

    val raw = TaxiFixture.raw(spark, sf)
    def drop(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_drop").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      Files.move(part, java.nio.file.Paths.get(inDir, name))
    }
    drop(raw.filter(col("VendorID") <= 2), "yellow_tripdata_2024-02a.parquet")
    val expected = StarSchema.transform(
      spark.read.parquet(s"$inDir/*.parquet"), "2024", "2").count()

    def publishRun(): Unit = IncrementalPipeline.runAvailableNow(
      spark, inDir, raw.schema, "2024", "2", ckDir) { fact =>
      // the fact frame publishes as-is: one JDBC connection per partition
      fact.write.mode(org.apache.spark.sql.SaveMode.Append)
        .jdbc(url, "fact_trips_stream", props)
    }
    publishRun()
    val inWarehouse = spark.read.jdbc(url, "fact_trips_stream", props).count()
    assert(inWarehouse === expected && expected > 0)
    // re-running against the same checkpoint reprocesses nothing
    publishRun()
    assert(spark.read.jdbc(url, "fact_trips_stream", props).count() === expected)
  }
}
