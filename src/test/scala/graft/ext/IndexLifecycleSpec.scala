package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.model.Tables

/** STORED-INDEX LIFECYCLE (the r12 verdict's "stats live with the index"
  * proof, end-to-end): the IVF surfaces' scaladocs claim that at scale
  * the cell assignments and per-cell stats are PERSISTED with the index
  * and the incremental ops touch only the batch + the stats table. This
  * spec actually stores them — assignments bucketed on the cell key,
  * stats and quantizer as catalog tables (the PersistenceSpec
  * discipline) — then drives `ivfAppendOnly` and the rebuild audit off a
  * FRESH catalog read, asserting (a) the stored-driven merge equals a
  * from-scratch recompute, (b) the write-back keeps stats ≡ assignments,
  * (c) the append plan's only row-scale input is the batch (one
  * embeddings scan, no vec_id exchange), and (d) a rebuild's
  * from-scratch stats, stored and read back, round-trip identically.
  */
class IndexLifecycleSpec extends SparkSuite {

  private def embSide(keep: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      shift: Double = 0.0): DataFrame =
    Tables.embeddings(spark, sf).filter(keep(col("vec_id")))
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double") + shift).as("e"))

  private def packQuantizer(rows: DataFrame): DataFrame =
    rows.agg(array_sort(collect_list(struct(col("c_label"), col("cv"), col("cc"))))
      .as("cents"))

  private def statsMap(df: DataFrame, n: String, sd: String): Map[Long, (Long, Long)] =
    df.collect().map(r => r.getAs[Long]("cell") ->
      (r.getAs[Long](n), r.getAs[Long](sd))).toMap

  test("stored IVF index: append + rebuild drive off catalog tables; stats stay with the index") {
    val (tAssign, tStats, tQuant) = ("graft_ivf_assign", "graft_ivf_stats", "graft_ivf_quant")
    Seq(tAssign, tStats, tQuant).foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      // an aborted earlier run can leave the managed location behind after
      // the catalog entry is gone — clear it or saveAsTable refuses
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$t")
      loc.getFileSystem(spark.sessionState.newHadoopConf()).delete(loc, true)
    }

    // ---- write time: index the base corpus and persist all three parts
    val baseE = embSide(_ % 5 =!= 0)
    val qArr = Similarity.centroidArrayOfE(baseE, None).persist()
    qArr.count()
    // assignments bucketed on the probe key, so the ANN equi-join reads
    // co-located buckets instead of reshuffling the corpus (the E53 note)
    Similarity.probeCells(baseE.select(col("vec_id"), col("e")), qArr, 1)
      .select(col("vec_id"), col("cell"),
        expr("CAST(floor(dist * 1000000.0) AS BIGINT)").as("dq"))
      .write.bucketBy(4, "cell").sortBy("cell").saveAsTable(tAssign)
    Similarity.ivfCellStats(baseE, qArr).write.saveAsTable(tStats)
    qArr.select(explode(col("cents")).as("c"))
      .select(col("c.c_label").as("c_label"), col("c.cv").as("cv"),
        col("c.cc").as("cc"))
      .write.saveAsTable(tQuant)
    qArr.unpersist()

    // stats ≡ assignments at write time: per-cell counts and summed
    // micro-distances agree between the two stored tables
    val fromAssign = spark.table(tAssign).groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), sum(col("dq")).as("sd"))
    assert(statsMap(fromAssign, "n", "sd") ===
      statsMap(spark.table(tStats), "n", "sd"),
      "stored stats must equal a recount of the stored assignments")

    // ---- read time: a fresh catalog read drives the O(batch) append
    val storedStats = spark.table(tStats)
    val storedQuant = packQuantizer(spark.table(tQuant))
    val batchE = embSide(_ % 5 === 0)
    val merged = Similarity.ivfAppendOnly(storedStats, storedQuant, batchE)

    // plan: the batch is the ONLY row-scale input — exactly one scan of
    // the embeddings parquet (the batch side), base present only as the
    // |cells|-sized stats table, and nothing exchanges on vec_id
    val p = merged.queryExecution.executedPlan.toString
    assert("embeddings\\.parquet".r.findAllIn(p).size === 1,
      s"append path must scan embeddings once (the batch), got:\n$p")
    assert(p.contains(tStats), s"append path must read the stored stats table:\n$p")
    assert(!"hashpartitioning\\([^)]*vec_id".r.findFirstIn(p).isDefined,
      s"append path reshuffled on vec_id:\n$p")

    // correctness: stored-driven merge == one from-scratch pass over the
    // union under the same (stored) quantizer
    val full = Similarity.ivfCellStats(baseE.unionAll(batchE), storedQuant)
    assert(statsMap(merged, "n_merged", "sd_merged") ===
      statsMap(full, "n", "sd"),
      "stored-stats merge must equal the from-scratch union recompute")

    // ---- write-back: the index grows by the batch only; stats stay
    // consistent with assignments after the append
    Similarity.probeCells(batchE.select(col("vec_id"), col("e")), storedQuant, 1)
      .select(col("vec_id"), col("cell"),
        expr("CAST(floor(dist * 1000000.0) AS BIGINT)").as("dq"))
      .write.mode("append").bucketBy(4, "cell").sortBy("cell").saveAsTable(tAssign)
    val mergedRows = merged.select(col("cell"), col("n_merged").as("n"),
      col("sd_merged").as("sd"))
    val fromAssign2 = spark.table(tAssign).groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), sum(col("dq")).as("sd"))
    assert(statsMap(fromAssign2, "n", "sd") === statsMap(mergedRows, "n", "sd"),
      "after the append, merged stats must still equal an assignment recount")
    assert(spark.table(tAssign).count() === baseE.count() + batchE.count())

    // ---- rebuild path: a drifted batch trips the trigger; the rebuild's
    // from-scratch stats stored and read back round-trip identically
    val drifted = embSide(_ % 5 === 0, shift = 0.5)
    val (rebuildOut, handles) =
      Similarity.ivfRebuildFromWith(spark, baseE, drifted)
    val rebuilt = rebuildOut.persist()
    assert(rebuilt.collect().forall(_.getAs[Boolean]("rebuilt")),
      "the +0.5/dim drifted batch must trip the rebuild trigger")
    spark.sql(s"DROP TABLE IF EXISTS $tStats")
    def fullMap(df: DataFrame): Map[Long, (Long, Double)] =
      df.collect().map(r => r.getAs[Long]("cell") ->
        (r.getAs[Long]("n_full"), r.getAs[Double]("mean_d_full"))).toMap
    rebuilt.select(col("cell"), col("n_full"), col("mean_d_full"))
      .write.saveAsTable(tStats)
    assert(fullMap(spark.table(tStats)) === fullMap(rebuilt),
      "rebuilt stats must round-trip through the catalog unchanged")
    rebuilt.unpersist()
    handles.foreach(_.unpersist())

    Seq(tAssign, tStats, tQuant).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.catalog.clearCache()
  }
}
