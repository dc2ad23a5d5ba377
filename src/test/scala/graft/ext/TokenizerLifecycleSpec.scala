package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.model.Tables

/** STORED-TOKENIZER LIFECYCLE (E325 — the E322 stored-index discipline
  * applied to the E323 unigram model): production trains once, persists
  * the vocab-bounded model tables (piece costs + piece ids), and encodes
  * every arriving shard under the FROZEN stored model without touching
  * the training corpus. This spec actually stores the two tables in the
  * session catalog, re-reads them fresh, and proves:
  * (a) frozen-encode of the training corpus is id-for-id identical to
  *     the in-corpus registry op `q_doc_unigram_encode`;
  * (b) a novel arrival word built from trained characters encodes and
  *     decodes back to itself under the stored model;
  * (c) an arrival word with an untrained character, and a word past the
  *     lattice bound, surface as `n_words_skipped` — never a crash, never
  *     a silent drop.
  */
class TokenizerLifecycleSpec extends SparkSuite {

  test("stored unigram model: freeze -> catalog -> fresh read -> encode arrivals") {
    val spark0 = spark
    import spark0.implicits._
    val (tCosts, tIds) = ("graft_uni_costs", "graft_uni_ids")
    Seq(tCosts, tIds).foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$t")
      loc.getFileSystem(spark.sessionState.newHadoopConf()).delete(loc, true)
    }

    // ---- write time: train on the corpus, persist the two model tables
    val docs = Tables.documents(spark, sf)
    val (costs, ids) = TextOps.uniFrozenModel(docs)
    costs.write.saveAsTable(tCosts)
    ids.write.saveAsTable(tIds)

    // ---- read time: fresh catalog reads drive every encode below
    val sCosts = spark.table(tCosts)
    val sIds = spark.table(tIds)

    // (a) frozen-encode(training corpus) == the in-corpus registry op
    def asMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_words_skipped"),
          r.getAs[String]("token_ids")))).toMap
    val frozen = asMap(TextOps.uniEncodeFrozen(docs, sCosts, sIds).collect())
    val incorp = asMap(TextOps.qDocUnigramEncode(spark, sf).collect())
    assert(frozen === incorp,
      "frozen encode under the stored model must replay the in-corpus op")

    // (b)(c) arrivals: a novel-but-coverable word, an untrained-char
    // word, and an over-length word — built from a character the model
    // provably trained on
    val knownChar = sCosts.filter(length(col("piece")) === 1)
      .orderBy(col("piece")).head.getAs[String]("piece")
    val novel = knownChar * 5            // unseen as a WORD, chars all trained
    val oov = "ßß"             // ß: not in the synthetic corpus
    val tooLong = knownChar * (TextOps.uniMaxWordLen + 3)
    val arrivals = Seq(
      (900001L, s"$novel $novel"),
      (900002L, s"$novel $oov"),
      (900003L, tooLong)).toDF("doc_id", "text")
    val out = TextOps.uniEncodeFrozen(arrivals, sCosts, sIds).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    val idToPiece = sIds.collect()
      .map(r => r.getAs[Long]("tid") -> r.getAs[String]("piece")).toMap
    def decode(r: org.apache.spark.sql.Row): String =
      r.getAs[String]("token_ids").split(" ").map(_.toLong).map(idToPiece).mkString

    assert(out(900001L).getAs[Long]("n_words_skipped") === 0L)
    assert(decode(out(900001L)) === novel + novel,
      "novel word from trained chars encodes and decodes under the stored model")
    assert(out(900002L).getAs[Long]("n_words_skipped") === 1L,
      "the untrained-character word is counted, not dropped or crashed")
    assert(decode(out(900002L)) === novel)
    // a doc whose only word is over-length keeps its skip count visible
    assert(out(900003L).getAs[Long]("n_words_skipped") === 1L)
    assert(out(900003L).getAs[Long]("n_tokens") === 0L)

    Seq(tCosts, tIds).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
