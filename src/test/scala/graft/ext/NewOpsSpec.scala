package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.model.Tables
import graft.queries.Analytics

/** Semantics tests for the round-3 operators: embedding near-dup recall on
  * injected pairs, IVF cell structure and probe consistency, centroid
  * algebra, sessionization invariants, rolling-fingerprint order
  * sensitivity, and the Q9 join shape.
  */
class NewOpsSpec extends SparkSuite {

  test("embedding near-dup: only injected pairs survive, cosine above threshold") {
    val pairs = Similarity.qEmbNearDup(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"), r.getAs[Double]("cosine")))
    assert(pairs.nonEmpty)
    // background max cosine is ~0.5, injected ~0.89 — every surviving pair
    // must be an injected (source, source+100000) pair
    assert(pairs.forall { case (a, b, c) =>
      b === a + 100000 && a % 25 === 0 && c >= Similarity.nearDupThreshold && c <= 1.0
    })
  }

  test("IVF: every vector lands in exactly one cell; probe results share the query's cell") {
    val nVecs = Tables.embeddings(spark, sf).count()
    // re-derive assignment cardinality through the public query: each of the
    // q-vectors produces at most topK rows, all tagged with ONE cell
    val rows = Similarity.qEmbAnnIvf(spark, sf).collect()
    assert(rows.nonEmpty && nVecs > 0)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("cell")).distinct.length === 1) // nprobe=1
      val byRank = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      assert(byRank.zip(byRank.tail).forall { case (hi, lo) => hi >= lo })
    }
  }

  test("label centroids: k×dim rows, and each centroid is the mean of its members") {
    val emb = Tables.embeddings(spark, sf)
    val k = emb.select("label").distinct().count()
    val cent = Similarity.qEmbLabelCentroids(spark, sf).collect()
    assert(cent.length === k * Similarity.embDim)
    // spot-check one (label, i) against a directly computed mean
    val label0 = cent.filter(r => r.getAs[Int]("label") === 0 && r.getAs[Int]("i") === 1).head
    val members = emb.filter(col("label") === 0)
      .select(element_at(col("embedding"), 1).cast("double")).collect().map(_.getDouble(0))
    assert(math.abs(label0.getAs[Double]("c") - members.sum / members.length) < 1e-9)
  }

  test("event sessions: counts sum to the event count, ends = last event + gap") {
    val sessions = Analytics.qEventSessions(spark, sf).collect()
    val nEvents = Tables.events(spark, sf).count()
    assert(sessions.map(_.getAs[Long]("n_events")).sum === nEvents)
    assert(sessions.length < nEvents) // the gap actually merges events
    // session windows of one user never overlap
    sessions.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[java.sql.Timestamp]("session_start").getTime)
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a.getAs[java.sql.Timestamp]("session_end").getTime <=
          b.getAs[java.sql.Timestamp]("session_start").getTime +
            Analytics.sessionGapHours * 3600L * 1000L)
      }
    }
  }

  test("rolling fingerprint is order-sensitive where content_fp input set is equal") {
    val spark0 = spark
    import spark0.implicits._
    // same token multiset, different order → same token-hash SET but
    // different rolling fp
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha")).toDF("doc_id", "text")
    df.createOrReplaceTempView("nos_docs")
    val fp = spark.sql(
      s"""SELECT doc_id, aggregate(transform(split(text, ' '),
         |  s -> ${TextOps.h31ExprSql("s")}),
         |  0L, (acc, h) -> (acc * ${Dedup.rollingBase} + h) % ${TextOps.HashP}) AS fp
         |FROM nos_docs""".stripMargin).collect().map(_.getLong(1))
    assert(fp(0) !== fp(1))
  }

  test("ANN recall: IVF and LSH probes recover a meaningful share of the exact top-k") {
    def topSets(rows: Array[org.apache.spark.sql.Row]) =
      rows.groupBy(_.getAs[Long]("q_id")).view
        .mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val exact = topSets(Similarity.qEmbCosineTopk(spark, sf).collect())
    val ivf = topSets(Similarity.qEmbAnnIvf(spark, sf).collect())
    val lsh = topSets(Similarity.qEmbAnnLsh(spark, sf).collect())
    assert(exact.nonEmpty)
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val hits = exact.map { case (q, t) => approx.getOrElse(q, Set.empty).intersect(t).size }.sum
      hits.toDouble / exact.values.map(_.size).sum
    }
    // nprobe=1 IVF and a single 4-plane sign table both trade recall for
    // touching ~1/cells of the corpus — measured on this corpus: IVF 0.13
    // (40 label cells over 200 vectors is a BRUTAL quantizer at nprobe=1),
    // LSH higher (16 buckets). The floors pin the deterministic quality so
    // a bucketing regression fails CI rather than silently zeroing recall;
    // production raises nprobe / OR's tables for real recall targets
    // (qEmbNearDup's 6-table construction is the corpus-mining variant).
    assert(recall(ivf) >= 0.1, s"IVF recall ${recall(ivf)}")
    assert(recall(lsh) >= 0.2, s"LSH recall ${recall(lsh)}")
  }

  test("q9: every (nation, brand) group joins through filtered parts only") {
    val rows = Analytics.q9ProductProfit(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_lineitems") > 0))
    val nations = Tables.nation(spark, sf).count()
    assert(rows.map(_.getAs[String]("nation")).distinct.length <= nations)
  }
}
