package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ext.Similarity
import graft.model.Tables

/** Semantics tests for the round-4 operators: as-of attribution against a
  * driver-side brute-force recomputation, max_by-vs-window compaction
  * agreement, cube lattice totals, and k-means iteration structure.
  */
class Round4OpsSpec extends SparkSuite {

  /** java.sql.Timestamp → exact epoch micros (getTime alone truncates to ms). */
  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  test("as-of attribution matches a brute-force per-purchase recomputation") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        micros(r.getAs[java.sql.Timestamp]("ts")), r.getAs[String]("event_type")))
    // expected: for each purchase, the max-ts click at-or-before it (ties on
    // ts broken by min event_id — the query's pre-dedup rule)
    val clicksByUser = ev.filter(_._4 == "click").groupBy(_._1)
    val expected = ev.filter(_._4 == "purchase").map { case (u, pid, pts, _) =>
      val best = clicksByUser.getOrElse(u, Array.empty)
        .filter(_._3 <= pts)
        .sortBy(c => (-c._3, c._2))
        .headOption
      (u, pid) -> best.map(c => (c._2, c._3))
    }.toMap
    val got = Analytics.qEventAttributionAsof(spark, sf).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val key = (r.getAs[Long]("user_id"), r.getAs[Long]("purchase_event_id"))
      val want = expected(key)
      if (want.isEmpty) {
        assert(r.isNullAt(r.fieldIndex("last_click_event_id")), s"$key: expected no click")
      } else {
        assert(r.getAs[Long]("last_click_event_id") === want.get._1, s"$key: wrong click")
        assert(micros(r.getAs[java.sql.Timestamp]("last_click_ts")) === want.get._2)
        assert(r.getAs[Long]("gap_us") ===
          micros(r.getAs[java.sql.Timestamp]("purchase_ts")) - want.get._2)
      }
    }
  }

  test("latest-per-user: map-side max_by form agrees with the window form") {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    val windowForm = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w))
      .withColumn("n_events", count(lit(1)).over(Window.partitionBy(col("user_id"))))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("ts").as("last_ts"),
        col("event_type"), col("value"), col("n_events"))
    val aggForm = Analytics.qEventLatestPerUser(spark, sf)
    assert(aggForm.exceptAll(windowForm).isEmpty && windowForm.exceptAll(aggForm).isEmpty)
  }

  test("cube: the all-null cell equals the grand total, marginals sum to it") {
    val rows = Analytics.qEventCube(spark, sf).collect()
    val total = Tables.events(spark, sf).count()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length === 1 && grand.head.getAs[Long]("n") === total)
    // each 1-D marginal slice sums back to the grand total
    val byType = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1)).map(_.getAs[Long]("n")).sum
    val byDay = rows.filter(r => r.isNullAt(0) && !r.isNullAt(1)).map(_.getAs[Long]("n")).sum
    assert(byType === total && byDay === total)
  }

  test("curation funnel: every gate fires, injected dups attribute to the right stage") {
    val out = graft.ext.Dedup.qDocCurate(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("drop_reason")).toMap
    val reasons = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(reasons.getOrElse("kept", 0) > 0, s"nothing kept: $reasons")
    assert(reasons.getOrElse("exact_dup", 0) > 0, s"exact gate never fired: $reasons")
    assert(reasons.getOrElse("near_dup", 0) > 0, s"near gate never fired: $reasons")
    assert(reasons.getOrElse("low_quality", 0) > 0, s"quality gate never fired: $reasons")
    // every injected exact copy (+100000) deduplicates against its source
    val exactCopies = out.filter { case (id, _) => id >= 100000 && id < 200000 }
    assert(exactCopies.nonEmpty && exactCopies.values.forall(_ == "exact_dup"))
    // the banded minhash catches (at least most of) the +200000 near copies
    val nearCopies = out.filter { case (id, _) => id >= 200000 }
    assert(nearCopies.nonEmpty)
    assert(nearCopies.values.count(_ == "near_dup") * 2 > nearCopies.size,
      s"near recall under 50%: ${nearCopies.values.groupBy(identity).view.mapValues(_.size).toMap}")
    // originals never drop as duplicates of their own injected copies
    assert(!out.filter(_._1 < 100000).values.exists(r => r == "exact_dup"))
  }

  test("k-means iteration: valid cells, consistent member counts, full coverage") {
    val out = Similarity.qEmbKmeansIter(spark, sf).collect()
    val corpus = Tables.embeddings(spark, sf).count()
    val cells = out.map(_.getAs[Int]("cell")).distinct
    assert(cells.forall(c => c >= 0 && c < Similarity.kmeansK))
    // n_members constant across dims within a cell; every cell emits all dims
    out.groupBy(_.getAs[Int]("cell")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("n_members")).distinct.length === 1)
      assert(rs.length === Similarity.embDim)
    }
    // every vector is assigned to exactly one cell
    val members = out.filter(_.getAs[Int]("i") === 1).map(_.getAs[Long]("n_members")).sum
    assert(members === corpus)
  }
}
