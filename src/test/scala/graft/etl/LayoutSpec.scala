package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.model.Tables

/** Z-order layout: the interleave is a correct Morton code (local
  * de-interleave round-trips), range-partitioning on it actually
  * clusters BOTH dimensions (quantified bounding-box locality), and the
  * write path plans exactly one range exchange.
  */
class LayoutSpec extends SparkSuite {

  private def deinterleave(z: Long): (Long, Long) = {
    var a = 0L; var b = 0L
    for (i <- 0 until 8) {
      a |= ((z >> (2 * i)) & 1L) << i
      b |= ((z >> (2 * i + 1)) & 1L) << i
    }
    (a, b)
  }

  test("zValue8 is a correct Morton interleave (round-trips through de-interleave)") {
    import spark.implicits._
    val dims = for (a <- 0L to 255L by 17; b <- 0L to 255L by 13) yield (a, b)
    val out = dims.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue8(col("a"), col("b")).as("z"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (a, b) = deinterleave(r.getAs[Long]("z"))
      assert((a, b) === ((r.getAs[Long]("a"), r.getAs[Long]("b"))))
    }
    // order preservation at the top level: the curve visits quadrants in
    // (b, a) major order, so max z of the low-low quadrant < min z of
    // the high-high quadrant
    val q00 = out.filter(r => r.getLong(0) < 128 && r.getLong(1) < 128).map(_.getAs[Long]("z"))
    val q11 = out.filter(r => r.getLong(0) >= 128 && r.getLong(1) >= 128).map(_.getAs[Long]("z"))
    assert(q00.max < q11.min)
  }

  test("range-partitioning by z clusters both dimensions into small bounding boxes") {
    val parts = 8
    val ev = Tables.events(spark, sf)
      .select(pmod(col("user_id"), lit(256L)).as("d1"),
        dayofmonth(col("ts")).cast("long").as("d2"))
      .select(col("d1"), col("d2"), Layout.zValue8(col("d1"), col("d2")).as("z"))
    val laid = ev.repartitionByRange(parts, col("z"))
    // the layout write path is ONE range exchange
    val plan = laid.queryExecution.sparkPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    val boxes = laid
      .select(spark_partition_id().as("p"), col("d1"), col("d2"))
      .groupBy(col("p"))
      .agg(min("d1").as("d1_lo"), max("d1").as("d1_hi"),
        min("d2").as("d2_lo"), max("d2").as("d2_hi"), count(lit(1)).as("n"))
      .collect()
    assert(boxes.length > 1)
    val global = ev.agg(
      (max("d1") - min("d1") + 1).as("w1"), (max("d2") - min("d2") + 1).as("w2"))
      .collect().head
    val globalArea = global.getAs[Long]("w1").toDouble * global.getAs[Long]("w2")
    val meanArea = boxes.map(r =>
      (r.getAs[Long]("d1_hi") - r.getAs[Long]("d1_lo") + 1).toDouble *
        (r.getAs[Long]("d2_hi") - r.getAs[Long]("d2_lo") + 1)).sum / boxes.length
    // each z-range file covers a small fraction of the (d1, d2) plane —
    // this bounded box is exactly what parquet min/max pruning keys off.
    // A single-column sort gives ~globalArea boxes for the other column.
    assert(meanArea < globalArea / 2,
      s"z-order lost locality: mean box $meanArea vs global $globalArea")
  }

  test("compactionPlan matches a local running-total replay and honors its bounds") {
    import spark.implicits._
    // partition a: mixed sizes incl. a jumbo file spanning 2 target
    // stripes (forces the dense renumber); partition b: one jumbo file
    val rows = Seq(
      ("a", 1L, 90L), ("a", 2L, 20L), ("a", 3L, 5L), ("a", 4L, 200L),
      ("a", 5L, 150L), ("a", 6L, 10L), ("a", 7L, 150L), ("a", 8L, 99L),
      ("a", 9L, 2L), ("a", 10L, 99L),
      ("b", 1L, 1000L))
    val target = 100L
    val out = Layout.compactionPlan(
        rows.toDF("part", "file", "bytes"), "part", "file", "bytes", target)
      .collect()
      .map(r => (r.getAs[String]("part"), r.getAs[Long]("file")) ->
        r.getAs[Long]("grp")).toMap
    // local replay of the documented rule: grp = before-sum div target,
    // then dense renumber per partition
    val local = rows.groupBy(_._1).flatMap { case (p, fs) =>
      val sorted = fs.sortBy(_._2)
      val raw = sorted.scanLeft(0L)(_ + _._3).init.map(_ / target)
      val renum = raw.distinct.sorted.zipWithIndex.toMap
      sorted.zip(raw).map { case ((_, f, _), g) => (p, f) -> renum(g).toLong }
    }
    assert(out === local)
    // invariants: consecutive group ids from 0, non-decreasing in file
    // order, conservation, and overshoot bounded by the group's last file
    rows.groupBy(_._1).foreach { case (p, fs) =>
      val sorted = fs.sortBy(_._2)
      val grps = sorted.map { case (_, f, _) => out((p, f)) }
      assert(grps.head === 0L)
      assert(grps.zip(grps.tail).forall { case (x, y) => y == x || y == x + 1 })
      grps.distinct.foreach { g =>
        val members = sorted.filter { case (_, f, _) => out((p, f)) == g }
        val total = members.map(_._3).sum
        assert(total <= target + members.last._3,
          s"part $p grp $g total $total overshoots past its boundary file")
      }
    }
  }

  test("event compaction groups are contiguous day stripes that conserve bytes") {
    val out = Layout.qEventCompaction(spark, sf).collect()
    assert(out.nonEmpty)
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day"))
      .agg((count(lit(1)) * 64L).as("bytes"))
      .collect()
    val totalBytes = daily.map(_.getAs[Long]("bytes")).sum
    assert(out.map(_.getAs[Long]("grp_bytes")).sum === totalBytes)
    assert(out.map(_.getAs[Long]("n_files")).sum === daily.length)
    out.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val byGrp = rs.sortBy(_.getAs[Long]("grp"))
      assert(byGrp.map(_.getAs[Long]("grp")).toSeq === byGrp.indices.map(_.toLong))
      // order-preserving: day spans of successive groups do not overlap
      byGrp.zip(byGrp.tail).foreach { case (g1, g2) =>
        assert(g1.getAs[Long]("day_hi") < g2.getAs[Long]("day_lo"))
      }
    }
  }

  test("curve segments in the audit query tile the z range in order") {
    val out = Layout.qEventZorder(spark, sf).collect()
    assert(out.nonEmpty)
    val segs = out.map(_.getAs[Int]("z_segment"))
    assert(segs.toSeq === segs.sorted.toSeq)
    assert(segs.forall(s => s >= 0 && s < 64))
    out.foreach { r =>
      assert(r.getAs[Long]("d1_lo") <= r.getAs[Long]("d1_hi"))
      assert(r.getAs[Long]("d2_lo") <= r.getAs[Long]("d2_hi"))
    }
  }
}
