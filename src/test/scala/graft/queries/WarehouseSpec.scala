package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.model.Tables

/** Semantics tests for the warehouse-maintenance operators: LOCF backfill
  * matches a per-user local scan, and the SCD2 merge versions exactly the
  * changed keys (staged no-ops stay single-version).
  */
class WarehouseSpec extends SparkSuite {

  test("twa: matches a local interval-weighted replay; bounded by observed extremes") {
    val out = Warehouse.qEventTwa(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_obs"), r.getAs[Long]("span_us"), r.getAs[Double]("twa"))).toMap
    val raw = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("value"), col("ts"))
      .collect()
      .map { r =>
        val t = r.getAs[java.sql.Timestamp]("ts")
        (r.getAs[Long]("user_id"),
          t.getTime * 1000 + (t.getNanos / 1000) % 1000,
          r.getAs[Long]("event_id"),
          BigDecimal(r.getAs[Double]("value")).setScale(2, BigDecimal.RoundingMode.HALF_UP))
      }
    val local = raw.groupBy(_._1).collect {
      case (u, rows) if rows.length >= 2 &&
          { val s = rows.sortBy(r => (r._2, r._3))
            s.zip(s.tail).map { case (a, b) => (b._2 - a._2) / 1000 }.sum > 0 } =>
        val s = rows.sortBy(r => (r._2, r._3))
        val span = s.last._2 - s.head._2
        val gaps = s.zip(s.tail).map { case (a, b) => (b._2 - a._2) / 1000 }
        val mass = s.zip(gaps).map { case (a, g) => a._4 * BigDecimal(g) }.sum
        u -> (rows.length.toLong, span, mass.toDouble / gaps.sum.toDouble)
    }
    assert(out.keySet === local.keySet)
    local.foreach { case (u, (n, span, twa)) =>
      assert(out(u)._1 === n)
      assert(out(u)._2 === span)
      assert(math.abs(out(u)._3 - twa) < 1e-9, s"user $u")
      // a weighted mean stays inside the observed value envelope
      val vs = raw.filter(_._1 == u).map(_._4.toDouble)
      assert(out(u)._3 >= vs.min - 1e-9 && out(u)._3 <= vs.max + 1e-9)
    }
  }

  test("locf: matches a local per-user forward scan") {
    val out = Warehouse.qEventLocf(spark, sf).collect()
    // local recompute: per user ordered by (ts micros, event_id), carry
    // the last purchase value forward
    val raw = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"), col("ts"))
      .collect()
    val expected = raw
      .groupBy(_.getAs[Long]("user_id"))
      .toSeq
      .flatMap { case (_, rows) =>
        var lastP: Option[Double] = None
        // micros, not millis: getTime truncates and a same-millisecond tie
        // would locally sort differently than Spark's full-precision ts
        rows.sortBy { r =>
          val t = r.getAs[java.sql.Timestamp]("ts")
          (t.getTime * 1000 + (t.getNanos / 1000) % 1000, r.getAs[Long]("event_id"))
        }
          .map { r =>
            if (r.getAs[String]("event_type") == "purchase")
              lastP = Some(r.getAs[Double]("value"))
            r.getAs[Long]("event_id") -> lastP
          }
      }.toMap
    assert(out.length === raw.length)
    out.foreach { r =>
      val got = Option(r.getAs[java.lang.Double]("last_purchase_value")).map(_.doubleValue)
      assert(got === expected(r.getAs[Long]("event_id")),
        s"event ${r.getAs[Long]("event_id")}")
    }
    // fill factor sanity: once a user purchases, every later row is filled
    assert(out.count(_.getAs[java.lang.Double]("last_purchase_value") != null) > 0)
  }

  test("scd2: changed keys get two versions, staged no-ops stay at one") {
    val out = Warehouse.qScd2Customer(spark, sf).collect()
    val dim = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getAs[Long]("c_custkey") -> r.getAs[String]("c_mktsegment")).toMap
    // changed = staged (key % 7 == 0) AND remapped (key % 14 == 0) AND not
    // already 'REMAPPED' (never true in TPC-H segments)
    val changed = dim.keySet.filter(k => k % 14 == 0)
    val byKey = out.groupBy(_.getAs[Long]("c_custkey"))
    assert(byKey.keySet === dim.keySet)
    byKey.foreach { case (k, versions) =>
      if (changed(k)) {
        assert(versions.length === 2, s"key $k")
        val Array(old, nu) = versions.sortBy(_.getAs[java.sql.Date]("valid_from").toString)
        assert(!old.getAs[Boolean]("is_current") && old.getAs[String]("segment") === dim(k))
        assert(old.getAs[java.sql.Date]("valid_to").toString === Warehouse.scdEffectiveDate)
        assert(nu.getAs[Boolean]("is_current") && nu.getAs[String]("segment") === "REMAPPED")
        assert(nu.getAs[java.sql.Date]("valid_from").toString === Warehouse.scdEffectiveDate)
        assert(nu.getAs[java.sql.Date]("valid_to") === null)
      } else {
        // unstaged keys AND staged no-ops: one untouched open version
        assert(versions.length === 1, s"key $k")
        val v = versions.head
        assert(v.getAs[Boolean]("is_current") && v.getAs[String]("segment") === dim(k))
        assert(v.getAs[java.sql.Date]("valid_from").toString === Warehouse.scdInitialDate)
        assert(v.getAs[java.sql.Date]("valid_to") === null)
      }
    }
  }

  test("tableDiff: all four classes on a hand-built pair, null-safe compare") {
    import spark.implicits._
    val oldDf = Seq(
      (1L, Some("a"), 10.0), (2L, Some("b"), 20.0),
      (3L, Option.empty[String], 30.0), (4L, Some("d"), 40.0)
    ).toDF("k", "s", "v")
    val newDf = Seq(
      (1L, Some("a"), 10.0), // unchanged
      (2L, Some("B"), 20.0), // changed (value)
      (3L, Some("c"), 30.0), // changed (NULL -> value must NOT read as unchanged)
      (5L, Some("e"), 50.0) // added; 4 removed
    ).toDF("k", "s", "v")
    val out = Warehouse.tableDiff(oldDf, newDf, "k", Seq("s", "v")).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("diff_status")).toMap
    assert(out === Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
  }

  test("table diff entry: class counts match the fixture arithmetic") {
    val out = Warehouse.qTableDiffCustomer(spark, sf).collect()
      .map(r => r.getAs[String]("diff_status") -> r.getAs[Long]("n_keys")).toMap
    val keys = Tables.customer(spark, sf).select("c_custkey").collect()
      .map(_.getAs[Long]("c_custkey"))
    val removed = keys.count(_ % 13 == 0)
    val changed = keys.count(k => k % 13 != 0 && k % 11 == 0)
    assert(out("added") === 10L)
    assert(out("removed") === removed.toLong)
    assert(out("changed") === changed.toLong)
    assert(out("unchanged") === keys.length.toLong - removed - changed)
  }

  test("entity match: every dirty record pairs its clean original, nothing else") {
    val out = Warehouse.qCustEntityMatch(spark, sf).collect()
    val keys = Tables.customer(spark, sf).select("c_custkey").collect()
      .map(_.getAs[Long]("c_custkey"))
    val expect = keys.filter(_ % 9 == 0).map(k => (k, k + 500000L)).toSet
    assert(out.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet === expect)
    // the injected typo is exactly one substitution
    assert(out.forall(_.getAs[Int]("edits") === 1))
    // blocked candidate generation is an equi-join, never a nested loop
    val p = Warehouse.qCustEntityMatch(spark, sf).queryExecution.sparkPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("scd2: the merge join broadcasts the staged side") {
    val plan = Warehouse.qScd2Customer(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.linesIterator.take(5).mkString("\n"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("cdc apply: every merge class lands correctly, last-wins proven") {
    import org.apache.spark.sql.functions.col
    val base = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal")).collect()
      .map(r => r.getAs[Long]("c_custkey") ->
        (r.getAs[String]("c_name"), r.getAs[Double]("c_acctbal"))).toMap
    val out = Warehouse.qCdcApplyCustomer(spark, sf).collect()
      .map(r => r.getAs[Long]("c_custkey") ->
        (r.getAs[String]("c_name"), r.getAs[Double]("c_acctbal"))).toMap
    base.keys.foreach { k =>
      if (k % 10 == 5) assert(!out.contains(k), s"deleted key $k survived")
      else if (k % 20 == 0) // seq-2 update beats seq-1: last-wins
        assert(out(k)._2 === base(k)._2 + 200, s"key $k")
      else if (k % 10 == 0)
        assert(out(k)._2 === base(k)._2 + 100, s"key $k")
      else assert(out(k) === base(k), s"untouched key $k changed")
      if (k % 25 == 0) {
        assert(out(k + 1000000L)._1 === s"NEW ${base(k)._1}")
        assert(out(k + 1000000L)._2 === 0.0)
      }
    }
    // no keys materialize beyond base ∪ inserts
    val expectedKeys = base.keys.filterNot(_ % 10 == 5).toSet ++
      base.keys.filter(_ % 25 == 0).map(_ + 1000000L)
    assert(out.keySet === expectedKeys)
    // the last-wins reduction is an aggregate, not a row_number window
    val p = Warehouse.qCdcApplyCustomer(spark, sf).queryExecution.sparkPlan.toString
    assert(!p.contains("Window"), p)
  }

  test("incremental agg maintenance: algebraic merge equals the full recompute") {
    import org.apache.spark.sql.functions.col
    val out = Warehouse.qIncrAggMaintain(spark, sf).collect()
    assert(out.nonEmpty)
    // the query carries its own proof column — every row must attest it
    out.foreach(r => assert(r.getAs[Boolean]("matches_full"),
      s"${r.get(0)}/${r.get(1)}"))
    // group coverage: exactly the (day, type) groups of the full stream
    val expectGroups = Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.to_date(col("ts")).as("day"),
        col("event_type")).distinct().count()
    assert(out.length.toLong === expectGroups)
    // conservation: merged counts sum to the stream size
    assert(out.map(_.getAs[Long]("n")).sum === Tables.events(spark, sf).count())
  }

  test("interp: matches a local bracketing replay, exact hits included") {
    import org.apache.spark.sql.functions.col
    val out = Warehouse.qEventInterpDaily(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("grid_es")) ->
        r.getAs[Double]("interp_value")).toMap
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").cast("long").as("es"), col("value"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("es"), r.getAs[Double]("value")))
    val local = scala.collection.mutable.Map.empty[(Long, Long), Double]
    purchases.groupBy(_._1).foreach { case (u, rows) =>
      val pts = rows.map(r => (r._2, r._3)).sortBy(_._1)
      val lo = pts.head._1; val hi = pts.last._1
      var g = math.ceil(lo.toDouble / 86400).toLong * 86400
      while (g <= hi) {
        val prev = pts.filter(_._1 <= g).last
        val next = pts.find(_._1 >= g).getOrElse(pts.last)
        local((u, g)) =
          if (next._1 == prev._1) prev._2
          else prev._2 + (next._2 - prev._2) * (g - prev._1).toDouble / (next._1 - prev._1)
        g += 86400
      }
    }
    assert(out.keySet === local.keySet)
    out.foreach { case (k, v) =>
      assert(math.abs(v - local(k)) <= 1e-9 * math.max(1.0, math.abs(local(k))), k)
    }
    // interpolation stays inside its bracket's value envelope
    val byUser = purchases.groupBy(_._1)
    out.foreach { case ((u, _), v) =>
      val vs = byUser(u).map(_._3)
      assert(v >= vs.min - 1e-9 && v <= vs.max + 1e-9)
    }
  }

  test("gdpr erasure: cascade counts match local sets, conservation, zero orphans") {
    import org.apache.spark.sql.functions.col
    val out = Warehouse.qGdprErasure(spark, sf).collect()
      .map(r => r.getAs[String]("table_name") ->
        (r.getAs[Long]("rows_before"), r.getAs[Long]("rows_deleted"),
          r.getAs[Long]("rows_after"), r.getAs[Long]("orphans_after"))).toMap
    assert(out.keySet === Set("customer", "orders", "lineitem"))
    // conservation + referential closure on every table
    out.values.foreach { case (b, d, a, o) =>
      assert(b === d + a); assert(o === 0L); assert(d > 0L, "erasure list hit nothing")
    }
    // local replay of the cascade
    val custKeys = graft.model.Tables.customer(spark, sf)
      .select("c_custkey").collect().map(_.getLong(0))
    val delC = custKeys.filter(_ % 97 == 0).toSet
    val orders = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val delO = orders.collect { case (ok, ck) if delC(ck) => ok }.toSet
    val liOrd = graft.model.Tables.lineitem(spark, sf)
      .select("l_orderkey").collect().map(_.getLong(0))
    assert(out("customer") === ((custKeys.length.toLong, delC.size.toLong,
      (custKeys.length - delC.size).toLong, 0L)))
    assert(out("orders") === ((orders.length.toLong, delO.size.toLong,
      (orders.length - delO.size).toLong, 0L)))
    val liDel = liOrd.count(delO).toLong
    assert(out("lineitem") === ((liOrd.length.toLong, liDel,
      liOrd.length - liDel, 0L)))
  }

  test("k-anonymity: classes match a local replay; flags at exactly k and l; mass conserved") {
    import org.apache.spark.sql.functions.col
    val out = Warehouse.qCustKAnonymity(spark, sf).collect()
      .map(r => (r.getAs[Int]("c_nationkey"), r.getAs[String]("c_mktsegment"),
        r.getAs[Long]("bal_band")) ->
        (r.getAs[Long]("n"), r.getAs[Boolean]("is_k_anon"),
          r.getAs[Long]("n_sensitive"), r.getAs[Boolean]("is_l_diverse"))).toMap
    // local replay: per-customer sensitive = min order priority or NONE,
    // classes = exact QI grouping
    val sens = graft.model.Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderpriority")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).min }
    val cust = graft.model.Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        col("c_acctbal")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    val expected = cust
      .groupBy(c => (c._2, c._3, math.floor(c._4 / 2000).toLong))
      .map { case (qi, cs) =>
        val vals = cs.map(c => sens.getOrElse(c._1, "NONE")).distinct.length.toLong
        qi -> (cs.length.toLong, cs.length >= Warehouse.kAnonK,
          vals, vals >= Warehouse.lDivL)
      }
    assert(out === expected)
    // every customer lands in exactly one class
    assert(out.values.map(_._1).sum === cust.length.toLong)
    // flags are thresholds, not accidents of the fixture
    out.values.foreach { case (n, ka, nv, ld) =>
      assert(ka === (n >= Warehouse.kAnonK)); assert(ld === (nv >= Warehouse.lDivL))
      assert(nv <= n, "distinct sensitive values cannot exceed class size")
    }
  }

  test("skyline: exactly the non-dominated offers per nation (brute force)") {
    import org.apache.spark.sql.functions.col
    val out = Warehouse.qLineSkyline(spark, sf).collect()
      .map(r => (r.getAs[String]("nation"), r.getAs[Long]("price_c"),
        r.getAs[Long]("qty"))).toSet
    // same distinct point set the query builds, replayed in exact integers
    val pts = graft.model.Tables.lineitem(spark, sf)
      .join(graft.model.Tables.supplier(spark, sf),
        col("l_suppkey") === col("s_suppkey"))
      .join(graft.model.Tables.nation(spark, sf),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"),
        (col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 4))
          * 100).cast("long"),
        org.apache.spark.sql.functions.floor(col("l_quantity")).cast("long"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // brute-force O(n²) dominance: (≤ price, ≥ qty, one strict)
    val frontier = pts.groupBy(_._1).toSeq.flatMap { case (_, grp) =>
      grp.toSeq.filterNot { p =>
        grp.exists(q => q._2 <= p._2 && q._3 >= p._3 && (q._2 < p._2 || q._3 > p._3))
      }
    }.toSet
    assert(out === frontier)
    assert(out.nonEmpty)
    // frontier is a strict staircase: within a nation, more quantity always
    // costs strictly more (qty strictly rises with price)
    out.groupBy(_._1).foreach { case (_, grp) =>
      val stair = grp.toSeq.sortBy(_._2).map(_._3)
      assert(stair === stair.sorted)
      assert(stair.distinct.length === stair.length)
    }
  }

  test("weighted median: matches a local cumulative-weight scan") {
    import org.apache.spark.sql.functions.col
    val out = Warehouse.qWeightedMedian(spark, sf).collect()
      .map(r => r.getAs[String]("nation") ->
        (r.getAs[Long]("w_median_price_c"), r.getAs[Long]("total_qty"))).toMap
    val pts = graft.model.Tables.lineitem(spark, sf)
      .join(graft.model.Tables.supplier(spark, sf),
        col("l_suppkey") === col("s_suppkey"))
      .join(graft.model.Tables.nation(spark, sf),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"),
        (col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 4))
          * 100).cast("long"),
        org.apache.spark.sql.functions.floor(col("l_quantity")).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byNation = pts.groupBy(_._1)
    assert(out.keySet === byNation.keySet)
    byNation.foreach { case (nat, rows) =>
      val tot = rows.map(_._3).sum
      // lower weighted median: first price where 2·cumw ≥ total
      var cum = 0L
      val med = rows.map(r => (r._2, r._3)).groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (p, ws) => (p, ws.map(_._2).sum) }
        .collectFirst { case (p, w) if { cum += w; 2 * cum >= tot } => p }.get
      assert(out(nat) === ((med, tot)), s"nation $nat")
      // at least half the quantity mass sits at or below the median price
      val below = rows.filter(_._2 <= med).map(_._3).sum
      assert(2 * below >= tot)
    }
  }

  test("benford: digit histogram matches a local count; chi2 shape exact") {
    val out = Warehouse.qBenfordAudit(spark, sf).collect()
      .map(r => r.getAs[Int]("digit") ->
        (r.getAs[Long]("obs"), r.getAs[Double]("expected"),
          r.getAs[Double]("chi2_contrib"))).toMap
    assert(out.keySet === (1 to 9).toSet)
    val cents = graft.model.Tables.lineitem(spark, sf)
      .select((org.apache.spark.sql.functions.col("l_extendedprice")
        .cast(org.apache.spark.sql.types.DecimalType(18, 4)) * 100).cast("long"))
      .collect().map(_.getLong(0))
    val local = cents.groupBy(_.toString.head.asDigit)
      .map { case (d, g) => d -> g.length.toLong }.withDefaultValue(0L)
    val n = cents.length.toLong
    Warehouse.benfordP.foreach { case (d, ps) =>
      val p = ps.toDouble
      val (obs, exp, chi2) = out(d)
      assert(obs === local(d), s"digit $d")
      assert(exp === n.toDouble * p, s"digit $d")
      val dev = obs.toDouble - n.toDouble * p
      assert(chi2 === dev * dev / (n.toDouble * p), s"digit $d")
    }
    // counts conserve
    assert(out.values.map(_._1).sum === n)
  }
}
