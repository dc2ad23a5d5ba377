package graft.queries

import graft.SparkSuite

class AnalyticsSpec extends SparkSuite {

  test("every registered analytics query runs and is non-empty at sf0.001") {
    Analytics.registry.foreach { case (name, (fn, _)) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("ANSI mode is on: long-sum overflow fails loudly, as the scale docs assume") {
    // several overflow backstops (epoch-shuffle coarse moments, winsorized
    // sums) document "ANSI overflows loudly rather than wrapping" — that
    // backstop exists only while Spark 4's ansi default stays on in this
    // harness, so pin it here instead of assuming it
    assert(spark.conf.get("spark.sql.ansi.enabled").toBoolean,
      "spark.sql.ansi.enabled is off — documented overflow backstops are void")
  }

  test("events.value honors the 2-decimal contract the cent grid assumes") {
    // centEvents quantizes via floor(value·100 + 0.5): sub-cent precision
    // would silently shift the percentile/winsor/MAD grids, and the
    // half-toward-+inf rounding differs from half-away-from-zero on
    // negative .xx5 values — both hazards are vacuous ONLY while every
    // value round-trips to integer cents, so that contract must fail
    // loudly here instead of drifting quantiles (r11 advice). Tolerance
    // 1e-6 covers the fp ulp of representing x/100 as a double; a true
    // sub-cent value is ≥ 1e-3 away from the grid.
    import org.apache.spark.sql.functions._
    val offGrid = graft.model.Tables.events(spark, sf)
      .select(abs(col("value") * 100 - round(col("value") * 100)).as("d"))
      .agg(sum(when(col("d") > 1e-6, 1L).otherwise(0L)).as("n_bad"),
        max(col("d")).as("worst"))
      .collect()(0)
    assert(offGrid.getAs[Long]("n_bad") === 0L,
      s"sub-cent event values (worst off-grid distance ${offGrid.get(1)}) " +
        "violate the centEvents 2-decimal contract")
  }

  test("builtin stddev/corr agree with the exact-moment formulation within 1e-9") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    val exact = Analytics.qEventValueStats(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Double]("mean_value"), r.getAs[Double]("stddev_value"),
          r.getAs[Double]("corr_value_k"))).toMap
    val builtin = graft.model.Tables.events(spark, sf)
      .select($"event_type", $"value",
        get_json_object($"props", "$.k").cast("double").as("k"))
      .groupBy($"event_type")
      .agg(avg($"value").as("m"), stddev($"value").as("s"), corr($"value", $"k").as("c"))
      .collect()
    assert(builtin.nonEmpty)
    builtin.foreach { r =>
      val (m, s, c) = exact(r.getString(0))
      assert(math.abs(r.getAs[Double]("m") - m) <= 1e-9 * math.max(1, math.abs(m)))
      assert(math.abs(r.getAs[Double]("s") - s) <= 1e-9 * math.max(1, math.abs(s)))
      assert(math.abs(r.getAs[Double]("c") - c) <= 1e-9 * math.max(1, math.abs(c)))
    }
  }

  test("q1 pricing summary groups all flag/status combinations") {
    val rows = Analytics.q1PricingSummary(spark, sf).collect()
    assert(rows.length === 6) // 3 returnflags x 2 linestatus in the generator
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total === 6000L) // sf0.001 lineitem row count — dedup-free agg covers all
  }

  test("q5 produces one row per nation and decimal revenue is positive") {
    val rows = Analytics.q5NationRevenue(spark, sf).collect()
    assert(rows.length === 25)
    assert(rows.forall(_.getAs[Double]("rev") > 0))
  }

  test("top-k per group emits at most 3 per priority with dense ranks") {
    val rows = Analytics.qTopOrdersPerPriority(spark, sf).collect()
    val byPrio = rows.groupBy(_.getAs[String]("o_orderpriority"))
    assert(byPrio.size === 5)
    byPrio.values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rank_in_priority")).sorted.sameElements(1 to rs.length))
      assert(rs.length <= 3)
    }
  }

  test("running total is monotone per customer") {
    val rows = Analytics.qRunningTotal(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("o_custkey")).values.foreach { rs =>
      val totals = rs.map(_.getAs[Double]("running_spend"))
      assert(totals.sliding(2).forall {
        case Array(a, b) => a <= b
        case _ => true
      })
    }
  }

  test("rollup contains grand total row equal to table size") {
    val rows = Analytics.qOrderRollup(spark, sf).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length === 1)
    assert(grand.head.getAs[Long]("n") === 1500L)
  }

  test("percentile_approx sketch lands near the exact interpolated percentiles") {
    import org.apache.spark.sql.functions._
    val exact = Analytics.qValuePercentiles(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = graft.model.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(
        expr("percentile_approx(value, 0.5, 10000)").as("p50"),
        expr("percentile_approx(value, 0.9, 10000)").as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (t, (e50, e90)) =>
      val (a50, a90) = approx(t)
      // t-digest at accuracy 10000 on ~hundreds of rows per group is
      // within a few percent of the exact interpolated value
      assert(math.abs(a50 - e50) <= math.max(1.0, e50 * 0.05), s"$t p50 $a50 vs $e50")
      assert(math.abs(a90 - e90) <= math.max(1.0, e90 * 0.05), s"$t p90 $a90 vs $e90")
    }
  }

  test("q15: returns exactly the argmax suppliers, decimal-exact") {
    import org.apache.spark.sql.functions._
    val out = Analytics.q15TopSupplier(spark, sf).collect()
    assert(out.nonEmpty)
    val revs = out.map(_.getAs[Double]("total_rev")).distinct
    assert(revs.length === 1, "all returned suppliers must tie at the max")
    // independent recompute: window-max formulation over the same agg
    val li = graft.model.Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(expr("CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))")).as("r"))
      .collect().map(r => r.getAs[Long]("l_suppkey") -> r.getAs[java.math.BigDecimal]("r"))
    val mx = li.map(_._2).max
    val expectKeys = li.filter(_._2 == mx).map(_._1).toSet
    assert(out.map(_.getAs[Long]("s_suppkey")).toSet === expectKeys)
  }

  test("q18: exactly the orders above the quantity threshold, none missing") {
    import org.apache.spark.sql.functions._
    val out = Analytics.q18LargeOrders(spark, sf).collect()
    val perOrder = graft.model.Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("q")).collect()
      .map(r => r.getAs[Long]("l_orderkey") -> r.getAs[Double]("q")).toMap
    val expect = perOrder.filter(_._2 > Analytics.q18MinQty).keySet
    assert(out.map(_.getAs[Long]("o_orderkey")).toSet === expect)
    out.foreach(r => assert(r.getAs[Double]("sum_qty") > Analytics.q18MinQty))
  }

  test("winsorized stats: clip counts bounded by the tail mass, mean inside the band") {
    val out = Analytics.qEventWinsorized(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n")
      // exact interpolated p05/p95: at most ~5% of rows strictly outside
      assert(r.getAs[Long]("n_clip_low") <= n * 5 / 100 + 1)
      assert(r.getAs[Long]("n_clip_high") <= n * 5 / 100 + 1)
      // winsorizing a right-skewed nonneg metric pulls the mean down or
      // holds it; it can never move outside the raw value range
      assert(r.getAs[Double]("winsor_mean") <= r.getAs[Double]("raw_mean") + 1e-9)
      assert(r.getAs[Double]("winsor_mean") > 0.0)
    }
  }

  test("global running total: two-phase prefix equals a local global scan") {
    import org.apache.spark.sql.functions.col
    val out = Analytics.qEventGlobalRunning(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("running_n"), r.getAs[Double]("running_v"))).toMap
    val events = graft.model.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("value")).collect()
      .map { r =>
        val t = r.getAs[java.sql.Timestamp]("ts")
        (r.getAs[Long]("event_id"),
          t.getTime * 1000 + (t.getNanos / 1000) % 1000,
          r.getAs[Double]("value"))
      }.sortBy(e => (e._2, e._1))
    var n = 0L
    var v = BigDecimal(0)
    events.foreach { case (id, _, value) =>
      n += 1
      v += BigDecimal(value).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      val (gotN, gotV) = out(id)
      assert(gotN === n, s"event $id")
      assert(gotV === v.toDouble, s"event $id")
    }
  }

  test("equi-depth histogram: bins hold ~equal mass, ranges tile without overlap") {
    val out = Analytics.qValueEquidepth(spark, sf).collect()
    out.groupBy(_.getAs[String]("event_type")).foreach { case (t, rows) =>
      val total = rows.map(_.getAs[Long]("n")).sum
      rows.foreach { r =>
        // equal-frequency: every bin within ±2 of total/10 (interpolated
        // boundaries split ties deterministically)
        assert(math.abs(r.getAs[Long]("n") - total / 10.0) <= 2.0,
          s"$t bin ${r.getAs[Int]("bin")}: ${r.getAs[Long]("n")} of $total")
      }
      // ranges tile: sorted by bin, each lo > previous hi
      val sorted = rows.sortBy(_.getAs[Int]("bin"))
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(b.getAs[Double]("lo") > a.getAs[Double]("hi"), s"$t overlap")
      }
    }
  }

  test("rankQuantiles kernel: arbitrary levels and den match an exact integer lerp") {
    // the shared kernel's generic path (callers all use den=100): skewed
    // quadratic values with heavy ties, den=1000, off-grid levels
    import spark.implicits._
    val vals = (1 to 400).map(i => ("g" + (i % 3), (i.toLong * i * 2654435761L) % 997L))
    val df = vals.toDF("k", "v")
    val levels = Seq(("q1", 10), ("q2", 333), ("q3", 500), ("q4", 975))
    val out = Analytics.rankQuantiles(df, "k", "v", levels, den = 1000, withN = true)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet === vals.map(_._1).toSet)
    vals.groupBy(_._1).foreach { case (g, xs) =>
      val s = xs.map(_._2).sorted
      val n = s.length
      levels.foreach { case (nm, num) =>
        val t = num.toLong * (n - 1)
        val idx = (t / 1000).toInt
        val r = t % 1000
        val lo = s(idx); val hi = s(math.min(idx + 1, n - 1))
        assert(out(g).getAs[Long](nm + "_b") === lo * 1000 + (hi - lo) * r, s"$g $nm")
      }
      assert(out(g).getAs[Long]("n") === n.toLong)
    }
  }

  test("anomalies: median/MAD and counts match a local exact recompute") {
    // the engine's rank-selection kernel in miniature: interpolated
    // median of an integer grid, exact in input-units × 100
    def interpB(xs: Array[Long]): Long = {
      val s = xs.sorted
      val t = 50L * (s.length - 1)
      val idx = (t / 100).toInt
      val r = t % 100
      s(idx) * 100 + (s(math.min(idx + 1, s.length - 1)) - s(idx)) * r
    }
    val out = Analytics.qEventAnomalies(spark, sf).collect()
    val byType = graft.model.Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1))).toMap
    assert(out.map(_.getAs[String]("event_type")).toSet === byType.keySet)
    out.foreach { r =>
      val vcs = byType(r.getAs[String]("event_type")).map(v => math.floor(v * 100 + 0.5).toLong)
      val medB = interpB(vcs) // value × 10⁴
      val devs = vcs.map(c => math.abs(c * 100 - medB))
      val madB = interpB(devs) // value × 10⁶
      assert(r.getAs[Double]("median") === medB.toDouble / 10000.0)
      assert(r.getAs[Double]("mad") === madB.toDouble / 1000000.0)
      val expect = devs.count(d =>
        madB != 0L && 0.6745 * (d * 100).toDouble / madB.toDouble > Analytics.madZThreshold)
      assert(r.getAs[Long]("n_anomalies") === expect.toLong)
      if (expect > 0) assert(r.getAs[Double]("max_abs_z") > Analytics.madZThreshold)
    }
  }

  test("transitions: counts conserve sequence length, shares sum to 1 per source") {
    val out = Analytics.qEventTransitions(spark, sf).collect()
    assert(out.nonEmpty)
    // total transitions = total events - one per user (last event has no next)
    val events = graft.model.Tables.events(spark, sf)
    val expectTotal = events.count() - events.select("user_id").distinct().count()
    assert(out.map(_.getAs[Long]("n")).sum === expectTotal)
    out.groupBy(_.getAs[String]("event_type")).foreach { case (t, rows) =>
      val s = rows.map(_.getAs[Double]("share")).sum
      assert(math.abs(s - 1.0) < 1e-9, s"shares for $t sum to $s")
    }
    out.foreach(r => assert(r.getAs[Double]("mean_gap_s") >= 0.0))
  }

  test("ohlc: bars match a local replay, open/close at the time extremes") {
    import org.apache.spark.sql.functions.col
    val out = Analytics.qEventOhlc(spark, sf).collect()
    val events = graft.model.Tables.events(spark, sf)
      .select(col("event_type"), col("ts"), col("event_id"), col("value")).collect()
      .map { r =>
        val t = r.getAs[java.sql.Timestamp]("ts")
        val us = t.getTime * 1000 + (t.getNanos / 1000) % 1000
        (r.getAs[String]("event_type"), us / Analytics.ohlcBarUs,
          (us, r.getAs[Long]("event_id")), r.getAs[Double]("value"))
      }
    val byBar = events.groupBy(e => (e._1, e._2))
    assert(out.length === byBar.size)
    out.foreach { r =>
      val t = r.getAs[java.sql.Timestamp]("bar")
      val barIdx = (t.getTime * 1000 + (t.getNanos / 1000) % 1000) / Analytics.ohlcBarUs
      val g = byBar((r.getAs[String]("event_type"), barIdx))
      assert(r.getAs[Long]("n") === g.length.toLong)
      assert(r.getAs[Double]("open") === g.minBy(_._3)._4)
      assert(r.getAs[Double]("close") === g.maxBy(_._3)._4)
      assert(r.getAs[Double]("high") === g.map(_._4).max)
      assert(r.getAs[Double]("low") === g.map(_._4).min)
    }
  }

  test("funnel: step counts match a local per-user ordered replay") {
    import org.apache.spark.sql.functions.col
    val out = Analytics.qEventFunnel(spark, sf).collect()
      .map(r => r.getAs[String]("step") -> r.getAs[Long]("n_users")).toMap
    val events = graft.model.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        { val t = r.getAs[java.sql.Timestamp]("ts")
          t.getTime * 1000 + (t.getNanos / 1000) % 1000 }))
    var n1 = 0L; var n2 = 0L; var n3 = 0L
    events.groupBy(_._1).foreach { case (_, evs) =>
      val t1 = evs.collect { case (_, "signup", t) => t }.minOption
      val t2 = t1.flatMap(a => evs.collect { case (_, "click", t) if t > a => t }.minOption)
      val t3 = t2.flatMap(a => evs.collect { case (_, "purchase", t) if t > a => t }.minOption)
      if (t1.isDefined) n1 += 1
      if (t2.isDefined) n2 += 1
      if (t3.isDefined) n3 += 1
    }
    assert(out("signup") === n1)
    assert(out("click_after_signup") === n2)
    assert(out("purchase_after_click") === n3)
    // funnel is monotone by construction
    assert(n1 >= n2 && n2 >= n3)
  }

  test("hop window: matches a local 4-windows-per-event replay") {
    import org.apache.spark.sql.functions.col
    val out = Analytics.qEventHopWindow(spark, sf).collect()
      .map(r => r.getAs[Long]("window_start") ->
        (r.getAs[Long]("n"), r.getAs[Double]("total"))).toMap
    val events = graft.model.Tables.events(spark, sf)
      .select(col("ts").cast("long").as("es"), col("value")).collect()
      .map(r => (r.getAs[Long]("es"), r.getAs[Double]("value")))
    val local = scala.collection.mutable.Map
      .empty[Long, (Long, java.math.BigDecimal)]
    for ((es, v) <- events; k <- 0 to 3) {
      val ws = (es / 900 - k) * 900
      val dv = java.math.BigDecimal.valueOf(v)
        .setScale(4, java.math.RoundingMode.HALF_UP)
      val (n, t) = local.getOrElse(ws, (0L, java.math.BigDecimal.ZERO))
      local(ws) = (n + 1, t.add(dv))
    }
    assert(out.keySet === local.keySet)
    local.foreach { case (ws, (n, t)) =>
      assert(out(ws)._1 === n, s"count at window $ws")
      assert(out(ws)._2 === t.doubleValue, s"total at window $ws")
    }
    // conservation: each event counted exactly window/slide = 4 times
    assert(out.values.map(_._1).sum === 4L * events.length)
  }

  test("co-occurrence lift matches a local distinct-pair recompute") {
    import org.apache.spark.sql.functions.col
    val out = Analytics.qEventCooccur(spark, sf).collect()
    val ut = graft.model.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type")).distinct().collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
    val nUsers = ut.map(_._1).distinct.length
    val perType = ut.groupBy(_._2).view.mapValues(_.length).toMap
    val byUser: Map[Long, Seq[String]] =
      ut.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    val pairCnt = byUser.values.toSeq.flatMap { ts =>
      for (a <- ts; b <- ts if a < b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size).toMap
    assert(out.length === pairCnt.size)
    out.foreach { r =>
      val key = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      assert(r.getAs[Long]("pair_users") === pairCnt(key).toLong)
      assert(r.getAs[Long]("n_a") === perType(key._1).toLong)
      assert(r.getAs[Long]("n_b") === perType(key._2).toLong)
      val lift = (pairCnt(key).toLong * nUsers).toDouble /
        (perType(key._1).toLong * perType(key._2))
      assert(r.getAs[Double]("lift") === lift)
    }
  }

  test("q7/q8/q10: bilateral pairs, bounded shares, descending returned revenue") {
    val q7 = Analytics.q7NationVolume(spark, sf).collect()
    assert(q7.nonEmpty)
    assert(q7.map(r => (r.getAs[String]("supp_region"), r.getAs[String]("cust_region")))
      .toSet.subsetOf(Set(("AMERICA", "ASIA"), ("ASIA", "AMERICA"))))
    assert(q7.forall(_.getAs[Double]("volume") > 0))

    val q8 = Analytics.q8MarketShare(spark, sf).collect()
    assert(q8.nonEmpty)
    q8.foreach { r =>
      val s = r.getAs[Double]("mkt_share")
      assert(s >= 0.0 && s <= 1.0)
      assert(r.getAs[Double]("total_rev") > 0)
    }

    val q10 = Analytics.q10ReturnedCustomers(spark, sf).collect()
    assert(q10.length <= 20 && q10.nonEmpty)
    val revs = q10.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    assert(revs.forall(_ > 0))
  }

  test("ewma: matches a local sequential fold in event order") {
    import org.apache.spark.sql.functions.col
    val out = Analytics.qEventEwma(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_obs"), r.getAs[Double]("ewma"))).toMap
    val purchases = graft.model.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value")).collect()
      .map { r =>
        val t = r.getAs[java.sql.Timestamp]("ts")
        (r.getAs[Long]("user_id"),
          t.getTime * 1000 + (t.getNanos / 1000) % 1000,
          r.getAs[Long]("event_id"), r.getAs[Double]("value"))
      }
    val local = purchases.groupBy(_._1).view.mapValues { rows =>
      val vs = rows.sortBy(r => (r._2, r._3)).map(_._4)
      (rows.length.toLong, vs.tail.foldLeft(vs.head)((acc, v) => 0.25 * v + 0.75 * acc))
    }.toMap
    assert(out.keySet === local.keySet)
    local.foreach { case (u, (n, e)) =>
      assert(out(u)._1 === n)
      assert(out(u)._2 === e, s"user $u") // bit-exact: same fold, same order
    }
  }

  test("acf: matches a local exact-moment recompute; values bounded") {
    import org.apache.spark.sql.functions.{col, count, datediff, lit, sum, to_date}
    val out = Analytics.qEventAcf(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Int]("lag")) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("acf"))).toMap
    val daily = graft.model.Tables.events(spark, sf)
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("dn"))
      .agg(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("v"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("dn")) ->
        // daily totals in exact BIGINT cents, the engine's representation
        r.getAs[java.math.BigDecimal]("v")
          .multiply(java.math.BigDecimal.valueOf(100)).longValueExact()).toMap
    val types = daily.keySet.map(_._1)
    for (t <- types; l <- 1 to 7) {
      val pairs = daily.collect {
        case ((`t`, dn), x) if daily.contains((t, dn + l)) => (x, daily((t, dn + l)))
      }.toSeq
      val n = pairs.length.toLong
      if (n > 0) {
        def s(f: ((Long, Long)) => Long): Long = pairs.map(f).sum
        val (sx, sy) = (s(_._1), s(_._2))
        val (sxx, syy, sxy) =
          (s(p => p._1 * p._1), s(p => p._2 * p._2), s(p => p._1 * p._2))
        val acf = (n * sxy - sx * sy).toDouble /
          math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
        assert(out((t, l))._1 === n)
        assert(out((t, l))._2 === acf, s"type $t lag $l") // bit-exact: same moments, same shape
        assert(math.abs(acf) <= 1.0 + 1e-9)
      } else assert(!out.contains((t, l)))
    }
  }

  test("rolling actives: each trailing-7d window matches a local distinct replay") {
    import org.apache.spark.sql.functions.{col, datediff, lit, to_date}
    val out = Analytics.qEventRollingActive(spark, sf).collect()
      .map(r => r.getAs[Long]("window_end") ->
        (r.getAs[Long]("active_users"), r.getAs[Long]("n_user_days"))).toMap
    val ud = graft.model.Tables.events(spark, sf)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("dn"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("dn")))
    val (lo, hi) = (ud.map(_._2).min, ud.map(_._2).max)
    assert(out.keySet === (lo to hi).toSet)
    for (e <- lo to hi) {
      val inWin = ud.filter { case (_, d) => d >= e - 6 && d <= e }
      assert(out(e) === ((inWin.map(_._1).distinct.length.toLong, inWin.length.toLong)), s"day $e")
    }
    // windows once fully inside the data range dominate single days
    val daily = ud.groupBy(_._2).view.mapValues(_.map(_._1).distinct.length.toLong).toMap
    for (e <- (lo + 6) to hi) assert(out(e)._1 >= daily(e))
  }

  test("segments: venn counts match a local mask replay and conserve users") {
    import org.apache.spark.sql.functions.col
    val out = Analytics.qEventSegments(spark, sf).collect()
      .map(r => r.getAs[Long]("mask") ->
        (r.getAs[Int]("n_types"), r.getAs[Long]("n_users"))).toMap
    val raw = graft.model.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
    val idx = raw.map(_._2).distinct.sorted.zipWithIndex.toMap
    val masks = raw.groupBy(_._1).view
      .mapValues(_.map(e => 1L << idx(e._2)).reduce(_ | _)).toMap
    val venn = masks.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(out.keySet === venn.keySet)
    venn.foreach { case (m, n) =>
      assert(out(m)._2 === n)
      assert(out(m)._1 === java.lang.Long.bitCount(m))
    }
    assert(out.values.map(_._2).sum === masks.size.toLong) // every user in exactly one cell
  }

  test("peak concurrency: per-day max matches a brute-force live count") {
    import org.apache.spark.sql.functions.col
    val out = Analytics.qEventPeakConcurrency(spark, sf).collect()
      .map(r => r.getAs[java.sql.Date]("d").toLocalDate.toEpochDay ->
        (r.getAs[Long]("peak_concurrency"), r.getAs[Long]("n_open"))).toMap
    // independent replay from the DEFINITION, not the sweep: interval
    // [s, s+1800); live(t) = #{i: s_i <= t < e_i}; a day's peak is
    // attained at an in-day open or at midnight (level only rises there)
    val iv = graft.model.Tables.events(spark, sf).select(col("ts")).collect()
      .map { r =>
        val s = Math.floorDiv(r.getAs[java.sql.Timestamp]("ts").getTime, 1000L)
        (s, s + 1800L)
      }
    def live(t: Long): Long = iv.count { case (s, e) => s <= t && t < e }.toLong
    val expected = iv.flatMap { case (s, e) =>
      val ds = Math.floorDiv(s, 86400L); val dc = Math.floorDiv(e - 1, 86400L)
      if (dc > ds) Seq(ds, dc) else Seq(ds)
    }.distinct.sorted.map { d =>
      val starts = iv.map(_._1).filter(t => Math.floorDiv(t, 86400L) == d)
      val candidates = (d * 86400L) +: starts
      val opens = iv.count { case (s, e) =>
        Math.floorDiv(s, 86400L) == d ||
          (Math.floorDiv(e - 1, 86400L) == d && Math.floorDiv(s, 86400L) < d)
      }.toLong
      d -> (candidates.map(live).max, opens)
    }.toMap
    assert(out === expected)
    assert(out.nonEmpty && out.values.forall { case (p, o) => p >= 1 && p <= o })
  }

  test("coverage: per-day union length matches a local interval-merge replay") {
    import org.apache.spark.sql.functions.col
    val out = Analytics.qEventCoverage(spark, sf).collect()
      .map(r => r.getAs[java.sql.Date]("d").toLocalDate.toEpochDay ->
        (r.getAs[Long]("covered_sec"), r.getAs[Double]("busy_ratio"))).toMap
    // independent replay: clip intervals to the day, sort, MERGE overlaps,
    // sum merged lengths — interval merging, not a sweep
    val iv = graft.model.Tables.events(spark, sf).select(col("ts")).collect()
      .map { r =>
        val s = Math.floorDiv(r.getAs[java.sql.Timestamp]("ts").getTime, 1000L)
        (s, s + 1800L)
      }
    val expected = iv.flatMap { case (s, e) =>
      val ds = Math.floorDiv(s, 86400L); val dc = Math.floorDiv(e - 1, 86400L)
      if (dc > ds) Seq(ds, dc) else Seq(ds)
    }.distinct.sorted.map { d =>
      val lo = d * 86400L; val hi = lo + 86400L
      val clipped = iv.map { case (s, e) => (math.max(s, lo), math.min(e, hi)) }
        .filter { case (s, e) => s < e }.sorted
      var covered = 0L; var curS = -1L; var curE = -1L
      clipped.foreach { case (s, e) =>
        if (curE < 0 || s > curE) { if (curE >= 0) covered += curE - curS; curS = s; curE = e }
        else curE = math.max(curE, e)
      }
      if (curE >= 0) covered += curE - curS
      d -> covered
    }.toMap
    assert(out.keySet === expected.keySet)
    expected.foreach { case (d, cov) =>
      assert(out(d)._1 === cov, s"day $d")
      assert(out(d)._1 <= 86400L)
      assert(out(d)._2 === cov.toDouble / 86400.0)
    }
  }

  test("chisq: cells match a local contingency replay; margins consistent") {
    import org.apache.spark.sql.functions.col
    val out = Analytics.qEventTypeDowChisq(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Int]("isodow")) ->
        (r.getAs[Long]("o"), r.getAs[Double]("expected"), r.getAs[Double]("chi2_contrib")))
      .toMap
    val raw = graft.model.Tables.events(spark, sf)
      .select(col("event_type"), col("ts")).collect()
      .map { r =>
        // TZ-free ISO weekday from epoch days (1970-01-01 = Thursday = 4)
        val dn = Math.floorDiv(r.getAs[java.sql.Timestamp]("ts").getTime, 86400000L)
        (r.getAs[String]("event_type"), (Math.floorMod(dn + 3, 7) + 1).toInt)
      }
    val local = raw.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(out.keySet === local.keySet)
    val n = raw.length.toDouble
    val rowT = raw.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val colT = raw.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    local.foreach { case (k @ (t, d), o) =>
      val e = rowT(t).toDouble * colT(d).toDouble / n
      assert(out(k)._1 === o)
      assert(math.abs(out(k)._2 - e) < 1e-9 * e, s"cell $k")
      val contrib = (o.toDouble - out(k)._2) * (o.toDouble - out(k)._2) / out(k)._2
      assert(out(k)._3 === contrib, s"cell $k")
    }
    // margins: expected counts sum back to N, observed conserve the corpus
    assert(out.values.map(_._1).sum === raw.length.toLong)
    assert(math.abs(out.values.map(_._2).sum - n) < 1e-6 * n)
  }

  test("journeys: top-20 trigram paths match a local ordered replay") {
    import org.apache.spark.sql.functions.col
    val out = Analytics.qEventJourneys(spark, sf).collect()
      .map(r => ((r.getAs[String]("s1"), r.getAs[String]("s2"), r.getAs[String]("s3")),
        r.getAs[Long]("n"), r.getAs[Double]("share")))
    val events = graft.model.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id")).collect()
      .map { r =>
        val t = r.getAs[java.sql.Timestamp]("ts")
        (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
          t.getTime * 1000 + (t.getNanos / 1000) % 1000, r.getAs[Long]("event_id"))
      }
    val paths = events.groupBy(_._1).values.flatMap { rows =>
      val seq = rows.sortBy(r => (r._3, r._4)).map(_._2).toSeq
      seq.sliding(3).filter(_.length == 3).map(s => (s(0), s(1), s(2)))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = paths.values.sum
    val top = paths.toSeq.sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(20)
    assert(out.map(t => (t._1, t._2)).toSeq === top.map { case (k, n) => (k, n) })
    out.foreach { case (k, n, share) => assert(share === n.toDouble / total, k) }
  }

  test("trend: matches a local exact-integer-moment OLS; r2 in [0,1]") {
    import org.apache.spark.sql.functions.{col, datediff, lit, sum, to_date}
    val out = Analytics.qEventTrend(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_days"), r.getAs[Double]("slope_cents"),
          r.getAs[Double]("intercept_cents"), r.getAs[Double]("r2"))).toMap
    val daily = graft.model.Tables.events(spark, sf)
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("dn"))
      .agg(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("v"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("dn"),
        r.getAs[java.math.BigDecimal]("v")))
    val mn = daily.map(_._2).min
    val byType = daily.groupBy(_._1)
    assert(out.keySet === byType.keySet)
    byType.foreach { case (t, rows) =>
      // same integer moments the query builds: x centered, y floored cents
      val pts = rows.map { case (_, dn, v) =>
        (dn - mn,
          v.multiply(new java.math.BigDecimal(100))
            .setScale(0, java.math.RoundingMode.FLOOR).longValueExact())
      }
      val n = pts.length.toLong
      val sx = pts.map(_._1).sum; val sxx = pts.map(p => p._1 * p._1).sum
      val sy = pts.map(_._2).sum; val sxy = pts.map(p => p._1 * p._2).sum
      val syy = pts.map(p => p._2 * p._2).sum
      val det = (n * sxx - sx * sx).toDouble
      val num = (n * sxy - sx * sy).toDouble
      val (nd, slope, icept, r2) = out(t)
      assert(nd === n)
      assert(slope === num / det, s"type $t") // bit-exact: same moments, same shape
      assert(icept === (sy * sxx - sx * sxy).toDouble / det, s"type $t")
      assert(r2 === num * num / (det * (n * syy - sy * sy).toDouble), s"type $t")
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-12)
    }
  }

  test("seasonality: residual means match a local replay; weighted residuals sum to ~0") {
    import org.apache.spark.sql.functions.{col, datediff, lit, sum, to_date}
    val out = Analytics.qEventSeasonality(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Int]("dow")) ->
        (r.getAs[Long]("n_days"), r.getAs[Double]("mean_y_cents"),
          r.getAs[Double]("mean_resid_cents"))).toMap
    val daily = graft.model.Tables.events(spark, sf)
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("dn"))
      .agg(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("v"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("dn"),
        r.getAs[java.math.BigDecimal]("v")
          .multiply(new java.math.BigDecimal(100))
          .setScale(0, java.math.RoundingMode.FLOOR).longValueExact()))
    val mn = daily.map(_._2).min
    daily.groupBy(_._1).foreach { case (t, rows) =>
      val pts = rows.map { case (_, dn, y) => (dn, dn - mn, y) }
      val n = pts.length.toLong
      val sx = pts.map(_._2).sum; val sxx = pts.map(p => p._2 * p._2).sum
      val sy = pts.map(_._3).sum; val sxy = pts.map(p => p._2 * p._3).sum
      val det = (n * sxx - sx * sx).toDouble
      val slope = (n * sxy - sx * sy).toDouble / det
      val icept = (sy * sxx - sx * sxy).toDouble / det
      pts.groupBy(p => ((p._1 + 4) % 7).toInt).foreach { case (dow, cell) =>
        val nd = cell.length.toLong
        val (on, omy, omr) = out((t, dow))
        assert(on === nd)
        assert(omy === cell.map(_._3).sum.toDouble / nd, s"$t dow $dow")
        assert(omr === cell.map(_._3).sum.toDouble / nd - icept
          - slope * (cell.map(_._2).sum.toDouble / nd), s"$t dow $dow")
      }
      // OLS residuals sum to ~0 over the full series → the day-weighted
      // seasonal means must too (up to double rounding)
      val weighted = (0 to 6).flatMap(d => out.get((t, d)))
        .map { case (nd, _, mr) => nd.toDouble * mr }.sum
      assert(math.abs(weighted) < 1e-4, s"type $t")
    }
  }

  test("multi-touch attribution: matches a local replay of all three models") {
    import org.apache.spark.sql.functions.col
    val out = Analytics.qEventAttribMultiTouch(spark, sf).collect()
      .map(r => r.getAs[String]("channel") ->
        (r.getAs[Long]("n_touches"), r.getAs[Long]("n_first"),
          r.getAs[Long]("n_last"), r.getAs[Long]("linear_ppm"))).toMap
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts")).collect()
      .map { r =>
        val t = r.getAs[java.sql.Timestamp]("ts")
        (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
          r.getAs[String]("event_type"),
          t.getTime * 1000 + (t.getNanos / 1000) % 1000)
      }
    val touches = ev.filter(e => Set("view", "click", "signup")(e._3))
      .groupBy(_._1).withDefaultValue(Array.empty[(Long, Long, String, Long)])
    val local = scala.collection.mutable.Map[String, (Long, Long, Long, Long)]()
      .withDefaultValue((0L, 0L, 0L, 0L))
    ev.filter(_._3 == "purchase").foreach { case (u, _, _, ptu) =>
      val w = touches(u)
        .filter(t => t._4 < ptu && t._4 >= ptu - Analytics.attribWindowUs)
        .sortBy(t => (t._4, t._2))
      if (w.nonEmpty) {
        val k = w.length
        val ppm = 1000000L / k
        w.groupBy(_._3).foreach { case (ch, ts) =>
          val (nt, nf, nl, lp) = local(ch)
          local(ch) = (nt + ts.length, nf, nl, lp + ts.length * ppm)
        }
        val (ntf, nff, nlf, lpf) = local(w.head._3)
        local(w.head._3) = (ntf, nff + 1, nlf, lpf)
        val (ntl, nfl, nll, lpl) = local(w.last._3)
        local(w.last._3) = (ntl, nfl, nll + 1, lpl)
      }
    }
    assert(out.keySet === local.keySet)
    local.foreach { case (ch, v) => assert(out(ch) === v, s"channel $ch") }
    // linear credit never exceeds 1e6 per attributed purchase in total
    assert(out.values.map(_._4).sum <= 1000000L * out.values.map(_._2).sum)
  }

  test("cohort retention: offset-0 cells cover each cohort fully") {
    val out = Analytics.qEventCohortRetention(spark, sf).collect()
    assert(out.nonEmpty)
    out.filter(_.getAs[Int]("week_offset") === 0).foreach { r =>
      // every cohort member is active in its own first week by definition
      assert(r.getAs[Long]("n_active") === r.getAs[Long]("n_cohort"))
      assert(r.getAs[Double]("retention") === 1.0)
    }
    out.foreach { r =>
      assert(r.getAs[Int]("week_offset") >= 0)
      assert(r.getAs[Long]("n_active") <= r.getAs[Long]("n_cohort"))
    }
    // total users across cohorts = distinct users in the stream
    val users = graft.model.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    val cohortTotal = out.filter(_.getAs[Int]("week_offset") === 0)
      .map(_.getAs[Long]("n_cohort")).sum
    assert(cohortTotal === users)
  }

  test("user balance: closed form matches the sequential clamped fold") {
    val out = Analytics.qUserBalance(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("final_balance_c"),
          r.getAs[Long]("peak_balance_c"), r.getAs[Long]("forfeited_c"))).toMap
    val ev = graft.model.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type", "value").collect()
      .map { r =>
        val t = r.getAs[java.sql.Timestamp]("ts")
        (r.getAs[Long]("user_id"),
          t.getTime * 1000 + (t.getNanos / 1000) % 1000,
          r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
          r.getAs[Double]("value"))
      }
    val byUser = ev.groupBy(_._1)
    assert(out.keySet === byUser.keySet)
    byUser.foreach { case (u, rows) =>
      // the RECURSIVE definition the closed form must reproduce
      var b = 0L; var peak = 0L; var forfeited = 0L
      rows.sortBy(r => (r._2, r._3)).foreach { r =>
        val delta = if (r._4 == "purchase") math.floor(r._5 * 100).toLong else -25L
        val raw = b + delta
        if (raw < 0) { forfeited += -raw; b = 0L } else b = raw
        peak = math.max(peak, b)
      }
      assert(out(u) === ((rows.length.toLong, b, peak, forfeited)), s"user $u")
    }
    // clamp never manufactures money: final + all fees paid ≤ total credits
    out.values.foreach { case (_, fin, peak, forf) =>
      assert(fin >= 0L && peak >= fin && forf >= 0L)
    }
  }

  test("changepoint: argmax and stat match a brute-force CUSUM replay") {
    import org.apache.spark.sql.functions.{col, datediff, lit, sum, to_date}
    val out = Analytics.qEventChangepoint(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("total_c"),
          r.getAs[java.sql.Date]("change_day").toLocalDate.toEpochDay,
          r.getAs[Long]("d_stat"), r.getAs[Double]("cusum_ratio"))).toMap
    val daily = graft.model.Tables.events(spark, sf)
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("dn"))
      .agg(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("v"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("dn"),
        r.getAs[java.math.BigDecimal]("v")
          .multiply(new java.math.BigDecimal(100))
          .setScale(0, java.math.RoundingMode.FLOOR).longValueExact()))
    val byType = daily.groupBy(_._1)
    assert(out.keySet === byType.keySet)
    byType.foreach { case (t, rows) =>
      val ys = rows.sortBy(_._2).map(r => (r._2, r._3))
      val n = ys.length.toLong
      val tot = ys.map(_._2).sum
      var sk = 0L; var best = -1L; var bestDn = Long.MaxValue
      ys.zipWithIndex.foreach { case ((dn, y), i) =>
        sk += y
        val d = math.abs(n * sk - (i + 1).toLong * tot)
        if (d > best) { best = d; bestDn = dn } // earliest day wins ties
      }
      val (nd, totQ, cpDn, dStat, ratio) = out(t)
      assert(nd === n, s"type $t")
      assert(totQ === tot, s"type $t")
      assert(dStat === best, s"type $t")
      assert(cpDn === bestDn, s"type $t")
      assert(ratio === best.toDouble / (n.toDouble * tot.toDouble), s"type $t")
      assert(ratio >= 0.0 && ratio < 1.0)
    }
  }

  test("streaks: islands match a local consecutive-day replay") {
    import org.apache.spark.sql.functions.{col, datediff, lit, to_date}
    val out = Analytics.qUserStreaks(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_active_days"), r.getAs[Long]("n_streaks"),
          r.getAs[Long]("longest_streak"),
          r.getAs[java.sql.Date]("longest_start").toLocalDate.toEpochDay)).toMap
    val days = graft.model.Tables.events(spark, sf)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("dn"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("dn")))
    val byUser = days.groupBy(_._1)
    assert(out.keySet === byUser.keySet)
    byUser.foreach { case (u, rows) =>
      val ds = rows.map(_._2).sorted
      // local island split: break where the day step exceeds 1
      val islands = ds.foldLeft(List.empty[List[Long]]) {
        case (acc, d) if acc.nonEmpty && d == acc.head.head + 1 =>
          (d :: acc.head) :: acc.tail
        case (acc, d) => List(d) :: acc
      }.map(_.reverse).reverse
      val longest = islands.map(_.length).max.toLong
      // earliest start among the longest islands
      val start = islands.filter(_.length.toLong == longest).map(_.head).min
      assert(out(u) === ((ds.length.toLong, islands.length.toLong, longest, start)),
        s"user $u")
    }
  }

  test("debounce: packed fold matches a sequential cooldown replay") {
    val out = Analytics.qEventDebounce(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n_total"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("last_kept_sec"))).toMap
    val ev = graft.model.Tables.events(spark, sf)
      .select("user_id", "event_type", "ts", "event_id").collect()
      .map { r =>
        val t = r.getAs[java.sql.Timestamp]("ts")
        val us = t.getTime * 1000 + (t.getNanos / 1000) % 1000
        (r.getAs[Long]("user_id"), r.getAs[String]("event_type"), us,
          r.getAs[Long]("event_id"))
      }
    val byKey = ev.groupBy(e => (e._1, e._2))
    assert(out.keySet === byKey.keySet)
    byKey.foreach { case (k, rows) =>
      // the throttle rule, replayed naively: keep iff ≥ gap since last KEPT
      var lastKept = Long.MinValue; var kept = 0L
      rows.sortBy(r => (r._3, r._4)).foreach { r =>
        val sec = Math.floorDiv(r._3, 1000000L)
        if (lastKept == Long.MinValue || sec - lastKept >= Analytics.debounceGapSec) {
          lastKept = sec; kept += 1
        }
      }
      assert(out(k) === ((rows.length.toLong, kept, lastKept)), s"key $k")
      // throttle invariant: kept ≥ 1 and never more than total
      assert(kept >= 1L && kept <= rows.length.toLong)
    }
  }

  test("type cosine: integer moments match a local replay; cosine in (0,1]") {
    val out = Analytics.qTypeCosine(spark, sf).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        (r.getAs[Long]("dot"), r.getAs[Long]("n_users_both"),
          r.getAs[Double]("cosine"))).toMap
    val prof = graft.model.Tables.events(spark, sf)
      .groupBy(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_type"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("n")))
    val byUser = prof.groupBy(_._1)
    val types = prof.map(_._2).distinct.sorted
    val norms = prof.groupBy(_._2).map { case (t, rs) =>
      t -> rs.map(r => r._3 * r._3).sum }
    val localPairs = for {
      a <- types; b <- types if a < b
      dots = byUser.valuesIterator.map { rs =>
        val m = rs.map(r => r._2 -> r._3).toMap
        (m.get(a), m.get(b)) match {
          case (Some(x), Some(y)) => (x * y, 1L)
          case _ => (0L, 0L)
        }
      }.toSeq
      if dots.map(_._2).sum > 0
    } yield (a, b) -> (dots.map(_._1).sum, dots.map(_._2).sum)
    val local = localPairs.toMap
    assert(out.keySet === local.keySet)
    local.foreach { case (k, (dot, both)) =>
      val (dq, bq, cos) = out(k)
      assert(dq === dot, s"pair $k")
      assert(bq === both, s"pair $k")
      assert(cos === dot.toDouble /
        math.sqrt(norms(k._1).toDouble * norms(k._2).toDouble), s"pair $k")
      assert(cos > 0.0 && cos <= 1.0 + 1e-12)
    }
  }

  test("theil-sen: lower median of pairwise slopes, exact rank replay") {
    import org.apache.spark.sql.functions.{col, datediff, lit, sum, to_date}
    val out = Analytics.qEventTheilSen(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("theil_sen_slope_cents"))).toMap
    val daily = graft.model.Tables.events(spark, sf)
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("dn"))
      .agg(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("v"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("dn"),
        r.getAs[java.math.BigDecimal]("v")
          .multiply(new java.math.BigDecimal(100))
          .setScale(0, java.math.RoundingMode.FLOOR).longValueExact()))
    val byType = daily.groupBy(_._1)
    assert(out.keySet === byType.keySet)
    byType.foreach { case (t, rows) =>
      val pts = rows.map(r => (r._2, r._3)).sortBy(_._1)
      val slopes = for {
        i <- pts.indices; j <- pts.indices if pts(i)._1 < pts(j)._1
      } yield ((pts(j)._2 - pts(i)._2).toDouble / (pts(j)._1 - pts(i)._1).toDouble,
        pts(i)._1, pts(j)._1)
      val sorted = slopes.sortBy(s => (s._1, s._2, s._3))
      val m = sorted.length.toLong
      val med = sorted(((m + 1) / 2 - 1).toInt)._1
      val (mq, slope) = out(t)
      assert(mq === m, s"type $t")
      assert(slope === med, s"type $t")
      // robustness sanity: the median sits inside the slope envelope
      assert(slope >= sorted.head._1 && slope <= sorted.last._1)
    }
  }
}
