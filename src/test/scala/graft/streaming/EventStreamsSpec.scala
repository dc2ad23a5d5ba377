package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSuite
import graft.streaming.EventStreams.{SessionOut, StreamEvent}

/** Watermark/window/stateful-session semantics, driven batch-by-batch
  * through MemoryStream so watermark progression is deterministic:
  * processAllAvailable after each addData gives one micro-batch whose
  * events advance the watermark for the NEXT batch.
  */
class EventStreamsSpec extends SparkSuite {

  // hour-aligned base so tumbling-window starts land exactly on ts(whole)
  private val baseMs = 1700000000000L / 3600000L * 3600000L

  private def ts(hours: Double): Timestamp =
    new Timestamp((hours * 3600 * 1000).toLong + baseMs)

  test("watermarked hourly window finalizes only when watermark passes window end") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark0.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val stats = EventStreams.hourlyStats(
      input.toDF().toDF("ts", "event_type", "value"))
    val query = stats.writeStream
      .format("memory").queryName("hourly_sink")
      .outputMode(OutputMode.Append)
      .start()
    try {
      // batch 1: two events in hour 0, one in hour 1 → watermark still at 0
      input.addData((ts(0.2), "click", 1.0), (ts(0.4), "click", 2.0), (ts(1.5), "view", 5.0))
      query.processAllAvailable()
      assert(spark.table("hourly_sink").count() == 0) // nothing finalized yet
      // batch 2: event at hour 4 → watermark = 4h - 1h = 3h > hour-0 and
      // hour-1 window ends → both finalize
      input.addData((ts(4.0), "view", 1.0))
      query.processAllAvailable()
      val rows = spark.table("hourly_sink")
        .select("hour", "event_type", "n", "total_value").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(rows == Set((ts(0.0), "click", 2L, 3.0), (ts(1.0), "view", 1L, 5.0)))
    } finally query.stop()
  }

  test("hop windows: every event lands in exactly window/slide = 4 finalized frames") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark0.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val stats = EventStreams.hopStats(
      input.toDF().toDF("ts", "event_type", "value"))
    val query = stats.writeStream
      .format("memory").queryName("hop_sink")
      .outputMode(OutputMode.Append)
      .start()
    try {
      // clicks at +12 min and +24 min: window-start sets {0,-15,-30,-45}
      // and {+15,0,-15,-30} minutes — 5 distinct frames, 3 shared
      input.addData((ts(0.2), "click", 1.0), (ts(0.4), "click", 2.0))
      query.processAllAvailable()
      // far-future event pushes the watermark past every click frame
      input.addData((ts(5.0), "view", 1.0))
      query.processAllAvailable()
      val rows = spark.table("hop_sink")
        .filter(col("event_type") === "click")
        .select("window_start", "n", "total_value").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getDouble(2)))
      def m(min: Double) = ts(min / 60).getTime
      assert(rows.toSet === Set(
        (m(-45), 1L, 1.0), (m(-30), 2L, 3.0), (m(-15), 2L, 3.0),
        (m(0), 2L, 3.0), (m(15), 1L, 2.0)))
      // conservation: each of the 2 events counted exactly 4 times
      assert(rows.map(_._2).sum === 8L)
    } finally query.stop()
  }

  test("streaming heavy hitters: MG guarantees hold per finalized window across micro-batches") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark0.sqlContext
    val k = 4
    val input = MemoryStream[(Timestamp, String)]
    val hh = EventStreams.windowHeavyHitters(
      input.toDF().toDF("ts", "token"), k)
    val query = hh.writeStream
      .format("memory").queryName("hh_sink")
      .outputMode(OutputMode.Append)
      .start()
    def w0(tok: String, n: Int) = Seq.fill(n)((ts(0.3), tok))
    def w1(tok: String, n: Int) = Seq.fill(n)((ts(1.4), tok))
    val window0 = w0("a", 10) ++ w0("b", 5) ++ w0("c", 1) ++ w0("d", 1) ++ w0("e", 1)
    val window1 = w1("x", 7) ++ w1("y", 2) ++ w1("z", 1)
    try {
      // window 0 split across TWO micro-batches: the state store must
      // MERGE partial MG buffers, not just accumulate within one batch
      input.addData(window0.take(7): _*)
      query.processAllAvailable()
      input.addData(window0.drop(7) ++ window1: _*)
      query.processAllAvailable()
      assert(spark.table("hh_sink").count() == 0) // watermark below both ends
      input.addData((ts(5.0), "late_driver"))
      query.processAllAvailable()
      val rows = spark.table("hh_sink").collect()
        .map(r => r.getTimestamp(0) ->
          (r.getAs[Map[String, Long]]("candidates"), r.getAs[Long]("n"))).toMap
      assert(rows.keySet === Set(ts(0.0), ts(1.0)))
      val exact = Map(
        ts(0.0) -> Map("a" -> 10L, "b" -> 5L, "c" -> 1L, "d" -> 1L, "e" -> 1L),
        ts(1.0) -> Map("x" -> 7L, "y" -> 2L, "z" -> 1L))
      exact.foreach { case (w, truth) =>
        val (cand, n) = rows(w)
        val total = truth.values.sum
        assert(n === total)
        val bound = total.toDouble / k
        // no false negatives among true heavy hitters
        truth.filter(_._2 > bound).keys.foreach(t => assert(cand.contains(t), s"$w $t"))
        // estimates undershoot by at most N/k, never overshoot
        cand.foreach { case (t, est) =>
          val tru = truth.getOrElse(t, 0L)
          assert(est <= tru && tru - est <= bound, s"$w $t est=$est true=$tru")
        }
        assert(cand.size <= k - 1)
      }
    } finally query.stop()
  }

  test("stream-static enrichment joins each micro-batch against the dim, unmatched stays null") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark0.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "segment")
    val input = MemoryStream[(Long, Double)]
    val enriched = EventStreams.enrichWithDim(
      input.toDF().toDF("user_id", "value"), dim)
    val query = enriched.writeStream
      .format("memory").queryName("enrich_sink")
      .outputMode(OutputMode.Append)
      .start()
    try {
      input.addData((1L, 10.0), (3L, 7.0))
      query.processAllAvailable()
      input.addData((2L, 5.0))
      query.processAllAvailable()
      val rows = spark.table("enrich_sink")
        .select("user_id", "value", "segment").collect()
        .map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2)))).toSet
      assert(rows === Set(
        (1L, 10.0, Some("gold")),
        (3L, 7.0, None), // no dim row → left-join null, row NOT dropped
        (2L, 5.0, Some("silver"))))
    } finally query.stop()
  }

  test("flatMapGroupsWithState sessionization closes by new session and by timeout") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark0.sqlContext
    val gapMs = 12L * 3600 * 1000
    val input = MemoryStream[StreamEvent]
    val sessions = EventStreams.sessionize(
      input.toDS().withWatermark("ts", "1 hour").as[StreamEvent], gapMs)
    val query = sessions.writeStream
      .format("memory").queryName("session_sink")
      .outputMode(OutputMode.Append)
      .start()
    try {
      // user 1: two events 1h apart (one session); user 2: one event
      input.addData(
        StreamEvent(1L, ts(0.0), 1.0), StreamEvent(1L, ts(1.0), 2.0),
        StreamEvent(2L, ts(0.5), 7.0))
      query.processAllAvailable()
      assert(spark.table("session_sink").count() == 0) // all sessions still open
      // user 1 reappears 30h later: in ONE batch the new event both closes
      // session 1 via the gap rule and opens session 2; user 2 stays open
      // until the watermark (30h - 1h) passes 0.5h + 12h → timeout fires.
      input.addData(StreamEvent(1L, ts(31.0), 4.0))
      query.processAllAvailable()
      // one more batch so the timeout (evaluated against the new watermark)
      // has a chance to fire for user 2
      input.addData(StreamEvent(3L, ts(32.0), 0.0))
      query.processAllAvailable()
      val rows = spark.table("session_sink").as[SessionOut].collect()
        .map(s => (s.user_id, s.session_start, s.session_end, s.n_events, s.total_value)).toSet
      assert(rows == Set(
        (1L, ts(0.0), new Timestamp(ts(1.0).getTime + gapMs), 2L, 3.0),
        (2L, ts(0.5), new Timestamp(ts(0.5).getTime + gapMs), 1L, 7.0)))
    } finally query.stop()
  }

  test("transformWithState sessionization matches the legacy operator batch-for-batch") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark0.sqlContext
    // transformWithState requires the RocksDB state store provider;
    // scope it to this test's queries and restore the default after
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val gapMs = 12L * 3600 * 1000
    val input = MemoryStream[StreamEvent]
    val sessions = EventStreams.sessionizeTws(
      input.toDS().withWatermark("ts", "1 hour").as[StreamEvent], gapMs)
    val query = sessions.writeStream
      .format("memory").queryName("session_tws_sink")
      .outputMode(OutputMode.Append)
      .start()
    try {
      // the exact feed of the flatMapGroupsWithState test: same sessions
      // must seal at the same watermarks (gap close + timer close, with
      // an out-of-order second batch exercising the merge path)
      input.addData(
        StreamEvent(1L, ts(0.0), 1.0), StreamEvent(1L, ts(1.0), 2.0),
        StreamEvent(2L, ts(0.5), 7.0))
      query.processAllAvailable()
      assert(spark.table("session_tws_sink").count() == 0) // all still open
      input.addData(StreamEvent(1L, ts(31.0), 4.0))
      query.processAllAvailable()
      input.addData(StreamEvent(3L, ts(32.0), 0.0))
      query.processAllAvailable()
      val rows = spark.table("session_tws_sink").as[SessionOut].collect()
        .map(s => (s.user_id, s.session_start, s.session_end, s.n_events, s.total_value)).toSet
      assert(rows == Set(
        (1L, ts(0.0), new Timestamp(ts(1.0).getTime + gapMs), 2L, 3.0),
        (2L, ts(0.5), new Timestamp(ts(0.5).getTime + gapMs), 1L, 7.0)))
    } finally {
      query.stop()
      prevProv match {
        case Some(p) => spark.conf.set(provKey, p)
        case None    => spark.conf.unset(provKey)
      }
    }
  }

  test("dropDuplicatesWithinWatermark dedups inside the horizon, re-emits after eviction") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark0.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val deduped = EventStreams.dedupWithinWatermark(
      input.toDF().toDF("ts", "content_key"), "1 hour", "content_key")
    val query = deduped.writeStream
      .format("memory").queryName("dedup_sink")
      .outputMode(OutputMode.Append)
      .start()
    try {
      // in-batch duplicate → one emission
      input.addData((ts(1.0), "A"), (ts(1.0), "A"))
      query.processAllAvailable()
      // cross-batch duplicate within the horizon → dropped; B advances the
      // watermark to 9h, evicting A's state (1h + 1h delay < 9h)
      input.addData((ts(1.5), "A"), (ts(10.0), "B"))
      query.processAllAvailable()
      // A returns AFTER eviction → re-emitted (bounded-state semantics);
      // B within horizon → dropped
      input.addData((ts(11.0), "A"), (ts(10.5), "B"))
      query.processAllAvailable()
      val rows = spark.table("dedup_sink").collect()
        .map(r => (r.getTimestamp(0), r.getString(1))).toSet
      assert(rows == Set((ts(1.0), "A"), (ts(10.0), "B"), (ts(11.0), "A")))
    } finally query.stop()
  }

  test("stream-stream interval join matches within lookback only, in both directions") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark0.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long)]
    val joined = EventStreams.attributionJoin(
      clicks.toDF().toDF("user_id", "ts", "event_id"),
      purchases.toDF().toDF("user_id", "ts", "event_id"),
      delay = "1 hour", lookback = "2 hours")
    val query = joined.writeStream
      .format("memory").queryName("attr_sink")
      .outputMode(OutputMode.Append)
      .start()
    try {
      // u1: two clicks inside the 2h lookback of p200 → both match;
      //     p201 at 4h is > 2h past both clicks → no match.
      // u2: click AFTER the purchase → no match.
      clicks.addData((1L, ts(1.0), 100L), (1L, ts(1.4), 101L), (2L, ts(2.0), 300L))
      purchases.addData((1L, ts(1.5), 200L), (1L, ts(4.0), 201L), (2L, ts(1.0), 301L))
      query.processAllAvailable()
      val rows = spark.table("attr_sink").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      assert(rows == Set((1L, 200L, 100L), (1L, 200L, 101L)))
    } finally query.stop()
  }

  test("left-outer stream-stream join emits unconverted purchases exactly once, after the watermark") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark0.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long)]
    val joined = EventStreams.attributionJoinLeftOuter(
      clicks.toDF().toDF("user_id", "ts", "event_id"),
      purchases.toDF().toDF("user_id", "ts", "event_id"),
      delay = "1 hour", lookback = "2 hours")
    val query = joined.writeStream
      .format("memory").queryName("attr_outer_sink")
      .outputMode(OutputMode.Append)
      .start()
    try {
      // u1: matched purchase (inner semantics preserved);
      // u2: click AFTER the purchase → unmatched → must surface as null;
      // u3: no click at all → unmatched → must surface as null.
      clicks.addData((1L, ts(1.0), 100L), (2L, ts(2.0), 300L))
      purchases.addData((1L, ts(1.5), 200L), (2L, ts(1.0), 301L), (3L, ts(1.2), 400L))
      query.processAllAvailable()
      // the null verdicts are UNDECIDABLE until the watermark passes the
      // lookback horizon: only the matched row may exist yet
      val early = spark.table("attr_outer_sink").collect()
      assert(early.forall(!_.isNullAt(3)), "null row emitted before the watermark allows it")
      // push both watermarks far past every horizon; one more batch
      // cycle lets the outer state flush
      clicks.addData((9L, ts(50.0), 998L))
      purchases.addData((9L, ts(50.0), 999L))
      query.processAllAvailable()
      clicks.addData((9L, ts(51.0), 996L))
      purchases.addData((9L, ts(51.0), 997L))
      query.processAllAvailable()
      val rows = spark.table("attr_outer_sink").collect()
      val matched = rows.filter(!_.isNullAt(3))
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      val nulls = rows.filter(_.isNullAt(3)).map(r => (r.getLong(0), r.getLong(1)))
      // inner matches unchanged; 9L's flush purchases match their own clicks
      assert(matched.filter(_._1 <= 3L) == Set((1L, 200L, 100L)))
      // both unconverted purchases emitted with null clicks, exactly once
      assert(nulls.toSet == Set((2L, 301L), (3L, 400L)))
      assert(nulls.length == 2, s"duplicate null emission: ${nulls.mkString(",")}")
      // a null row means NO click column survives, not a partial row
      rows.filter(_.isNullAt(3)).foreach(r => assert(r.isNullAt(4)))
    } finally query.stop()
  }

  test("hourlyStats on a static frame re-aggregates to the batch hourly query") {
    // the SAME streaming transform evaluates in batch (Spark's unified
    // model); rolled up over event_type it must equal qHourlyEventStats
    val sfDir = sf
    val stats = EventStreams.hourlyStats(
        graft.model.Tables.events(spark, sfDir).select("ts", "event_type", "value"))
      .groupBy(col("hour"))
      .agg(sum(col("n")).as("n"),
        sum(col("total_value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast("double").as("total_value"))
    val batch = graft.queries.Analytics.qHourlyEventStats(spark, sfDir)
    assert(stats.exceptAll(batch).isEmpty && batch.exceptAll(stats).isEmpty)
  }

  test("streaming sessionization agrees with the batch session_window query") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark0.sqlContext
    val gapMs = 12L * 3600 * 1000
    // deterministic little corpus in 2 batches; u12's second batch event is
    // LATE AND OUT OF ORDER (4.5h arrives after 5h, above the 4h watermark)
    // — exactly the arrival the multi-session state exists for: it must
    // extend the session's START backwards. Closed out by far-future
    // flush events.
    val batch1 = Seq(
      StreamEvent(10L, ts(0.0), 1.0), StreamEvent(10L, ts(5.0), 2.0),  // session A
      StreamEvent(11L, ts(2.0), 4.0),
      StreamEvent(12L, ts(5.0), 6.0))
    val batch2 = Seq(
      StreamEvent(10L, ts(20.0), 3.0),                                 // session B (gap 15h)
      StreamEvent(11L, ts(13.9), 5.0),                                 // merges (gap 11.9h)
      StreamEvent(12L, ts(4.5), 7.0))                                  // late out-of-order
    val evs = batch1 ++ batch2
    val input = MemoryStream[StreamEvent]
    val query = EventStreams.sessionize(
        input.toDS().withWatermark("ts", "1 hour").as[StreamEvent], gapMs)
      .writeStream.format("memory").queryName("batch_parity_sink")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(batch1: _*)
      query.processAllAvailable()
      input.addData(batch2: _*)
      query.processAllAvailable()
      input.addData(StreamEvent(99L, ts(100.0), 0.0)) // flush watermark
      query.processAllAvailable()
      input.addData(StreamEvent(99L, ts(200.0), 0.0)) // extra batch: fire timeouts
      query.processAllAvailable()
      val streaming = spark.table("batch_parity_sink").as[SessionOut].collect()
        .filter(_.user_id != 99L)
        .map(s => (s.user_id, s.session_start, s.session_end, s.n_events, s.total_value)).toSet

      val batch = evs.toDS().toDF()
        .groupBy(col("user_id"), session_window(col("ts"), "12 hours"))
        .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
        .select(col("user_id"), col("session_window.start"), col("session_window.end"),
          col("n_events"), col("total_value"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3), r.getDouble(4)))
        .toSet
      assert(streaming == batch)
    } finally query.stop()
  }
}
