package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.model.Tables

/** The [[Joins]] kernels: result-equivalence against the naive plans they
  * replace, and plan-shape assertions for the scale claims.
  */
class JoinsSpec extends SparkSuite {

  // ------------------------------------------------------------------
  // rangeJoinBinned
  // ------------------------------------------------------------------

  test("rangeJoinBinned matches the naive non-equi join row-for-row") {
    import spark.implicits._
    val events = Tables.events(spark, sf)
    val win = spark.range(0, 48)
      .select($"id".as("window_id"),
        expr("timestampadd(MINUTE, CAST(id * 37 AS INT), TIMESTAMP '2024-01-01 00:07:00')").as("s"))
      .withColumn("e", expr("timestampadd(MINUTE, 53, s)"))
    val binned = Joins.rangeJoinBinned(events, "ts", win, "s", "e", binSeconds = 1800L)
      .select($"event_id", $"window_id")
    val naive = events.join(win, $"ts" >= $"s" && $"ts" < $"e")
      .select($"event_id", $"window_id")
    assert(binned.count() > 0, "fixture windows matched no events")
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
  }

  test("rangeJoinBinned covers ranges that span many bins") {
    import spark.implicits._
    // one 6-hour range over 15-minute bins: 24-bin span — exercises the
    // sequence explosion well past the adjacent-bin case
    val win = Seq((1L, "2024-01-02 03:10:00", "2024-01-02 09:10:00"))
      .toDF("window_id", "s0", "e0")
      .select($"window_id", $"s0".cast("timestamp").as("s"), $"e0".cast("timestamp").as("e"))
    val events = Tables.events(spark, sf)
    val got = Joins.rangeJoinBinned(events, "ts", win, "s", "e", binSeconds = 900L).count()
    val want = events.join(win, $"ts" >= $"s" && $"ts" < $"e").count()
    assert(got === want)
    assert(want > 0, "6-hour fixture window matched no events")
  }

  test("rangeJoinBinned plans as an equi-join — no nested loop, no cartesian") {
    val p = Joins.qEventRangeJoin(spark, sf).queryExecution.sparkPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop join in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian product in:\n$p")
  }

  test("boundary semantics: start inclusive, end exclusive") {
    import spark.implicits._
    val rows = Seq(
      (1L, "2024-01-01 00:00:00"), // == start → in
      (2L, "2024-01-01 00:59:59"), // < end    → in
      (3L, "2024-01-01 01:00:00"), // == end   → out
      (4L, "2023-12-31 23:59:59")  // < start  → out
    ).toDF("event_id", "ts0").select($"event_id", $"ts0".cast("timestamp").as("ts"))
    val win = Seq((7L, "2024-01-01 00:00:00", "2024-01-01 01:00:00"))
      .toDF("window_id", "s0", "e0")
      .select($"window_id", $"s0".cast("timestamp").as("s"), $"e0".cast("timestamp").as("e"))
    val got = Joins.rangeJoinBinned(rows, "ts", win, "s", "e", binSeconds = 600L)
      .select($"event_id").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 2L))
  }

  // ------------------------------------------------------------------
  // saltedEquiJoin
  // ------------------------------------------------------------------

  test("saltedEquiJoin equals the plain join, including multi-row dim keys") {
    import spark.implicits._
    // skewed fact: 80% of rows on key 0; dim has TWO rows for key 0 —
    // replication must not duplicate or drop fact×dim pairs
    val fact = spark.range(0, 5000)
      .select($"id".as("row_id"), when($"id" % 5 =!= 0, lit(0L)).otherwise($"id" % 40).as("k"))
    val dim = (Seq((0L, "hot-a"), (0L, "hot-b")) ++ (1L until 40L).map(i => (i, s"d$i")))
      .toDF("dk", "tag")
    val salted = Joins.saltedEquiJoin(fact, dim, "k", "dk", $"row_id", numSalts = 8)
      .select($"row_id", $"k", $"tag")
    val plain = fact.join(dim, $"k" === $"dk").select($"row_id", $"k", $"tag")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted shuffle partitions on (key, salt) — the hot key spreads across tasks") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // k must not be a literal: Catalyst would constant-fold it out of the
      // join keys and the assertion would (correctly) see salt-only hashing
      val fact = spark.range(0, 1000)
        .select($"id".as("row_id"), when($"id" % 100 =!= 0, lit(0L)).otherwise($"id").as("k"))
      val dim = spark.range(0, 10).select($"id".as("dk"), $"id".as("tag"))
      val df = Joins.saltedEquiJoin(fact, dim, "k", "dk", $"row_id", numSalts = 8)
      // EnsureRequirements runs for executedPlan; hash partitioning must
      // carry BOTH the key and the synthetic salt
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("__fsalt"), s"salt column absent from physical plan:\n$p")
      val hashParts = "hashpartitioning\\(k#\\d+L?, __fsalt".r
      assert(hashParts.findFirstIn(p).isDefined,
        s"expected hashpartitioning(k, __fsalt, ...) in:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  // ------------------------------------------------------------------
  // registry queries smoke at test SF
  // ------------------------------------------------------------------

  test("q_event_range_join and q_event_salted_enrich run non-empty at sf0.001") {
    assert(Joins.qEventRangeJoin(spark, sf).count() > 0)
    assert(Joins.qEventSaltedEnrich(spark, sf).count() > 0)
  }
}
