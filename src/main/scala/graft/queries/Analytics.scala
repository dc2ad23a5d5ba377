package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, StructType}

import graft.model.Tables

/** The analytical query surface of the engine (SURVEY.md §2.6/§7.2 J2):
  * grouped aggregation, star joins, windows, top-k and set operations over the
  * testdata star schema (lineitem × orders × customer × nation × region).
  *
  * Cross-engine determinism rules (every query here is DuckDB-oracle checked):
  *   - Money/measure aggregation happens in fixed-point DECIMAL, never binary
  *     double: a double `sum` depends on partition/merge order, so the same
  *     query would return different low bits run-to-run on a real cluster.
  *     Fixed-point is what production engines do for money, and it makes the
  *     result bit-reproducible at any parallelism. [[dec]] centralizes this.
  *   - The FINAL output column of every decimal aggregate is cast to DOUBLE
  *     on both sides (Spark and oracle SQL). Spark and DuckDB widen decimal
  *     sums to different precision/scale (DECIMAL(28,4) vs DECIMAL(38,4)),
  *     so the exact decimal values serialize differently even when equal;
  *     exact-decimal→double conversion is deterministic and identical in
  *     both engines. Internal arithmetic stays decimal (order-independent).
  *   - No bare double→int casts (Spark truncates, DuckDB rounds) — always an
  *     explicit floor/round.
  *   - Every result has a total-order ORDER BY (unique tiebreak key) so the
  *     output is one canonical row sequence.
  *
  * Scale notes (100 TB): joins to `nation`/`region`/`supplier` are explicitly
  * broadcast (dims are tiny); the fact-fact joins (lineitem×orders) shuffle on
  * the join key and benefit from AQE; aggregations are partial (map-side
  * combine) by construction since we use plain `groupBy().agg()`.
  */
object Analytics {

  /** Fixed-point view of a double measure column: exact, order-independent sums. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))
  private val oneDec: Column = lit(1).cast(DecimalType(18, 4))

  /** Narrow fixed-point (7 integer digits — measures here are < 1e6). Used where
    * a 3-factor product must stay EXACT: (11,4)×(12,4)×(12,4) = DECIMAL(37,12)
    * in Spark / (35,12) in DuckDB — under both engines' precision-38 cap, so no
    * engine-specific rounding ever applies (Spark would round a capped product
    * HALF_UP at reduced scale, DuckDB would keep scale 12 — a real divergence).
    */
  private def decN(c: Column): Column = c.cast(DecimalType(11, 4))
  private val oneDecN: Column = lit(1).cast(DecimalType(11, 4))

  /** revenue term: extendedprice * (1 - discount), exact decimal arithmetic */
  private def revenue(price: Column, discount: Column): Column =
    dec(price) * (oneDec - dec(discount))

  /** charge term: extendedprice * (1 - discount) * (1 + tax), exact to scale 12.
    *
    * Oracle-side note: DuckDB's wide-DECIMAL→DOUBLE cast can be 1 ulp off the
    * correctly-rounded result (int128 → double → ÷10^s double-rounds), while
    * Spark/Java's BigDecimal.doubleValue is always correctly rounded. The
    * paired oracle SQL therefore reduces the sum to DECIMAL(21,6) — lossless,
    * since inputs are 2dp so charge terms are exactly 6dp — before its DOUBLE
    * cast, which keeps the unscaled value < 2^53 and the conversion exact.
    */
  private def charge(price: Column, discount: Column, tax: Column): Column =
    decN(price) * (oneDecN - decN(discount)) * (oneDecN + decN(tax))

  // --- Q1: pricing summary (groupBy/agg over the fact table; map-side combine) ---
  def q1PricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(dec($"l_quantity")).cast("double").as("sum_qty"),
        sum(dec($"l_extendedprice")).cast("double").as("sum_base_price"),
        sum(revenue($"l_extendedprice", $"l_discount")).cast(DecimalType(21, 4)).cast("double").as("sum_disc_price"),
        sum(charge($"l_extendedprice", $"l_discount", $"l_tax")).cast("double").as("sum_charge"),
        (sum(dec($"l_quantity")).cast("double") / count(lit(1)).cast("double")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1PricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(21,4)) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(11,4)) * (CAST(1 AS DECIMAL(11,4)) - CAST(l_discount AS DECIMAL(11,4))) * (CAST(1 AS DECIMAL(11,4)) + CAST(l_tax AS DECIMAL(11,4)))) AS DECIMAL(21,6)) AS DOUBLE) AS sum_charge,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // --- Q3: top unshipped orders (3-way join + agg + deterministic top-k) ---
  def q3TopUnshipped(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cutoff = "1999-01-01"
    val cust = Tables.customer(spark, sfDir).filter($"c_mktsegment" === "BUILDING")
    val ord = Tables.orders(spark, sfDir).filter($"o_orderdate" < lit(cutoff).cast("timestamp"))
    val li = Tables.lineitem(spark, sfDir).filter($"l_shipdate" > lit(cutoff).cast("timestamp"))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(sum(revenue($"l_extendedprice", $"l_discount")).cast(DecimalType(21, 4)).cast("double").as("rev"))
      .orderBy($"rev".desc, $"l_orderkey")
      .limit(10)
  }

  val q3TopUnshippedSql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(21,4)) AS DOUBLE) AS rev
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1999-01-01'
      |  AND l_shipdate > TIMESTAMP '1999-01-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY rev DESC, l_orderkey LIMIT 10""".stripMargin

  // --- Q5-style: revenue by nation (5-way star join; dims broadcast) ---
  def q5NationRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), $"l_orderkey" === $"o_orderkey")
      // customer is NOT broadcast-hinted: it is O(rows) with scale (not
      // broadcastable at 100 TB) — let AQE decide. nation/region are
      // constant-size dims, always safe to broadcast.
      .join(Tables.customer(spark, sfDir), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, sfDir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(spark, sfDir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        sum(revenue($"l_extendedprice", $"l_discount")).cast(DecimalType(21, 4)).cast("double").as("rev"),
        count(lit(1)).as("n_lineitems"))
      .orderBy($"r_name", $"n_name")
  }

  val q5NationRevenueSql: String =
    """SELECT r_name, n_name,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(21,4)) AS DOUBLE) AS rev,
      |  count(*) AS n_lineitems
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  // --- Top-k per group via window (row_number with total-order tiebreak) ---
  /** Top-3 orders per priority, two-phase: `o_orderpriority` has only 5
    * distinct values, so a single `Window.partitionBy(priority)` funnels
    * the whole table through 5 tasks (the r2 plan-audit note). Phase 1
    * salts the window with the source partition id — top-3 per
    * (priority, salt) over ~|salts|×5 groups, full parallelism; phase 2
    * re-ranks the ≤ 3×|salts|×5 survivors through the unsalted window.
    * Global top-3 is a subset of every per-salt top-3, and the
    * (price DESC, orderkey) tiebreak is total, so the result is
    * IDENTICAL to the single-window form — the oracle SQL stays the
    * naive formulation on purpose.
    */
  def qTopOrdersPerPriority(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val pre = Window.partitionBy($"o_orderpriority", $"salt")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, sfDir)
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice")
      .withColumn("salt", spark_partition_id())
      .withColumn("r", row_number().over(pre))
      .filter($"r" <= 3)
      .drop("salt", "r")
      .withColumn("rank_in_priority", row_number().over(w))
      .filter($"rank_in_priority" <= 3)
      .select($"o_orderpriority", $"rank_in_priority", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_orderpriority", $"rank_in_priority")
  }

  val qTopOrdersPerPrioritySql: String =
    """SELECT o_orderpriority, rank_in_priority, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rank_in_priority
      |  FROM orders) t
      |WHERE rank_in_priority <= 3
      |ORDER BY o_orderpriority, rank_in_priority""".stripMargin

  // --- native top-k per key (custom Catalyst operator, oracle-checked) ---

  /** [[qTopOrdersPerPriority]]'s result computed by the engine's custom
    * whole-operator extension ([[graft.plans.TopKPerKey]]: bounded heap
    * per key, key exchange but NO sort in the plan) instead of the salted
    * double-window. The oracle stays the stock row_number formulation —
    * an independent semantics check of the custom exec.
    */
  def qTopOrdersNative(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.functions.GraftOps.topKPerKey(
        Tables.orders(spark, sfDir)
          .select($"o_orderpriority", $"o_orderkey", $"o_totalprice"),
        keys = Seq("o_orderpriority"),
        order = Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
      .orderBy($"o_orderpriority", $"o_totalprice".desc, $"o_orderkey")
  }

  val qTopOrdersNativeSql: String =
    """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin

  // --- Running total per customer (ordered window frame; decimal = exact) ---
  def qRunningTotal(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, sfDir)
      .withColumn("running_spend", sum(dec($"o_totalprice")).over(w).cast("double"))
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"running_spend")
      .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
  }

  val qRunningTotalSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      |FROM orders
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  // --- Sliding time-range window per user (RANGE frame over event time) ---

  /** Trailing-hour activity per event: for every event, the count and
    * decimal-exact value sum of the SAME USER's events in the preceding
    * 3600 seconds — a RANGE (value-based) window frame, where the frame
    * boundary is event-time distance rather than row position (the rows
    * vs range distinction [[qRunningTotal]]'s frame doesn't exercise).
    * Ordering is on floor-to-second epoch, computed identically in both
    * engines (timestamps carry microseconds; sub-second truncation makes
    * the frame edge engine-exact). Peers at the same second share one
    * frame — RANGE semantics both engines define identically.
    *
    * Scale: one user_id-keyed exchange + per-partition sort — the
    * canonical window cost; no self-join (the naive "join events within
    * 1h" formulation is O(rows × density) and re-shuffles both sides).
    */
  def qEventMovingWindow(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"epoch_s")
      .rangeBetween(-3600L, Window.currentRow)
    Tables.events(spark, sfDir)
      .withColumn("epoch_s", $"ts".cast("long"))
      // both aggregates in ONE select over the same spec → a single
      // Window node (chained withColumns interleave Projects that block
      // the CollapseWindow rule and double the window pass)
      .select($"event_id", $"user_id", $"epoch_s",
        count(lit(1)).over(w).as("cnt_1h"),
        sum(dec($"value")).over(w).cast("double").as("sum_1h"))
      .orderBy($"event_id")
  }

  val qEventMovingWindowSql: String =
    """SELECT event_id, user_id,
      |  CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
      |  count(*) OVER w AS cnt_1h,
      |  CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // --- Set operators: INTERSECT / EXCEPT between brand assortments ---

  /** The relational set operators the DataFrame DSL surfaces as
    * `intersect`/`except` (both DISTINCT-semantics, matching SQL): which
    * part sizes two brand assortments share, and which are exclusive to
    * each — tagged and unioned into one result. Spark plans these as
    * left-semi/left-anti aggregates over the pre-aggregated (distinct)
    * sides, not row-level subtraction.
    *
    * Scale: each side aggregates to ≤ |distinct sizes| rows before the
    * semi/anti join — the shuffles carry distinct values only. The final
    * union is free (no exchange: unions concatenate partitions).
    */
  def qPartSizeSetops(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val part = Tables.part(spark, sfDir)
    def sizes(brand: String) =
      part.filter($"p_brand" === brand).select($"p_size")
    val a = sizes("Brand#12")
    val b = sizes("Brand#21")
    a.intersect(b).withColumn("tag", lit("both"))
      .unionAll(a.except(b).withColumn("tag", lit("only_12")))
      .unionAll(b.except(a).withColumn("tag", lit("only_21")))
      .select($"tag", $"p_size")
      .orderBy($"tag", $"p_size")
  }

  val qPartSizeSetopsSql: String =
    """WITH a AS (SELECT p_size FROM part WHERE p_brand = 'Brand#12'),
      |b AS (SELECT p_size FROM part WHERE p_brand = 'Brand#21'),
      |tagged AS (
      |  SELECT 'both' AS tag, p_size FROM (SELECT p_size FROM a INTERSECT SELECT p_size FROM b)
      |  UNION ALL
      |  SELECT 'only_12' AS tag, p_size FROM (SELECT p_size FROM a EXCEPT SELECT p_size FROM b)
      |  UNION ALL
      |  SELECT 'only_21' AS tag, p_size FROM (SELECT p_size FROM b EXCEPT SELECT p_size FROM a)
      |)
      |SELECT tag, p_size FROM tagged ORDER BY tag, p_size""".stripMargin

  // --- Semi/anti join: customers with and without orders ---
  def qCustomersWithoutOrders(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val orderKeys = Tables.orders(spark, sfDir)
      .filter($"o_orderdate" >= lit("2001-01-01").cast("timestamp"))
      .select($"o_custkey")
    Tables.customer(spark, sfDir)
      .join(orderKeys, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  val qCustomersWithoutOrdersSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '2001-01-01')
      |ORDER BY c_custkey""".stripMargin

  def qCustomerOrderActivity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, sfDir).select($"c_custkey")
    val ords = Tables.orders(spark, sfDir).select($"o_custkey".as("c_custkey"))
    val both = cust.intersect(ords).agg(count(lit(1)).as("n")).select(lit("with_orders").as("tag"), $"n")
    val onlyCust = cust.except(ords).agg(count(lit(1)).as("n")).select(lit("without_orders").as("tag"), $"n")
    both.unionAll(onlyCust).orderBy($"tag")
  }

  val qCustomerOrderActivitySql: String =
    """SELECT * FROM (
      |  SELECT 'with_orders' AS tag, count(*) AS n FROM
      |    (SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders) t1
      |  UNION ALL
      |  SELECT 'without_orders' AS tag, count(*) AS n FROM
      |    (SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders) t2
      |) u ORDER BY tag""".stripMargin

  // --- Left outer join with null-handling aggregation ---
  def qCustomerOrderCounts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir), $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey", $"c_name")
      .agg(
        count($"o_orderkey").as("n_orders"),
        coalesce(sum(dec($"o_totalprice")).cast("double"), lit(0.0)).as("total_spend"))
      .orderBy($"c_custkey")
  }

  val qCustomerOrderCountsSql: String =
    """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
      |  coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), CAST(0 AS DOUBLE)) AS total_spend
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin

  // --- FULL OUTER join (completes the join-type matrix) ---

  /** Customer vs (high-balance) supplier presence per nation via FULL
    * OUTER join of two aggregates. The supplier side is filtered so some
    * nations genuinely lose it — the outer semantics (null-padded sides,
    * coalesced keys) are observable, not vacuous. Both inputs are
    * pre-aggregated to nation grain BEFORE the join: the outer join
    * shuffles ≤ |nations| rows per side, never the base tables.
    */
  def qNationCustSuppFull(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, sfDir)
      .groupBy($"c_nationkey").agg(count(lit(1)).as("n_customers"))
    val supp = Tables.supplier(spark, sfDir)
      .filter($"s_acctbal" > 6000.0)
      .groupBy($"s_nationkey").agg(count(lit(1)).as("n_rich_suppliers"))
    cust.join(supp, $"c_nationkey" === $"s_nationkey", "full_outer")
      .select(
        coalesce($"c_nationkey", $"s_nationkey").as("nationkey"),
        coalesce($"n_customers", lit(0L)).as("n_customers"),
        coalesce($"n_rich_suppliers", lit(0L)).as("n_rich_suppliers"))
      .orderBy($"nationkey")
  }

  val qNationCustSuppFullSql: String =
    """WITH c AS (
      |  SELECT c_nationkey, count(*) AS n_customers FROM customer GROUP BY c_nationkey
      |),
      |s AS (
      |  SELECT s_nationkey, count(*) AS n_rich_suppliers FROM supplier
      |  WHERE s_acctbal > 6000.0 GROUP BY s_nationkey
      |)
      |SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
      |  coalesce(n_customers, 0) AS n_customers,
      |  coalesce(n_rich_suppliers, 0) AS n_rich_suppliers
      |FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
      |ORDER BY nationkey""".stripMargin

  // --- native pivot + unpivot round trip ---

  /** Spark's NATIVE `pivot` (explicit value list — deterministic columns,
    * no value-discovery pass) immediately melted back to long form with
    * `unpivot` — covering both reshaping operators in one oracle-checked
    * query. The unpivot drops the null cells pivot minted for absent
    * (day, type) combos, so the round trip equals the direct group-by,
    * which is exactly what the oracle states.
    */
  def qEventUnpivot(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val types = Seq("click", "view", "purchase", "signup", "error")
    val pivoted = Tables.events(spark, sfDir)
      .groupBy(to_date($"ts").as("day"))
      .pivot("event_type", types)
      .agg(sum(dec($"value")).cast("double"))
    pivoted.unpivot(
        ids = Array($"day"),
        values = types.map(col).toArray,
        variableColumnName = "event_type",
        valueColumnName = "total_value")
      .filter($"total_value".isNotNull)
      .orderBy($"day", $"event_type")
  }

  val qEventUnpivotSql: String =
    """SELECT CAST(ts AS DATE) AS day, event_type,
      |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY CAST(ts AS DATE), event_type
      |ORDER BY day, event_type""".stripMargin

  // --- ROLLUP (hierarchical grouping sets) ---
  def qOrderRollup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .rollup($"o_orderpriority", $"o_orderstatus")
      .agg(count(lit(1)).as("n"), sum(dec($"o_totalprice")).cast("double").as("total"))
      .orderBy($"o_orderpriority".asc_nulls_first, $"o_orderstatus".asc_nulls_first)
  }

  val qOrderRollupSql: String =
    """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
      |ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin

  // --- explicit GROUPING SETS + grouping_id through the SQL surface ---

  /** Hand-picked grouping sets — (priority), (status), and the grand
    * total — with `grouping_id()` disambiguating which set produced each
    * row (the NULL-vs-grouped ambiguity rollup/cube leave behind).
    * Written through `spark.sql` over a temp view: grouping sets are
    * first-class in the SQL surface (§2.8), and the bitmask semantics
    * (left column = high bit) agree between Spark and DuckDB.
    */
  def qOrderGroupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("graft_orders_gs")
    spark.sql(
      """SELECT o_orderpriority, o_orderstatus,
        |  CAST(grouping_id(o_orderpriority, o_orderstatus) AS INT) AS gid,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_orders_gs
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        |ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin)
  }

  val qOrderGroupingSetsSql: String =
    """SELECT o_orderpriority, o_orderstatus,
      |  CAST(grouping(o_orderpriority, o_orderstatus) AS INTEGER) AS gid,
      |  count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
      |ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin

  // --- Conditional aggregation (pivot expressed portably as filtered aggs) ---
  def qEventTypePivot(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def typedSum(t: String): Column =
      sum(when($"event_type" === t, dec($"value"))).cast("double").as(s"${t}_value")
    Tables.events(spark, sfDir)
      .groupBy(to_date($"ts").as("day"))
      .agg(
        typedSum("click"), typedSum("view"), typedSum("purchase"),
        typedSum("signup"), typedSum("error"),
        count(lit(1)).as("n_events"))
      .orderBy($"day")
  }

  val qEventTypePivotSql: String =
    """SELECT CAST(ts AS DATE) AS day,
      |  CAST(sum(CAST(value AS DECIMAL(18,4))) FILTER (WHERE event_type = 'click') AS DOUBLE) AS click_value,
      |  CAST(sum(CAST(value AS DECIMAL(18,4))) FILTER (WHERE event_type = 'view') AS DOUBLE) AS view_value,
      |  CAST(sum(CAST(value AS DECIMAL(18,4))) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase_value,
      |  CAST(sum(CAST(value AS DECIMAL(18,4))) FILTER (WHERE event_type = 'signup') AS DOUBLE) AS signup_value,
      |  CAST(sum(CAST(value AS DECIMAL(18,4))) FILTER (WHERE event_type = 'error') AS DOUBLE) AS error_value,
      |  count(*) AS n_events
      |FROM events GROUP BY CAST(ts AS DATE) ORDER BY day""".stripMargin

  // --- Distinct aggregation ---
  def qEventDistinctUsers(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(
        countDistinct($"user_id").as("n_users"),
        count(lit(1)).as("n_events"),
        sum(dec($"value")).cast("double").as("total_value"))
      .orderBy($"event_type")
  }

  val qEventDistinctUsersSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // --- lag/lead: inter-event gap per user (exact integer microseconds) ---
  def qEventGaps(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, sfDir)
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("gap_us", unix_micros($"ts") - unix_micros($"prev_ts"))
      .select($"user_id", $"event_id", $"ts", $"gap_us")
      .orderBy($"user_id", $"ts", $"event_id")
  }

  val qEventGapsSql: String =
    """SELECT user_id, event_id, ts,
      |  epoch_us(ts) - epoch_us(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
      |FROM events ORDER BY user_id, ts, event_id""".stripMargin

  // --- hourly time buckets (streaming-equivalent batch aggregation) ---
  def qHourlyEventStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", $"ts").as("hour"))
      .agg(count(lit(1)).as("n"), sum(dec($"value")).cast("double").as("total_value"))
      .orderBy($"hour")
  }

  val qHourlyEventStatsSql: String =
    """SELECT date_trunc('hour', ts) AS hour, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM events GROUP BY date_trunc('hour', ts) ORDER BY hour""".stripMargin

  // --- TPC-H Q9-shaped product-profit rollup (part + supplier coverage) ---

  /** Profit by supplier nation × part brand over parts whose name carries a
    * marker token — TPC-H Q9's shape on the testdata schema (no partsupp
    * table, so supplycost is omitted from the profit term).
    *
    * Scale notes: the `p_name LIKE` predicate pushes into the part scan and
    * shrinks that join input BEFORE the shuffle; `part` and `supplier` are
    * O(SF) tables (TPC-H: 200k/SF and 10k/SF) — NOT broadcast-hinted, AQE
    * may still elect a broadcast at small SF but a 100 TB plan gets the
    * shuffle join it needs. `nation` (25 rows) is always broadcast. Join
    * order: filters first, largest-to-smallest build sides after.
    */
  def q9ProductProfit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir).filter($"p_name".like("%a%")),
        $"l_partkey" === $"p_partkey")
      .join(Tables.supplier(spark, sfDir), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.nation(spark, sfDir)), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name".as("nation"), $"p_brand")
      .agg(
        sum(revenue($"l_extendedprice", $"l_discount")).cast(DecimalType(21, 4)).cast("double").as("profit"),
        count(lit(1)).as("n_lineitems"))
      .orderBy($"nation", $"p_brand")
  }

  val q9ProductProfitSql: String =
    """SELECT n_name AS nation, p_brand,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(21,4)) AS DOUBLE) AS profit,
      |  count(*) AS n_lineitems
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%a%'
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name, p_brand
      |ORDER BY nation, p_brand""".stripMargin

  // --- TPC-H Q14 shape: conditional-share ratio over a month window ---

  /** Promo revenue share for one ship month — Q14's shape: a tight
    * date-range filter (pushes to the parquet scan, prunes the join
    * input), a fact×part join, and a global conditional/total ratio.
    * Both sums reduce through DECIMAL then widen to DOUBLE before the
    * single division (exact, order-independent, cross-engine stable).
    */
  def q14PromoShare(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit("1998-06-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-07-01").cast("timestamp"))
    li.join(Tables.part(spark, sfDir), $"l_partkey" === $"p_partkey")
      .agg(
        (lit(100.0) *
          sum(when($"p_type".like("PROMO%"),
            revenue($"l_extendedprice", $"l_discount")).otherwise(lit(0).cast(DecimalType(18, 4))))
            .cast(DecimalType(21, 4)).cast("double") /
          sum(revenue($"l_extendedprice", $"l_discount"))
            .cast(DecimalType(21, 4)).cast("double")).as("promo_share_pct"),
        count(lit(1)).as("n_lineitems"))
  }

  val q14PromoShareSql: String =
    """SELECT
      |  CAST(100.0 AS DOUBLE) *
      |    CAST(CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
      |      THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
      |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(21,4)) AS DOUBLE) /
      |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(21,4)) AS DOUBLE)
      |    AS promo_share_pct,
      |  count(*) AS n_lineitems
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1998-06-01' AND l_shipdate < TIMESTAMP '1998-07-01'""".stripMargin

  // --- TPC-H Q19 shape: disjunctive multi-column join predicate ---

  /** Q19's discount-revenue shape: three OR'd (brand, size, quantity)
    * arms evaluated against the JOINED row. The single-column conjuncts
    * Catalyst can factor out (p_size >= 1, quantity bounds) push to the
    * scans; the cross-table disjunction evaluates post-join — the plan
    * shape every OR-of-ANDs filter gets at scale.
    */
  def q19DiscountRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val arm1 = $"p_brand" === "Brand#12" && $"p_size".between(1, 20) && $"l_quantity".between(1, 20)
    val arm2 = $"p_brand" === "Brand#23" && $"p_size".between(1, 30) && $"l_quantity".between(10, 30)
    val arm3 = $"p_brand" === "Brand#5" && $"p_size".between(1, 40) && $"l_quantity".between(20, 40)
    Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), $"l_partkey" === $"p_partkey")
      .filter(arm1 || arm2 || arm3)
      .groupBy($"p_brand")
      .agg(
        sum(revenue($"l_extendedprice", $"l_discount")).cast(DecimalType(21, 4)).cast("double").as("rev"),
        count(lit(1)).as("n"))
      .orderBy($"p_brand")
  }

  val q19DiscountRevenueSql: String =
    """SELECT p_brand,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(21,4)) AS DOUBLE) AS rev,
      |  count(*) AS n
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 10 AND 30)
      |   OR (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 40 AND l_quantity BETWEEN 20 AND 40)
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  // --- ntile: customer-spend quartiles (rank-family window over an agg) ---

  /** Customers bucketed into spend quartiles (`ntile(4)` over total-order
    * spend ranking), then per-quartile stats — the rank-family window
    * shape every BI layer produces. Spend stays DECIMAL through the
    * ranking and the per-quartile re-aggregation (order-independent),
    * and reduces to DECIMAL(18,4) before the boundary double cast so the
    * unscaled value stays below 2^53 (exact conversion in both engines —
    * the q1 sum_charge precaution).
    *
    * Scale: one shuffle for the per-customer agg; the ntile window is a
    * single global sort over CUSTOMER-level rows (already reduced — the
    * fact table never passes through the window). For billions of
    * customers, swap ntile for percent_rank bucketing over range
    * partitioning; at any realistic customer count this plan holds.
    */
  def qCustomerSpendQuartiles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val spend = Tables.orders(spark, sfDir)
      .groupBy($"o_custkey")
      .agg(sum(dec($"o_totalprice")).as("spend"))
    val w = Window.orderBy($"spend".desc, $"o_custkey")
    spend.withColumn("quartile", ntile(4).over(w))
      .groupBy($"quartile")
      .agg(
        count(lit(1)).as("n_customers"),
        min($"spend").cast("double").as("min_spend"),
        max($"spend").cast("double").as("max_spend"),
        sum($"spend").cast(DecimalType(18, 4)).cast("double").as("total_spend"))
      .orderBy($"quartile")
  }

  val qCustomerSpendQuartilesSql: String =
    """WITH spend AS (
      |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,4))) AS spend
      |  FROM orders GROUP BY o_custkey
      |),
      |ranked AS (
      |  SELECT o_custkey, spend,
      |    CAST(ntile(4) OVER (ORDER BY spend DESC, o_custkey) AS INTEGER) AS quartile
      |  FROM spend
      |)
      |SELECT quartile, count(*) AS n_customers,
      |  CAST(min(spend) AS DOUBLE) AS min_spend,
      |  CAST(max(spend) AS DOUBLE) AS max_spend,
      |  CAST(CAST(sum(spend) AS DECIMAL(18,4)) AS DOUBLE) AS total_spend
      |FROM ranked GROUP BY quartile ORDER BY quartile""".stripMargin

  // --- percentiles: exact interpolated, engine-free integer kernel ---

  /** Rank-selection interpolated quantiles on an integer grid — the
    * shared ENGINE-FREE percentile kernel (generalized from
    * [[qValueEquidepth]], which caught the hazard this kernel removes).
    *
    * Why not the native aggregates: Spark `percentile` and DuckDB
    * `quantile_cont` share the linear-interpolation DEFINITION but
    * evaluate it in different shapes — Spark `low + (high−low)·f`,
    * DuckDB `low·(1−f) + high·f` — which diverge by one ulp whenever
    * the interpolation point falls strictly between two distinct values
    * (the round-10 sf-sweep caught exactly this swapping equi-depth
    * bins). Here the interpolated value is instead computed ENTIRELY in
    * exact BIGINT arithmetic on the integer grid the data lives on:
    * for level num/`den` over n values, the target position is
    * idx + r/den with idx = (num·(n−1)) div den, r = (num·(n−1)) mod
    * den, and the returned fixed-point boundary is
    * `v_low·den + (v_high − v_low)·r` — exact value × den in input
    * units, bit-identical in any engine. Callers divide by the combined
    * scale once, in one fixed-shape double expression on both sides.
    *
    * Mechanics: one partial-aggregated (key, v) count table (GRID-
    * bounded, never row-scale — or the caller's pre-aggregated grid via
    * `weight`, the one-corpus-scan discipline), a cumulative window
    * over that bounded table, and ONE broadcast rank-selection join
    * whose conditional mins pick both bracketing values v_low (rank
    * idx+1) and v_high (rank idx+2, coalesced to v_low at the top
    * edge). Output: one row per key with a `<name>_b` BIGINT
    * fixed-point column per requested level (plus `n` under `withN`).
    *
    * Scale (100 TB): every row-scale step is ONE map-side-combinable
    * aggregation into the grid-bounded count table; everything after
    * runs on |keys|×|grid| rows. This replaces Spark's exact
    * `percentile` (which buffers every group in memory) with a shape
    * that never materializes a group — the same reason
    * [[qValueEquidepth]] uses it.
    */
  private[queries] def rankQuantiles(
      src: DataFrame, key: String, v: String,
      levels: Seq[(String, Int)], den: Int = 100,
      weight: Option[String] = None, withN: Boolean = false): DataFrame = {
    // weight: src is ALREADY a (key, v, weight) count table — the callers'
    // one-corpus-scan discipline: aggregate the corpus onto the grid once
    // (persisted at the call site), then every pass here is grid-sized
    val vt = weight match {
      case Some(w) => src.groupBy(col(key), col(v)).agg(sum(col(w)).as("cnt"))
      case None    => src.groupBy(col(key), col(v)).agg(count(lit(1)).as("cnt"))
    }
    val wCum = Window.partitionBy(col(key)).orderBy(col(v))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumt = vt.withColumn("cum", sum(col("cnt")).over(wCum))
    val nt = vt.groupBy(col(key)).agg(sum(col("cnt")).as("n"))
    val lvls = array(levels.map { case (nm, num) =>
      struct(lit(nm).as("lvl"), lit(num).as("num")) }: _*)
    val sel = nt.select(col(key), explode(lvls).as("L"), col("n"))
      .select(col(key), col("L.lvl").as("lvl"), col("L.num").as("num"), col("n"))
      .select(col(key), col("lvl"),
        expr(s"(num * (n - 1)) div $den").as("idx"),
        expr(s"(num * (n - 1)) % $den").as("r"))
    // both bracketing ranks in ONE join + ONE conditional aggregation
    // (a separate v_low/v_high pass each would double the grid joins)
    val bounds = cumt.join(broadcast(sel), Seq(key))
      .groupBy(col(key), col("lvl"), col("r"))
      .agg(min(when(col("cum") >= col("idx") + 1, col(v))).as("v_low"),
        min(when(col("cum") >= col("idx") + 2, col(v))).as("v_high"))
      .select(col(key), col("lvl"),
        (col("v_low") * den +
          (coalesce(col("v_high"), col("v_low")) - col("v_low")) * col("r")).as("b"))
    val piv = bounds.groupBy(col(key))
      .agg(max(when(col("lvl") === levels.head._1, col("b"))).as(s"${levels.head._1}_b"),
        levels.tail.map { case (nm, _) =>
          max(when(col("lvl") === nm, col("b"))).as(s"${nm}_b") }: _*)
    if (withN) piv.join(broadcast(nt), Seq(key)) else piv
  }

  /** Oracle-side mirror of [[rankQuantiles]]: a chain of CTE definitions
    * (to splice after the `src` CTE) ending in CTE `<pfx>q` with columns
    * (key, `<name>_b` …) — the same exact BIGINT rank-selection
    * arithmetic, so both engines compute the identical fixed-point
    * boundary. `n` is CAST to BIGINT before the num·(n−1) product
    * (DuckDB sums/windows into HUGEINT; the product must run in int64
    * on both sides to be the same arithmetic).
    */
  private def rankQuantilesSql(
      src: String, key: String, v: String,
      levels: Seq[(String, Int)], den: Int = 100, pfx: String = "rq",
      weight: Option[String] = None): String = {
    val vals = levels.map { case (nm, num) => s"('$nm', $num)" }.mkString(", ")
    val piv = levels.map { case (nm, _) =>
      s"max(CASE WHEN lvl = '$nm' THEN b END) AS ${nm}_b" }.mkString(", ")
    val cntE = weight.map(w => s"CAST(sum($w) AS BIGINT)").getOrElse("count(*)")
    s"""${pfx}vt AS (SELECT $key, $v, $cntE AS cnt FROM $src GROUP BY $key, $v),
       |${pfx}cum AS (
       |  SELECT $key, $v, CAST(sum(cnt) OVER (PARTITION BY $key ORDER BY $v
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM ${pfx}vt
       |),
       |${pfx}nt AS (SELECT $key, CAST(sum(cnt) AS BIGINT) AS n FROM ${pfx}vt GROUP BY $key),
       |${pfx}sel AS (
       |  SELECT $key, lvl, (num * (n - 1)) // $den AS idx, (num * (n - 1)) % $den AS r
       |  FROM ${pfx}nt, (VALUES $vals) AS L(lvl, num)
       |),
       |${pfx}lh AS (
       |  SELECT s.$key, s.lvl, s.r,
       |    min(CASE WHEN c.cum >= s.idx + 1 THEN c.$v END) AS v_low,
       |    min(CASE WHEN c.cum >= s.idx + 2 THEN c.$v END) AS v_high
       |  FROM ${pfx}sel s JOIN ${pfx}cum c ON c.$key = s.$key
       |  GROUP BY s.$key, s.lvl, s.r
       |),
       |${pfx}b AS (
       |  SELECT $key, lvl,
       |    v_low * $den + (COALESCE(v_high, v_low) - v_low) * r AS b
       |  FROM ${pfx}lh
       |),
       |${pfx}q AS (SELECT $key, $piv FROM ${pfx}b GROUP BY $key)""".stripMargin
  }

  /** Cent grid of `value`: the 2-decimal data's exact integer form. The
    * 2-decimal contract is guarded by AnalyticsSpec ("events.value honors
    * the 2-decimal contract") so sub-cent drift fails loudly instead of
    * silently shifting every grid-derived quantile (r11 advice).
    */
  private def centEvents(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir).select(col("event_type"), col("value"),
      expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("vc"))

  private val centEventsSql: String =
    """e AS (
      |  SELECT event_type, value, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      |  FROM events
      |)""".stripMargin

  /** Per-type value percentiles (p50/p90/p99), exact interpolated — on
    * the engine-free [[rankQuantiles]] integer kernel, NOT the native
    * `percentile`/`quantile_cont` pair whose lerp evaluation shapes
    * differ by an ulp between engines (the round-10 hazard class; ported
    * here round 11). The fixed-point boundary is exact value×10⁴ (cents
    * × den 100); the single closing `CAST(b AS DOUBLE)/10000.0` is the
    * same two-op shape on both sides, so the emitted doubles are
    * bit-identical by construction, not by the data cooperating.
    *
    * The sketch variant (`percentile_approx`, t-digest) is deliberately
    * NOT in this projection: its output is engine-specific and would
    * break the hash gate; AnalyticsSpec instead asserts the sketch lands
    * within tolerance of these exact values (the HLL treatment of
    * [[graft.ext.Similarity.qApproxDistinct]]).
    *
    * Scale: see [[rankQuantiles]] — one grid-bounded partial agg instead
    * of `percentile`'s per-group memory buffer; strictly better than the
    * native exact aggregate at 100 TB, and the t-digest remains the
    * unbounded-cardinality production path.
    */
  def qValuePercentiles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // ONE corpus scan: everything downstream (kernel passes, n) runs on
    // the persisted grid-bounded count table
    val vt = centEvents(spark, sfDir)
      .groupBy($"event_type", $"vc").agg(count(lit(1)).as("cnt"))
      .persist()
    vt.count() // eager: parallel kernel branches must not re-derive the grid
    rankQuantiles(vt, "event_type", "vc",
      Seq(("p50", 50), ("p90", 90), ("p99", 99)),
      weight = Some("cnt"), withN = true)
      .select($"event_type",
        ($"p50_b".cast("double") / 10000.0).as("p50"),
        ($"p90_b".cast("double") / 10000.0).as("p90"),
        ($"p99_b".cast("double") / 10000.0).as("p99"),
        $"n")
      .orderBy($"event_type")
  }

  val qValuePercentilesSql: String =
    s"""WITH $centEventsSql,
       |vt AS (SELECT event_type, vc, count(*) AS cnt FROM e GROUP BY event_type, vc),
       |${rankQuantilesSql("vt", "event_type", "vc",
            Seq(("p50", 50), ("p90", 90), ("p99", 99)), weight = Some("cnt"))}
       |SELECT event_type,
       |  CAST(p50_b AS DOUBLE) / 10000.0 AS p50,
       |  CAST(p90_b AS DOUBLE) / 10000.0 AS p90,
       |  CAST(p99_b AS DOUBLE) / 10000.0 AS p99,
       |  n
       |FROM rqq JOIN rqnt USING (event_type)
       |ORDER BY event_type""".stripMargin

  // --- statistical aggregates from exact moments (deterministic corr) ---

  /** Mean, sample stddev, and Pearson correlation of (value, props.k) per
    * event type — WITHOUT `stddev`/`corr` builtins: Spark's streaming
    * (Welford-style) moment merges are partition-order-dependent in the
    * low bits and differ from DuckDB's algorithm, so the builtins can
    * never be hash-compared cross-engine. Instead the five raw moments
    * (Σx, Σx², Σy, Σy², Σxy) accumulate EXACTLY — value is 2-decimal data
    * so DECIMAL(11,2) holds it exactly and every moment's unscaled value
    * stays under 2⁵³ (exact decimal→double) — and the final formulas run
    * in double with the SAME expression shape as the oracle: identical
    * inputs, identical op order, identical doubles. Order-independent,
    * any parallelism. The builtins stay available for tolerance use; this
    * is the reproducible path.
    */
  def qEventValueStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val x = $"value".cast(DecimalType(11, 2))
    val y = get_json_object($"props", "$.k").cast("long").cast(DecimalType(11, 0))
    val agg = Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"), sum(x * x).as("sxx"),
        sum(y).as("sy"), sum(y * y).as("syy"),
        sum(x * y).as("sxy"))
    val nD = $"n".cast("double")
    val sxD = $"sx".cast("double"); val sxxD = $"sxx".cast("double")
    val syD = $"sy".cast("double"); val syyD = $"syy".cast("double")
    val sxyD = $"sxy".cast("double")
    agg.select(
        $"event_type", $"n",
        (sxD / nD).as("mean_value"),
        sqrt((sxxD - sxD * sxD / nD) / (nD - lit(1.0))).as("stddev_value"),
        ((nD * sxyD - sxD * syD) /
          sqrt((nD * sxxD - sxD * sxD) * (nD * syyD - syD * syD))).as("corr_value_k"))
      .orderBy($"event_type")
  }

  val qEventValueStatsSql: String =
    """WITH m AS (
      |  SELECT event_type, count(*) AS n,
      |    sum(CAST(value AS DECIMAL(11,2))) AS sx,
      |    sum(CAST(value AS DECIMAL(11,2)) * CAST(value AS DECIMAL(11,2))) AS sxx,
      |    sum(CAST(CAST(props->>'k' AS BIGINT) AS DECIMAL(11,0))) AS sy,
      |    sum(CAST(CAST(props->>'k' AS BIGINT) AS DECIMAL(11,0)) * CAST(CAST(props->>'k' AS BIGINT) AS DECIMAL(11,0))) AS syy,
      |    sum(CAST(value AS DECIMAL(11,2)) * CAST(CAST(props->>'k' AS BIGINT) AS DECIMAL(11,0))) AS sxy
      |  FROM events GROUP BY event_type
      |)
      |SELECT event_type, n,
      |  CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_value,
      |  sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) AS stddev_value,
      |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |    sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |         (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr_value_k
      |FROM m ORDER BY event_type""".stripMargin

  // --- custom typed Aggregator: log2-histogram sketch of event values ---

  /** Per-type value distribution through the custom
    * [[graft.functions.LogHistogram]] Aggregator (constant 128-byte
    * mergeable buffer per group — the Aggregator extension type in
    * action), exploded to (bucket, n) rows. The oracle recomputes the
    * same histogram with a plain CASE+GROUP BY — an independent
    * formulation validating the aggregator's reduce/merge/finish path,
    * including its map-side partial aggregation.
    */
  def qValueLogHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val histo = udaf(graft.functions.LogHistogram, Encoders.scalaDouble)
    Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(histo($"value").as("h"))
      .select($"event_type", posexplode($"h").as(Seq("bucket", "n")))
      .filter($"n" > 0)
      .orderBy($"event_type", $"bucket")
  }

  val qValueLogHistogramSql: String = {
    val edges = graft.functions.LogHistogram.thresholds
    // bucket = number of exact power-of-two edges <= v (same comparisons
    // as the Scala loop; no log2 — see LogHistogram determinism note)
    val bucketExpr = edges.zipWithIndex
      .map { case (t, i) => s"WHEN value < $t THEN $i" }
      .mkString("CASE ", " ", s" ELSE ${edges.length} END")
    s"""SELECT event_type, bucket, count(*) AS n FROM (
       |  SELECT event_type, CAST($bucketExpr AS INT) AS bucket FROM events)
       |GROUP BY event_type, bucket
       |ORDER BY event_type, bucket""".stripMargin
  }

  // --- semi-structured: JSON property extraction over events.props ---

  /** JSON-column operators over `events.props` (`{"k": <int>}`): both the
    * path-string idiom (`get_json_object`) and the typed-schema idiom
    * (`from_json` + field access), with an in-query agreement check
    * (`n_parse_mismatch` must be 0 — both extraction routes and both
    * engines must read the same values). Bucketing uses floor-then-cast,
    * never bare int cast (Spark truncates, DuckDB rounds — verify-skill
    * rule).
    *
    * Scale: JSON parsing is a narrow per-row projection; `from_json` with
    * an explicit schema avoids per-row schema inference. At 100 TB the
    * real advice is to materialize hot JSON fields as typed columns at
    * ingest — which is exactly what this projection is.
    */
  def qEventPropsJson(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val parsed = Tables.events(spark, sfDir).select(
      $"event_type",
      get_json_object($"props", "$.k").cast("int").as("k_path"),
      from_json($"props", StructType.fromDDL("k INT")).getField("k").as("k_typed"))
    parsed
      .groupBy($"event_type", floor($"k_typed" / 10.0).cast("int").as("k_decade"))
      .agg(
        count(lit(1)).as("n"),
        min($"k_typed").as("k_min"),
        max($"k_typed").as("k_max"),
        sum(when($"k_path" === $"k_typed", 0L).otherwise(1L)).as("n_parse_mismatch"))
      .orderBy($"event_type", $"k_decade")
  }

  val qEventPropsJsonSql: String =
    """WITH parsed AS (
      |  SELECT event_type,
      |    CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_path,
      |    CAST(props->>'k' AS INTEGER) AS k_typed
      |  FROM events
      |)
      |SELECT event_type, CAST(floor(k_typed / 10.0) AS INTEGER) AS k_decade,
      |  count(*) AS n, min(k_typed) AS k_min, max(k_typed) AS k_max,
      |  CAST(sum(CASE WHEN k_path = k_typed THEN 0 ELSE 1 END) AS BIGINT) AS n_parse_mismatch
      |FROM parsed
      |GROUP BY event_type, CAST(floor(k_typed / 10.0) AS INTEGER)
      |ORDER BY event_type, k_decade""".stripMargin

  // --- session windows: gap-based sessionization (batch session_window) ---

  /** Session gap. 12 h fits the synthetic event cadence (median inter-event
    * gap ≈ 7 h per user), merging 10 000 events into ~3 300 sessions at
    * sf0.01 — enough merging that the operator is actually exercised.
    */
  val sessionGapHours = 12

  /** Gap-based sessionization with Spark's native `session_window`
    * (the batch form of the streaming operator — see
    * [[graft.streaming.IncrementalPipeline]] for the streaming side).
    * Semantics: a session's window is [first_ts, last_ts + gap); an event
    * exactly `gap` after its predecessor starts a NEW session (window end
    * is exclusive). The oracle mirrors this with a gaps-and-islands
    * `lag`+`sum` — note `>=` in the new-session predicate, matching the
    * exclusive end.
    *
    * Scale: session_window is one shuffle on user_id, then a per-key sort
    * + merge — the same cost shape as any groupBy(user). No window-function
    * global sort; the final ORDER BY is oracle-protocol only.
    */
  def qEventSessions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy($"user_id", session_window($"ts", s"$sessionGapHours hours"))
      .agg(count(lit(1)).as("n_events"), sum(dec($"value")).cast("double").as("total_value"))
      .select($"user_id",
        $"session_window.start".as("session_start"),
        $"session_window.end".as("session_end"),
        $"n_events", $"total_value")
      .orderBy($"user_id", $"session_start")
  }

  val qEventSessionsSql: String =
    s"""WITH o AS (
       |  SELECT user_id, ts, event_id, value,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR ts - lag(ts) OVER w >= INTERVAL $sessionGapHours HOUR
       |         THEN 1 ELSE 0 END AS new_s
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |),
       |s AS (
       |  SELECT user_id, ts, event_id, value,
       |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                     ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM o
       |)
       |SELECT user_id, min(ts) AS session_start,
       |  max(ts) + INTERVAL $sessionGapHours HOUR AS session_end,
       |  count(*) AS n_events,
       |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
       |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin

  // --- as-of join: last-click attribution (merge-based, single shuffle) ---

  /** As-of join — each purchase matched to the user's most recent click
    * at-or-before it (classic last-touch attribution). Spark has no ASOF
    * JOIN operator; the scalable formulation is the MERGE form: union the
    * two event streams, one window pass per user carrying the running
    * last-click forward, keep the purchase rows. ONE shuffle on user_id,
    * no range-condition join — a range/theta join here would explode to
    * per-pair evaluation (O(clicks × purchases) within each user), which
    * is exactly what kills naive as-of joins at 100 TB; the merge form is
    * linear in events per user.
    *
    * Determinism: clicks are pre-deduped to one per (user, ts) — min
    * event_id — because an as-of match at a tied timestamp is otherwise
    * ambiguous (both engines would pick an arbitrary row). Within the
    * window, same-ts clicks sort BEFORE purchases (kind 0 < 1), matching
    * the oracle's inclusive `p.ts >= c.ts` ASOF semantics.
    */
  def qEventAttributionAsof(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts").agg(min($"event_id").as("click_event_id"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id".as("purchase_event_id"))
    val merged = clicks
      .select($"user_id", $"ts", lit(0).as("kind"), $"click_event_id",
        lit(null).cast("long").as("purchase_event_id"))
      .unionAll(purchases.select($"user_id", $"ts", lit(1).as("kind"),
        lit(null).cast("long").as("click_event_id"), $"purchase_event_id"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", $"kind", coalesce($"click_event_id", $"purchase_event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn("last_click_event_id", last($"click_event_id", ignoreNulls = true).over(w))
      .withColumn("last_click_ts", last(when($"kind" === 0, $"ts"), ignoreNulls = true).over(w))
      .filter($"kind" === 1)
      .select($"user_id", $"purchase_event_id", $"ts".as("purchase_ts"),
        $"last_click_event_id", $"last_click_ts",
        (unix_micros($"ts") - unix_micros($"last_click_ts")).as("gap_us"))
      .orderBy($"user_id", $"purchase_ts", $"purchase_event_id")
  }

  /** Oracle uses DuckDB's NATIVE ASOF LEFT JOIN — independent semantics,
    * same result as the merge-window form.
    */
  val qEventAttributionAsofSql: String =
    """WITH clicks AS (
      |  SELECT user_id, ts, min(event_id) AS click_event_id
      |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
      |),
      |p AS (
      |  SELECT user_id, event_id AS purchase_event_id, ts
      |  FROM events WHERE event_type = 'purchase'
      |)
      |SELECT p.user_id, p.purchase_event_id, p.ts AS purchase_ts,
      |  c.click_event_id AS last_click_event_id, c.ts AS last_click_ts,
      |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
      |FROM p ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.user_id, purchase_ts, purchase_event_id""".stripMargin

  // --- multi-touch attribution: first / last / linear credit models ---

  /** Marketing-attribution window in µs (7 days). */
  val attribWindowUs: Long = 7L * 86400L * 1000000L

  /** Multi-touch attribution report — the three credit models every
    * marketing warehouse reconciles, computed in ONE pass over the same
    * purchase×touch join: for each purchase, its touches (view / click /
    * signup acting as channels) in the strict 7-day lookback window;
    * then per channel (a) FIRST-touch wins, (b) LAST-touch wins
    * ([[qEventAttributionAsof]]'s model, here via the join form), and
    * (c) LINEAR — each of a purchase's k touches gets 1/k credit.
    *
    * Determinism: first/last pick by the (µs, event_id) TOTAL order —
    * `min_by`/`max_by` over a struct, mirrored in DuckDB as
    * `arg_min`/`arg_max` on the HUGEINT-encoded scalar key (µs·10⁷+id;
    * arg keys must be scalar). Linear credit is INTEGER
    * parts-per-million, `1000000 div k` per touch — floor division both
    * engines share; Σppm ≤ 10⁶·purchases with the remainder dropped, so
    * no order-dependent double summation anywhere.
    *
    * Scale (100 TB): the lookback join is an equi-join on user_id with
    * the window as residual — fan-out bounded by per-user activity in 7
    * days (human-scale), never a time-bucketed cross of the corpus. The
    * joined frame is persisted once and feeds both the per-purchase and
    * per-(purchase,channel) aggregates; everything after is
    * channel-cardinality-sized.
    */
  def qEventAttribMultiTouch(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("tu"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("p_id"), $"tu".as("p_tu"))
    val t = ev.filter($"event_type".isin("view", "click", "signup"))
      .select($"user_id", $"event_id".as("t_id"), $"event_type".as("channel"),
        $"tu".as("t_tu"))
    val j = p.join(t, Seq("user_id"))
      .filter($"t_tu" < $"p_tu" && $"t_tu" >= $"p_tu" - attribWindowUs)
      .select($"p_id", $"channel", $"t_tu", $"t_id")
      .persist()
    j.count() // eager: both aggregates below consume it
    val per = j.groupBy($"p_id").agg(
      count(lit(1)).as("k"),
      min_by($"channel", struct($"t_tu", $"t_id")).as("first_ch"),
      max_by($"channel", struct($"t_tu", $"t_id")).as("last_ch"))
    val perCh = j.groupBy($"p_id", $"channel").agg(count(lit(1)).as("c"))
    val linear = perCh.join(per.select($"p_id", $"k"), "p_id")
      .groupBy($"channel")
      .agg(sum($"c").as("n_touches"),
        sum($"c" * expr("1000000 div k")).as("linear_ppm"))
    val firsts = per.groupBy($"first_ch".as("channel")).agg(count(lit(1)).as("n_first"))
    val lasts = per.groupBy($"last_ch".as("channel")).agg(count(lit(1)).as("n_last"))
    linear
      .join(firsts, Seq("channel"), "left")
      .join(lasts, Seq("channel"), "left")
      .select($"channel", $"n_touches",
        coalesce($"n_first", lit(0L)).as("n_first"),
        coalesce($"n_last", lit(0L)).as("n_last"),
        $"linear_ppm")
      .orderBy($"channel")
  }

  val qEventAttribMultiTouchSql: String =
    s"""WITH p AS (
      |  SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_tu
      |  FROM events WHERE event_type = 'purchase'
      |),
      |t AS (
      |  SELECT user_id, event_id AS t_id, event_type AS channel, epoch_us(ts) AS t_tu
      |  FROM events WHERE event_type IN ('view', 'click', 'signup')
      |),
      |j AS (
      |  SELECT p.p_id, t.channel, t.t_tu, t.t_id
      |  FROM p JOIN t ON p.user_id = t.user_id
      |    AND t.t_tu < p.p_tu AND t.t_tu >= p.p_tu - $attribWindowUs
      |),
      |per AS (
      |  SELECT p_id, CAST(count(*) AS BIGINT) AS k,
      |    arg_min(channel, CAST(t_tu AS HUGEINT) * 10000000 + t_id) AS first_ch,
      |    arg_max(channel, CAST(t_tu AS HUGEINT) * 10000000 + t_id) AS last_ch
      |  FROM j GROUP BY p_id
      |),
      |per_ch AS (
      |  SELECT p_id, channel, CAST(count(*) AS BIGINT) AS c
      |  FROM j GROUP BY p_id, channel
      |),
      |lin AS (
      |  SELECT channel, CAST(sum(c) AS BIGINT) AS n_touches,
      |    CAST(sum(c * (1000000 // k)) AS BIGINT) AS linear_ppm
      |  FROM per_ch JOIN per USING (p_id) GROUP BY channel
      |),
      |f AS (SELECT first_ch AS channel, CAST(count(*) AS BIGINT) AS n_first
      |      FROM per GROUP BY first_ch),
      |l AS (SELECT last_ch AS channel, CAST(count(*) AS BIGINT) AS n_last
      |      FROM per GROUP BY last_ch)
      |SELECT channel, n_touches,
      |  coalesce(n_first, CAST(0 AS BIGINT)) AS n_first,
      |  coalesce(n_last, CAST(0 AS BIGINT)) AS n_last, linear_ppm
      |FROM lin
      |LEFT JOIN f USING (channel)
      |LEFT JOIN l USING (channel)
      |ORDER BY channel""".stripMargin

  // --- keep-latest compaction (upsert semantics via max_by aggregation) ---

  /** Latest event per user — the compaction step of every upsert/CDC
    * pipeline (keep the newest record per key). Implemented as a
    * `max_by(payload, (ts, event_id))` AGGREGATION, not a window: the agg
    * form partial-aggregates map-side (each task keeps one candidate per
    * key before the shuffle), so the exchange carries |keys| rows instead
    * of |events| — the window form (`row_number() = 1`) must shuffle and
    * sort EVERY row. At 100 TB that is the difference between a
    * keys-sized and an events-sized shuffle. AnalyticsSpec asserts both
    * forms agree; the oracle uses the window form as an independent
    * formulation.
    */
  def qEventLatestPerUser(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy($"user_id")
      .agg(
        max_by(struct($"event_id", $"event_type", $"value"), struct($"ts", $"event_id")).as("m"),
        max($"ts").as("last_ts"),
        count(lit(1)).as("n_events"))
      .select($"user_id", $"m.event_id".as("event_id"), $"last_ts",
        $"m.event_type".as("event_type"), $"m.value".as("value"), $"n_events")
      .orderBy($"user_id")
  }

  val qEventLatestPerUserSql: String =
    """SELECT user_id, event_id, ts AS last_ts, event_type, value, n_events FROM (
      |  SELECT user_id, event_id, ts, event_type, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n_events
      |  FROM events) t
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  // --- full rank-family window over supplier balances ---

  /** rank / dense_rank / percent_rank / cume_dist in one windowed pass —
    * the remaining rank-family members (row_number and ntile live in
    * [[qTopOrdersPerPriority]] / [[qCustomerSpendQuartiles]]). The window
    * orders ONLY by the measure, so tied balances genuinely tie (rank
    * skips, dense_rank doesn't) — all four values depend solely on the
    * sort KEY, so intra-tie row order can't leak into the result; the
    * top-3 filter keeps every tied row (a set, not a sample). percent_rank
    * and cume_dist are integer-ratio doubles — identical in both engines.
    *
    * Scale: partitioned by nation (bounded cardinality × bounded partition
    * size here; for skewed partitions the qTopOrdersPerPriority salting
    * pattern applies).
    */
  def qSupplierRankFamily(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"s_nationkey").orderBy($"s_acctbal".desc)
    Tables.supplier(spark, sfDir)
      .withColumn("rnk", rank().over(w))
      .withColumn("dense_rnk", dense_rank().over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .filter($"rnk" <= 3)
      .select($"s_nationkey", $"rnk", $"dense_rnk", $"pct_rank", $"cume",
        $"s_suppkey", $"s_acctbal")
      .orderBy($"s_nationkey", $"rnk", $"s_suppkey")
  }

  val qSupplierRankFamilySql: String =
    """SELECT s_nationkey, rnk, dense_rnk, pct_rank, cume, s_suppkey, s_acctbal FROM (
      |  SELECT s_nationkey, s_suppkey, s_acctbal,
      |    CAST(rank() OVER w AS INTEGER) AS rnk,
      |    CAST(dense_rank() OVER w AS INTEGER) AS dense_rnk,
      |    percent_rank() OVER w AS pct_rank,
      |    cume_dist() OVER w AS cume
      |  FROM supplier
      |  WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC)) t
      |WHERE rnk <= 3
      |ORDER BY s_nationkey, rnk, s_suppkey""".stripMargin

  // --- TPC-H Q17 shape: aggregate-then-join-back (per-key threshold) ---

  /** Small-quantity revenue by brand — Q17's correlated-subquery shape
    * done the distributed way: materialize the per-part average once
    * (one groupBy), join it back to lineitem, filter below the per-part
    * threshold. A literal correlated subquery would re-aggregate per
    * probe row; the agg-then-join form costs one extra shuffle of the
    * (small) per-key aggregate table and is the standard Spark plan. The
    * threshold compare is pure double arithmetic on an exact
    * decimal-sum-derived average — identical in both engines, so rows at
    * the boundary cannot diverge.
    */
  def q17SmallQtyRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val perPart = Tables.lineitem(spark, sfDir)
      .groupBy($"l_partkey")
      .agg((sum(dec($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"))
    Tables.lineitem(spark, sfDir)
      .join(perPart, "l_partkey")
      .filter($"l_quantity" < lit(0.2) * $"avg_qty")
      .join(Tables.part(spark, sfDir), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(
        sum(dec($"l_extendedprice")).cast(DecimalType(21, 4)).cast("double").as("revenue"),
        count(lit(1)).as("n_small"))
      .orderBy($"p_brand")
  }

  val q17SmallQtyRevenueSql: String =
    """WITH pa AS (
      |  SELECT l_partkey,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty
      |  FROM lineitem GROUP BY l_partkey
      |)
      |SELECT p_brand,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(21,4)) AS DOUBLE) AS revenue,
      |  count(*) AS n_small
      |FROM lineitem
      |JOIN pa USING (l_partkey)
      |JOIN part ON l_partkey = p_partkey
      |WHERE l_quantity < 0.2 * avg_qty
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  // --- CUBE (full grouping-sets lattice; completes rollup's coverage) ---

  def qEventCube(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .cube($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"), sum(dec($"value")).cast("double").as("total_value"))
      .orderBy($"event_type".asc_nulls_first, $"day".asc_nulls_first)
  }

  val qEventCubeSql: String =
    """SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM events GROUP BY CUBE (event_type, CAST(ts AS DATE))
      |ORDER BY event_type ASC NULLS FIRST, day ASC NULLS FIRST""".stripMargin

  // --- TPC-H Q4 shape: EXISTS as a LEFT SEMI join between two FACTS ---

  /** Late-shipment census by order priority — Q4's correlated EXISTS,
    * planned the distributed way: a LEFT SEMI join of orders against
    * lineitem on the order key with the lateness comparison as a residual
    * (shipped more than 60 days after the order date; this schema carries
    * no commit/receipt dates). SEMI is the right operator at scale: the
    * probe side emits each order AT MOST once no matter how many late
    * lines it has (an inner join + distinct would fan out to the line
    * count and then pay a dedup shuffle), and the build side ships only
    * (l_orderkey, l_shipdate) — two columns of the fact, not the fact.
    * Both sides shuffle once on the order key; the aggregate after is
    * five groups, map-side combined.
    */
  def q4LateOrders(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val late = Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_shipdate")
    val o = Tables.orders(spark, sfDir)
    o.join(late,
        o("o_orderkey") === late("l_orderkey") &&
          late("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_late_orders"))
      .orderBy($"o_orderpriority")
  }

  val q4LateOrdersSql: String =
    """SELECT o_orderpriority, count(*) AS n_late_orders
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // --- TPC-H Q16 shape: NOT IN (null-aware anti join) + DISTINCT agg ---

  /** Supplier census per (brand, size) excluding blacklisted suppliers —
    * Q16's shape on this schema (lineitem is the part↔supplier bridge;
    * there is no partsupp). Expressed through the SQL surface because
    * `NOT IN (subquery)` is its own OPERATOR in Spark: a null-aware anti
    * join, stricter than `left_anti` (one NULL in the subquery empties
    * the result — three-valued logic), planned as a broadcast join with
    * the null-awareness flag. The blacklist subquery is tiny (suppliers
    * in debt) and broadcasts; the count(DISTINCT) pays the standard
    * two-phase expand+agg, keyed by the group columns.
    */
  def q16SupplierCensus(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("g_lineitem")
    Tables.part(spark, sfDir).createOrReplaceTempView("g_part")
    Tables.supplier(spark, sfDir).createOrReplaceTempView("g_supplier")
    spark.sql(
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM g_lineitem JOIN g_part ON l_partkey = p_partkey
        |WHERE p_size IN (1, 5, 9, 13)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM g_supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin)
  }

  val q16SupplierCensusSql: String =
    """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_size IN (1, 5, 9, 13)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin

  // --- TPC-H Q22 shape: global scalar subquery + anti join ---

  /** Rich-but-dormant customers per nation — Q22's plan shape: a GLOBAL
    * scalar aggregate (average positive balance) joined to every probe
    * row, then an anti join against recent orders. The scalar side is a
    * 1-row broadcast cross join — the constant reaches every executor
    * with zero shuffle of the customer side (the [[graft.ext.Similarity]]
    * quantizer pattern applied to a scalar); a correlated rewrite would
    * re-aggregate per row. The anti join shuffles on the customer key
    * with only (o_custkey) shipped from orders after its date filter.
    * Threshold arithmetic is the exact-decimal-sum-derived double, so
    * boundary rows cannot diverge between engines.
    */
  def q22DormantRich(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, sfDir)
    val avgBal = cust.filter($"c_acctbal" > 0)
      .agg((sum(dec($"c_acctbal")).cast("double") / count(lit(1))).as("avg_bal"))
    val recent = Tables.orders(spark, sfDir)
      .filter($"o_orderdate" >= lit("2001-06-01").cast("timestamp"))
      .select($"o_custkey")
    cust.crossJoin(broadcast(avgBal))
      .filter($"c_acctbal" > $"avg_bal")
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_custs"),
        sum(dec($"c_acctbal")).cast("double").as("total_bal"))
      .orderBy($"c_nationkey")
  }

  val q22DormantRichSql: String =
    """WITH ab AS (
      |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_bal
      |  FROM customer WHERE c_acctbal > 0
      |)
      |SELECT c_nationkey, count(*) AS n_custs,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
      |FROM customer, ab
      |WHERE c_acctbal > avg_bal
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '2001-06-01')
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  // --- Funnel analysis: ordered step conversion per user ---

  /** Week-index epoch for cohort arithmetic: the Monday the synthetic
    * event stream starts on. Weeks are integer day-diffs `div` 7 — no
    * engine-specific week-truncation rules (ISO vs US week starts) can
    * disagree on integer arithmetic.
    */
  val cohortEpoch = "2024-01-01"

  /** Ordered funnel: how many users complete signup → click → purchase
    * IN ORDER (each later step strictly after the earlier one — a click
    * before the signup does not count). The product-analytics staple that
    * needs per-user sequence state, not just per-step counts.
    *
    * Mechanics: three same-partition windows (no ORDER BY — whole-
    * partition frames) compute the per-user step timestamps t1 =
    * min(signup ts), t2 = min(click ts > t1), t3 = min(purchase ts > t2);
    * each window may reference the previous one's result because they
    * evaluate in successive projections. ONE user_id exchange serves all
    * three (same partitioning), then a per-user reduction and a 3-row
    * conditional-count summary.
    *
    * Scale (100 TB): the user exchange is the only data-sized shuffle,
    * identical to any per-user sessionization; window state is O(1) per
    * user (three mins). Conversions are double divisions of exact longs.
    */
  def qEventFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id")
    val stepped = Tables.events(spark, sfDir)
      .withColumn("t1", min(when($"event_type" === "signup", $"ts")).over(w))
      .withColumn("t2", min(when($"event_type" === "click" && $"ts" > $"t1", $"ts")).over(w))
      .withColumn("t3", min(when($"event_type" === "purchase" && $"ts" > $"t2", $"ts")).over(w))
    val perUser = stepped.groupBy($"user_id")
      .agg(min($"t1").as("t1"), min($"t2").as("t2"), min($"t3").as("t3"))
    val grid = perUser.agg(
      count(lit(1)).as("n_users"),
      count($"t1").as("n1"), count($"t2").as("n2"), count($"t3").as("n3"))
    def row(idx: Int, name: String, n: Column, prev: Column): Column =
      struct(lit(idx).as("step_idx"), lit(name).as("step"), n.as("n_users"),
        (n.cast("double") / prev.cast("double")).as("conversion"))
    grid.select(explode(array(
        row(1, "signup", $"n1", $"n_users"),
        row(2, "click_after_signup", $"n2", $"n1"),
        row(3, "purchase_after_click", $"n3", $"n2"))).as("s"))
      .select($"s.*")
      .orderBy($"step_idx")
  }

  val qEventFunnelSql: String =
    """WITH s1 AS (
      |  SELECT user_id, ts, event_type,
      |    min(CASE WHEN event_type = 'signup' THEN ts END)
      |      OVER (PARTITION BY user_id) AS t1
      |  FROM events
      |),
      |s2 AS (
      |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
      |    OVER (PARTITION BY user_id) AS t2
      |  FROM s1
      |),
      |s3 AS (
      |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
      |    OVER (PARTITION BY user_id) AS t3
      |  FROM s2
      |),
      |per_user AS (
      |  SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3
      |  FROM s3 GROUP BY user_id
      |),
      |grid AS (
      |  SELECT count(*) AS n_users, count(t1) AS n1, count(t2) AS n2, count(t3) AS n3
      |  FROM per_user
      |)
      |SELECT step_idx, step, n_users, conversion FROM (
      |  SELECT 1 AS step_idx, 'signup' AS step, n1 AS n_users,
      |    CAST(n1 AS DOUBLE) / CAST(n_users AS DOUBLE) AS conversion FROM grid
      |  UNION ALL
      |  SELECT 2, 'click_after_signup', n2, CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE) FROM grid
      |  UNION ALL
      |  SELECT 3, 'purchase_after_click', n3, CAST(n3 AS DOUBLE) / CAST(n2 AS DOUBLE) FROM grid)
      |ORDER BY step_idx""".stripMargin

  // --- Cohort retention: first-seen week × activity-week matrix ---

  /** Cohort retention matrix: users grouped by their FIRST active week
    * (cohort), tracked across subsequent weeks — the `(cohort_week,
    * week_offset) → active users / cohort size` table behind every
    * retention curve.
    *
    * Mechanics: week index = integer days-since-[[cohortEpoch]] `div` 7
    * (pure integer arithmetic — both engines agree by construction,
    * where ISO-week truncation rules would not). Per-user cohort = min
    * week (one user-keyed agg); the activity matrix joins cohorts back
    * to per-user-week activity on user_id and distinct-counts users per
    * (cohort, offset) cell.
    *
    * Scale (100 TB): two user-keyed exchanges (distinct weeks, cohort
    * agg) that AQE can co-partition, then a cells-sized aggregation
    * (weeks² rows). The matrix is inherently tiny; the user-keyed work
    * is the same partitioning the funnel/sessionization family already
    * pays — in a production pipeline all of them share one
    * user-bucketed layout ([[graft.etl.Bucketing]]).
    */
  def qEventCohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val weekly = Tables.events(spark, sfDir)
      .select($"user_id",
        // day-diffs are ≥ 0 by construction (epoch = stream start), so
        // floor(x/7) ≡ x div 7 and the double round-trip is exact
        floor(datediff(to_date($"ts"), to_date(lit(cohortEpoch))) / 7)
          .cast("int").as("wk"))
      .distinct()
    val cohorts = weekly.groupBy($"user_id").agg(min($"wk").as("cohort_wk"))
    val sizes = cohorts.groupBy($"cohort_wk")
      .agg(countDistinct($"user_id").as("n_cohort"))
    weekly.join(cohorts, "user_id")
      .groupBy($"cohort_wk", ($"wk" - $"cohort_wk").as("week_offset"))
      .agg(countDistinct($"user_id").as("n_active"))
      .join(sizes, "cohort_wk")
      .select($"cohort_wk", $"week_offset", $"n_active", $"n_cohort",
        ($"n_active".cast("double") / $"n_cohort".cast("double")).as("retention"))
      .orderBy($"cohort_wk", $"week_offset")
  }

  val qEventCohortRetentionSql: String =
    s"""WITH weekly AS (
       |  SELECT DISTINCT user_id,
       |    CAST(datediff('day', DATE '$cohortEpoch', CAST(ts AS DATE)) // 7 AS INTEGER) AS wk
       |  FROM events
       |),
       |cohorts AS (
       |  SELECT user_id, min(wk) AS cohort_wk FROM weekly GROUP BY user_id
       |),
       |sizes AS (
       |  SELECT cohort_wk, count(DISTINCT user_id) AS n_cohort FROM cohorts GROUP BY cohort_wk
       |)
       |SELECT cohort_wk, wk - cohort_wk AS week_offset,
       |  count(DISTINCT weekly.user_id) AS n_active,
       |  any_value(n_cohort) AS n_cohort,
       |  CAST(count(DISTINCT weekly.user_id) AS DOUBLE) / CAST(any_value(n_cohort) AS DOUBLE) AS retention
       |FROM weekly
       |JOIN cohorts USING (user_id)
       |JOIN sizes USING (cohort_wk)
       |GROUP BY cohort_wk, week_offset
       |ORDER BY cohort_wk, week_offset""".stripMargin

  // --- TPC-H Q15 shape: argmax over an aggregate via 1-row broadcast ---

  /** Top supplier(s) by Q1-1996 revenue — Q15's correlated `= (SELECT
    * max(...))` done the distributed way: aggregate revenue per supplier
    * ONCE (decimal-exact, so the max-equality cannot be a float
    * coincidence), reduce to a 1-row max, and broadcast that row back
    * against the aggregate as a join condition. Ties all surface (Q15
    * semantics). The alternative — a window max over the whole aggregate
    * — funnels every supplier row through Exchange SinglePartition; the
    * 1-row broadcast keeps the aggregate partitioned ([[q22DormantRich]]
    * pattern). Revenue is exposed as DOUBLE only at the output boundary.
    */
  def q15TopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val rev = Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit("1996-01-01") && $"l_shipdate" < lit("1996-04-01"))
      .groupBy($"l_suppkey")
      .agg(sum(revenue($"l_extendedprice", $"l_discount"))
        .cast(DecimalType(21, 4)).as("total_rev_d"))
    val mx = rev.agg(max($"total_rev_d").as("mx"))
    rev.join(broadcast(mx), $"total_rev_d" === $"mx")
      .join(Tables.supplier(spark, sfDir), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"total_rev_d".cast("double").as("total_rev"))
      .orderBy($"s_suppkey")
  }

  val q15TopSupplierSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(21,4)) AS total_rev_d
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey
      |)
      |SELECT s_suppkey, s_name, CAST(total_rev_d AS DOUBLE) AS total_rev
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_rev_d = (SELECT max(total_rev_d) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  // --- TPC-H Q18 shape: HAVING-gated agg joined back to its parents ---

  /** Large-volume-order threshold (sum of quantities per order). */
  val q18MinQty = 300

  /** Large-volume customers — Q18's shape: aggregate lineitem per order,
    * gate on the HAVING threshold FIRST (the aggregate shrinks ~100×
    * before any join), then join the survivors back to orders and
    * customers. The order join reuses the aggregation's orderkey
    * partitioning (no extra exchange); the customer probe is survivor-
    * sized. Quantities sum as exact decimals so the threshold gate is
    * reproducible; the output column widens to DOUBLE at the boundary.
    */
  def q18LargeOrders(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val big = Tables.lineitem(spark, sfDir)
      .groupBy($"l_orderkey")
      .agg(sum(dec($"l_quantity")).as("sum_qty_d"))
      .filter($"sum_qty_d" > q18MinQty)
    big.join(Tables.orders(spark, sfDir), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, sfDir), $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"o_orderkey",
        $"o_totalprice", $"sum_qty_d".cast("double").as("sum_qty"))
      .orderBy($"o_orderkey")
  }

  val q18LargeOrdersSql: String =
    s"""WITH big AS (
       |  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty_d
       |  FROM lineitem GROUP BY l_orderkey
       |  HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > $q18MinQty
       |)
       |SELECT c_custkey, c_name, o_orderkey, o_totalprice,
       |  CAST(sum_qty_d AS DOUBLE) AS sum_qty
       |FROM big
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |ORDER BY o_orderkey""".stripMargin

  // --- Winsorized statistics: percentile-clipped robust mean ---

  /** Winsorized per-type statistics: clip `value` to its own type's exact
    * interpolated [p05, p95] band, then report the clipped mean next to
    * the raw mean and the clip counts — the robust-mean pass that stops a
    * fat-tailed metric from being steered by outliers.
    *
    * Determinism: the percentile bounds come from the engine-free
    * [[rankQuantiles]] integer kernel (exact value×10⁴ fixed point —
    * ported off the native `percentile`↔`quantile_cont` lerp round 11),
    * so the clip COMPARISONS are pure BIGINT: a value clips iff
    * `vc·100 < p05_b` — no float boundary to sit on. Both means are sums
    * of exact integer fixed point (cnt-weighted cents / clipped
    * ten-thousandths) with ONE closing fixed-shape double division each;
    * the cnt·value products widen to DECIMAL(19,0)×(19,0) BEFORE the
    * multiply, so no int64 product exists anywhere in the mean path.
    *
    * Scale (100 TB): the corpus is scanned ONCE into the persisted
    * (type, cent) grid table; the kernel's bound selection AND the
    * clip/mean aggregation all run grid-sized (every row with the same
    * cent value clips identically, so per-row work is redundant by
    * construction — the cnt weight carries it).
    */
  def qEventWinsorized(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val vt = centEvents(spark, sfDir)
      .groupBy($"event_type", $"vc").agg(count(lit(1)).as("cnt"))
      .persist()
    vt.count() // eager: parallel kernel branches must not re-derive the grid
    val bounds = rankQuantiles(vt, "event_type", "vc",
      Seq(("p05", 5), ("p95", 95)), weight = Some("cnt"))
    vt.join(broadcast(bounds), "event_type")
      .select($"event_type", $"cnt", $"vc", ($"vc" * 100).as("vb"),
        $"p05_b", $"p95_b")
      .groupBy($"event_type")
      .agg(
        sum($"cnt").as("n"),
        sum(when($"vb" < $"p05_b", $"cnt").otherwise(0L)).as("n_clip_low"),
        sum(when($"vb" > $"p95_b", $"cnt").otherwise(0L)).as("n_clip_high"),
        // widen BEFORE the multiply: cnt·vb in int64 would overflow at a
        // skewed 100 TB cell (cnt ~1e11 × vb ~1e8 > 2⁶³); (19,0)×(19,0)
        // products stay inside both engines' precision-38 cap
        (sum($"cnt".cast(DecimalType(19, 0)) * $"vc".cast(DecimalType(19, 0)))
          .cast("double") / sum($"cnt") / 100.0).as("raw_mean"),
        (sum($"cnt".cast(DecimalType(19, 0)) *
          greatest(least($"vb", $"p95_b"), $"p05_b").cast(DecimalType(19, 0)))
          .cast("double") / sum($"cnt") / 10000.0).as("winsor_mean"))
      .orderBy($"event_type")
  }

  val qEventWinsorizedSql: String =
    s"""WITH $centEventsSql,
       |vt AS (SELECT event_type, vc, count(*) AS cnt FROM e GROUP BY event_type, vc),
       |${rankQuantilesSql("vt", "event_type", "vc",
            Seq(("p05", 5), ("p95", 95)), weight = Some("cnt"))}
       |SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n,
       |  CAST(sum(CASE WHEN vc * 100 < p05_b THEN cnt ELSE 0 END) AS BIGINT) AS n_clip_low,
       |  CAST(sum(CASE WHEN vc * 100 > p95_b THEN cnt ELSE 0 END) AS BIGINT) AS n_clip_high,
       |  CAST(sum(CAST(cnt AS DECIMAL(19,0)) * CAST(vc AS DECIMAL(19,0))) AS DOUBLE)
       |    / CAST(sum(cnt) AS BIGINT) / 100.0 AS raw_mean,
       |  CAST(sum(CAST(cnt AS DECIMAL(19,0)) *
       |      CAST(greatest(least(vc * 100, p95_b), p05_b) AS DECIMAL(19,0))) AS DOUBLE)
       |    / CAST(sum(cnt) AS BIGINT) / 10000.0 AS winsor_mean
       |FROM vt JOIN rqq USING (event_type)
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  // --- Time-bar resampling: OHLC downsampling per type ---

  /** OHLC bar width: 6 hours, in microseconds. */
  val ohlcBarUs = 21600000000L

  /** Time-bar resampling: downsample the event stream into 6-hour OHLC
    * bars per event type — open/close = first/last value by event time,
    * high/low = extrema, plus count and decimal-exact volume. The
    * time-series compaction every metrics store runs (candlesticks,
    * rollup tiers).
    *
    * Mechanics: the bar edge is `unix_micros div barUs` — INTEGER
    * division (a double `/`+truncate could round a just-below-boundary
    * timestamp across the edge). Open/close are `min_by`/`max_by` on the
    * total (ts, event_id) key: one ordinary aggregation — no window, no
    * per-bar sort; min_by/max_by partial-merge like any agg, so the
    * plan is a single map-side-combinable exchange on (type, bar). The
    * oracle mirrors the total key as one HUGEINT composite (micros ×
    * 10⁷ + event_id) — same ORDER, different encoding, because DuckDB's
    * arg_min/arg_max take scalar keys only.
    *
    * Scale (100 TB): output is |types| × |bars| regardless of input
    * rows; the single partial-agg exchange is the floor for any grouped
    * computation. Late/duplicated data re-aggregates idempotently
    * (ts, event_id) — no order-of-arrival dependence.
    */
  def qEventOhlc(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val key = struct($"ts", $"event_id")
    Tables.events(spark, sfDir)
      .withColumn("bar",
        timestamp_micros(expr(s"(unix_micros(ts) div ${ohlcBarUs}L) * ${ohlcBarUs}L")))
      .groupBy($"event_type", $"bar")
      .agg(
        min_by($"value", key).as("open"),
        max($"value").as("high"),
        min($"value").as("low"),
        max_by($"value", key).as("close"),
        count(lit(1)).as("n"),
        sum($"value".cast(DecimalType(11, 2))).cast("double").as("volume"))
      .orderBy($"event_type", $"bar")
  }

  val qEventOhlcSql: String =
    s"""SELECT event_type,
       |  make_timestamp((epoch_us(ts)//$ohlcBarUs)*$ohlcBarUs) AS bar,
       |  arg_min(value, epoch_us(ts)::HUGEINT * 10000000 + event_id) AS open,
       |  max(value) AS high,
       |  min(value) AS low,
       |  arg_max(value, epoch_us(ts)::HUGEINT * 10000000 + event_id) AS close,
       |  count(*) AS n,
       |  CAST(sum(CAST(value AS DECIMAL(11,2))) AS DOUBLE) AS volume
       |FROM events
       |GROUP BY event_type, bar
       |ORDER BY event_type, bar""".stripMargin

  // --- Event-transition matrix: per-user next-event Markov counts ---

  /** First-order transition matrix over the per-user event sequence:
    * for every (event_type → next event_type) pair, the transition
    * count, its share among the source type's outgoing transitions, and
    * the mean gap seconds (decimal-exact mean of integer micro gaps).
    * The Markov-chain summary behind "what do users do after X".
    *
    * Mechanics: `lead` over the per-user (ts, event_id) order pairs each
    * event with its successor — ONE user exchange + per-user sort, the
    * same partitioning every sequence operator here pays; the matrix agg
    * is |types|² rows and the outgoing-share window runs on that tiny
    * aggregate (partitioned by source type — never a single partition).
    *
    * Scale: identical profile to sessionization — the user-keyed sort
    * shuffle is the floor for sequence analysis; everything after is
    * constant-size. Gap micros sum as DECIMAL(20,0) (exact for any
    * corpus) before the double division.
    */
  def qEventTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    // both leads in ONE projection: chained withColumn would plan two
    // Window nodes over the same spec (extra per-row pass); a single
    // select fuses them into one Window (plan-asserted)
    val paired = Tables.events(spark, sfDir)
      .select($"event_type",
        lead($"event_type", 1).over(w).as("next_type"),
        (lead(unix_micros($"ts"), 1).over(w) - unix_micros($"ts")).as("gap_us"))
      .filter($"next_type".isNotNull)
    val share = Window.partitionBy($"event_type")
    paired.groupBy($"event_type", $"next_type")
      .agg(count(lit(1)).as("n"),
        (sum($"gap_us".cast(DecimalType(20, 0))).cast("double") /
          count(lit(1)).cast("double") / lit(1e6)).as("mean_gap_s"))
      .withColumn("share", $"n".cast("double") / sum($"n").over(share).cast("double"))
      .select($"event_type", $"next_type", $"n", $"share", $"mean_gap_s")
      .orderBy($"event_type", $"next_type")
  }

  val qEventTransitionsSql: String =
    """WITH paired AS (
      |  SELECT event_type,
      |    lead(event_type, 1) OVER w AS next_type,
      |    lead(epoch_us(ts), 1) OVER w - epoch_us(ts) AS gap_us
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |),
      |matrix AS (
      |  SELECT event_type, next_type, count(*) AS n,
      |    CAST(sum(CAST(gap_us AS DECIMAL(20,0))) AS DOUBLE) / count(*) / 1000000.0 AS mean_gap_s
      |  FROM paired WHERE next_type IS NOT NULL
      |  GROUP BY event_type, next_type
      |)
      |SELECT event_type, next_type, n,
      |  CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE) AS share,
      |  mean_gap_s
      |FROM matrix
      |ORDER BY event_type, next_type""".stripMargin

  // --- Robust anomaly detection: median/MAD z-scores per type ---

  /** Robust z-score threshold (the conventional 3.5 from the
    * Iglewicz–Hoaglin modified-z rule).
    */
  val madZThreshold = 3.5

  /** Robust anomaly detection per event type: median + MAD (median
    * absolute deviation) instead of mean + stddev, so the detector's own
    * baseline cannot be dragged by the outliers it is meant to find.
    * Reports the modified-z anomaly count and the maximum |z| per type.
    *
    * Mechanics: two [[rankQuantiles]] integer-kernel passes — the median
    * on the cent grid (exact value×10⁴), then the median of the integer
    * deviations |vc·100 − med_b| (exact value×10⁶) — and the flag pass
    * `0.6745·|v−med|/MAD > [[madZThreshold]]` ALL run on the same
    * (type, cent) count table: every row with the same cent value has
    * the same deviation and the same z, so the cnt weight carries the
    * per-row arithmetic and the corpus is scanned exactly ONCE (into
    * the persisted grid). The z-score is ONE fixed-shape double
    * expression over two exact BIGINTs (`0.6745 · (dev·100) / mad_b`,
    * both casts single-rounding), so the flag comparison is
    * bit-identical cross-engine — no native
    * `percentile`↔`quantile_cont` lerp anywhere (ported round 11; the
    * all-equal degenerate where MAD = 0 yields NULL z on both sides
    * rather than an engine-specific ±Inf).
    *
    * Scale (100 TB): one corpus-scale partial-agg shuffle (the grid
    * build); kernel passes, the deviation re-grid, and the flag
    * aggregation are all grid-bounded — strictly cheaper than the
    * exact-percentile form it replaces (which buffered every group in
    * executor memory AND rescanned the corpus three times); production
    * at extreme scale swaps `approx_percentile` into the SAME shape
    * (sketch merge) at the price of oracle-exactness.
    */
  def qEventAnomalies(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val vt = centEvents(spark, sfDir)
      .groupBy($"event_type", $"vc").agg(count(lit(1)).as("cnt"))
      .persist()
    vt.count() // eager: parallel kernel branches must not re-derive the grid
    val med = rankQuantiles(vt, "event_type", "vc", Seq(("med", 50)),
      weight = Some("cnt"))
    val dev = vt.join(broadcast(med), "event_type")
      .select($"event_type", $"cnt", $"med_b",
        abs($"vc" * 100 - $"med_b").as("dev"))
    val mad = rankQuantiles(dev, "event_type", "dev", Seq(("mad", 50)),
      weight = Some("cnt"))
    val z = when($"mad_b" === 0L, lit(null).cast("double"))
      .otherwise(lit(0.6745) * ($"dev" * 100).cast("double") / $"mad_b".cast("double"))
    dev.join(broadcast(mad), "event_type")
      .groupBy($"event_type")
      .agg(
        sum($"cnt").as("n"),
        (first($"med_b").cast("double") / 10000.0).as("median"),
        (first($"mad_b").cast("double") / 1000000.0).as("mad"),
        sum(when(z > madZThreshold, $"cnt").otherwise(0L)).as("n_anomalies"),
        max(z).as("max_abs_z"))
      .orderBy($"event_type")
  }

  val qEventAnomaliesSql: String =
    s"""WITH $centEventsSql,
       |vt AS (SELECT event_type, vc, count(*) AS cnt FROM e GROUP BY event_type, vc),
       |${rankQuantilesSql("vt", "event_type", "vc", Seq(("med", 50)), 100, "md",
            weight = Some("cnt"))},
       |dev AS (
       |  SELECT event_type, cnt, med_b, abs(vc * 100 - med_b) AS dev
       |  FROM vt JOIN mdq USING (event_type)
       |),
       |${rankQuantilesSql("dev", "event_type", "dev", Seq(("mad", 50)), 100, "ma",
            weight = Some("cnt"))},
       |zt AS (
       |  SELECT event_type, cnt, med_b, mad_b, dev,
       |    CASE WHEN mad_b = 0 THEN NULL
       |         ELSE 0.6745 * CAST(dev * 100 AS DOUBLE) / CAST(mad_b AS DOUBLE) END AS z
       |  FROM dev JOIN maq USING (event_type)
       |)
       |SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n,
       |  CAST(any_value(med_b) AS DOUBLE) / 10000.0 AS median,
       |  CAST(any_value(mad_b) AS DOUBLE) / 1000000.0 AS mad,
       |  CAST(sum(CASE WHEN z > $madZThreshold THEN cnt ELSE 0 END) AS BIGINT) AS n_anomalies,
       |  max(z) AS max_abs_z
       |FROM zt
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  // --- Equi-depth histogram: decile bins per type ---

  /** Equi-depth (equal-frequency) histogram per event type: ten decile
    * bins, each holding ~10% of the rows, with per-bin counts and value
    * ranges — the histogram form query optimizers and drift monitors use
    * because equal-width bins collapse under skew.
    *
    * Mechanics: the nine interior boundaries are linearly interpolated
    * decile points computed ENTIRELY IN INTEGER MILLI-CENTS — rank
    * selection on the per-(type, cent-value) count table (grid-bounded,
    * never row-scale) picks the two bracketing data values, and the
    * boundary is `v_low·1000 + (v_high − v_low)·r·100` with
    * r = (k·(n−1)) mod 10 — exact BIGINT arithmetic, bit-identical in
    * any engine. The native `percentile`/`quantile_cont` lerp this
    * replaces is NOT cross-engine-stable: Spark computes
    * `low + (high−low)·f` (exact when low = high) while DuckDB computes
    * `low·(1−f) + high·f` (one ulp BELOW the data value), and at sf0.1
    * four rows sat exactly on a decile boundary and swapped bins — the
    * round-10 sf-sweep catch. Bin assignment is a narrow fold over the
    * broadcast 9-boundary array, comparing integer milli-cents — the
    * naive alternative, `ntile` over a per-type window, funnels every
    * row of a type through one task (|types| partitions = a skew pole at
    * any scale); the fold keeps assignment embarrassingly parallel.
    *
    * Scale (100 TB): one (type, cent) partial agg (grid-bounded), the
    * cumulative window over that bounded table, a 9-rows-per-type
    * selection join, and one (type, bin) partial agg over the stream;
    * production swaps an approximate sketch into the same shape for the
    * boundary pass.
    */
  def qValueEquidepth(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
      .select($"event_type", $"value",
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("vc"))
    val vt = e.groupBy($"event_type", $"vc").agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy($"event_type").orderBy($"vc")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumt = vt.withColumn("cum", sum($"cnt").over(wCum))
    val nt = vt.groupBy($"event_type").agg(sum($"cnt").as("n"))
    val sel = nt.select($"event_type", explode(expr("sequence(1, 9)")).as("k"), $"n")
      .select($"event_type", $"k",
        expr("(k * (n - 1)) div 10").as("idx"), expr("(k * (n - 1)) % 10").as("r"))
    val vlow = cumt.join(broadcast(sel), Seq("event_type"))
      .filter($"cum" >= $"idx" + 1)
      .groupBy($"event_type", $"k", $"r").agg(min($"vc").as("v_low"))
    val vhigh = cumt.join(broadcast(sel), Seq("event_type"))
      .filter($"cum" >= $"idx" + 2)
      .groupBy($"event_type", $"k").agg(min($"vc").as("v_high"))
    val bounds = vlow.join(vhigh, Seq("event_type", "k"), "left")
      .select($"event_type", $"k",
        ($"v_low" * 1000L +
          (coalesce($"v_high", $"v_low") - $"v_low") * $"r" * 100L).as("b_mc"))
    val barr = bounds.groupBy($"event_type")
      .agg(transform(array_sort(collect_list(struct($"k", $"b_mc"))),
        p => p.getField("b_mc")).as("bs"))
    e.join(broadcast(barr), "event_type")
      .select($"event_type", $"value",
        expr("1 + aggregate(bs, 0, (acc, x) -> acc + (CASE WHEN vc * 1000 > x THEN 1 ELSE 0 END))")
          .as("bin"))
      .groupBy($"event_type", $"bin")
      .agg(count(lit(1)).as("n"), min($"value").as("lo"), max($"value").as("hi"))
      .orderBy($"event_type", $"bin")
  }

  val qValueEquidepthSql: String =
    """WITH e AS (
      |  SELECT event_type, value,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      |  FROM events
      |),
      |vt AS (SELECT event_type, vc, count(*) AS cnt FROM e GROUP BY event_type, vc),
      |cumt AS (
      |  SELECT event_type, vc,
      |    CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY vc
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM vt
      |),
      |nt AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n FROM vt GROUP BY event_type),
      |sel AS (
      |  SELECT event_type, k, (k * (n - 1)) // 10 AS idx, (k * (n - 1)) % 10 AS r
      |  FROM nt, UNNEST(range(1, 10)) AS t(k)
      |),
      |vlow AS (
      |  SELECT s.event_type, s.k, s.r, min(c.vc) AS v_low
      |  FROM sel s JOIN cumt c ON c.event_type = s.event_type AND c.cum >= s.idx + 1
      |  GROUP BY s.event_type, s.k, s.r
      |),
      |vhigh AS (
      |  SELECT s.event_type, s.k, min(c.vc) AS v_high
      |  FROM sel s JOIN cumt c ON c.event_type = s.event_type AND c.cum >= s.idx + 2
      |  GROUP BY s.event_type, s.k
      |),
      |bounds AS (
      |  SELECT l.event_type, l.k,
      |    l.v_low * 1000 + (COALESCE(h.v_high, l.v_low) - l.v_low) * l.r * 100 AS b_mc
      |  FROM vlow l LEFT JOIN vhigh h ON l.event_type = h.event_type AND l.k = h.k
      |),
      |barr AS (SELECT event_type, list(b_mc ORDER BY k) AS bs FROM bounds GROUP BY event_type)
      |SELECT event_type,
      |  1 + CAST(list_sum(list_transform(bs, x -> CASE WHEN vc * 1000 > x THEN 1 ELSE 0 END)) AS INTEGER) AS bin,
      |  count(*) AS n, min(value) AS lo, max(value) AS hi
      |FROM e JOIN barr USING (event_type)
      |GROUP BY event_type, bin
      |ORDER BY event_type, bin""".stripMargin

  // --- Global running total: distributed two-phase prefix sum ---

  /** GLOBAL running count and value total over the whole event stream in
    * (ts, event_id) order — the computation a naive `SUM OVER (ORDER BY
    * ts)` window serializes through ONE task at any scale (no partition
    * key = Exchange SinglePartition of every row). This is the
    * distributed prefix-sum decomposition instead:
    *
    *   1. bucket events by day (a time-ordered, bounded-cardinality key);
    *   2. aggregate per-day totals — |days| rows;
    *   3. one TINY single-partition window over those |days| rows turns
    *      totals into before-day cumulative offsets (bounded: days, not
    *      rows — this is the two-phase trick's whole point);
    *   4. broadcast the offsets back and run the big window PARTITIONED
    *      BY day: within-day prefix + its day's offset = global prefix.
    *
    * Every row-scale operation is day-partitioned; the only global step
    * touches |days| rows. Decimal sums keep the two-phase total
    * bit-equal to the oracle's single global decimal window.
    *
    * Scale (100 TB): day buckets bound concurrency at |days| — for
    * deeper parallelism subdivide the bucket (hour) at the cost of a
    * longer offset table; the shape is unchanged. Day skew is data skew
    * in time — mitigated by finer buckets, not by a different plan.
    */
  def qEventGlobalRunning(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"value", to_date($"ts").as("day"))
    val wDays = Window.orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ev.groupBy($"day")
      .agg(count(lit(1)).as("day_n"),
        sum($"value".cast(DecimalType(11, 2))).as("day_v"))
      .select($"day",
        coalesce(sum($"day_n").over(wDays), lit(0L)).as("n_before"),
        coalesce(sum($"day_v").over(wDays), lit(0).cast(DecimalType(21, 2)))
          .as("v_before"))
    val wDay = Window.partitionBy($"day").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.join(broadcast(offsets), "day")
      .select($"event_id",
        ($"n_before" + count(lit(1)).over(wDay)).as("running_n"),
        ($"v_before" + sum($"value".cast(DecimalType(11, 2))).over(wDay))
          .cast("double").as("running_v"))
      .orderBy($"event_id")
  }

  val qEventGlobalRunningSql: String =
    """SELECT event_id,
      |  CAST(row_number() OVER (ORDER BY ts, event_id) AS BIGINT) AS running_n,
      |  CAST(SUM(CAST(value AS DECIMAL(11,2)))
      |    OVER (ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS DOUBLE) AS running_v
      |FROM events
      |ORDER BY event_id""".stripMargin

  // --- Overlapping (hopping) time windows via the native window() generator ---

  /** Per-window traffic over OVERLAPPING 1-hour windows hopping every
    * 15 minutes — the batch form of Structured Streaming's hop window
    * ([[graft.streaming.EventStreams]] covers the tumbling/streaming
    * side). Each event belongs to exactly window/slide = 4 windows;
    * Spark's `window(ts, '1 hour', '15 minutes')` plans that membership
    * as an Expand (a constant ×4 row generator) feeding a partial
    * aggregate — never a self-join of the stream against a window table.
    * Window starts are epoch-aligned multiples of the slide in BOTH
    * engines, and surface as epoch seconds (BIGINT) rather than
    * timestamps so no session-timezone rendering can drift the compare.
    *
    * Scale: the ×4 expansion happens map-side and combines BEFORE the
    * shuffle — the exchange carries |windows| partial rows, not ×4 the
    * corpus. The explode factor is window/slide, a plan constant chosen
    * at query time; at 100 TB the shuffle stays |distinct windows|-sized
    * (here ~2.9k/month) regardless of input rows.
    */
  def qEventHopWindow(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy(window($"ts", "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"),
        sum(dec($"value")).cast("double").as("total"))
      .select($"w.start".cast("long").as("window_start"), $"n", $"total")
      .orderBy($"window_start")
  }

  /** Oracle: an event at epoch second e (floored — window edges are
    * integral multiples of 900 s, so flooring cannot move an event across
    * an edge) belongs to the 4 windows starting at (e div 900 − k)·900,
    * k = 0..3; `range(4)` generates the same membership Spark's Expand
    * does.
    */
  val qEventHopWindowSql: String =
    """WITH e AS (
      |  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS es, value FROM events
      |)
      |SELECT (e.es // 900 - k.k) * 900 AS window_start,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM e CROSS JOIN (SELECT unnest(range(4)) AS k) k
      |GROUP BY window_start
      |ORDER BY window_start""".stripMargin

  // --- EWMA smoothing: per-key ordered fold over event values ---

  /** Exponentially-weighted moving average of each user's purchase
    * values (α = 1/4): the classic streaming smoother, computed as a
    * PER-KEY SEQUENTIAL FOLD over the (ts, event_id)-ordered value list
    * — EWMA is inherently order-sensitive recursive state, so unlike the
    * module's decimal sums it cannot be a partial aggregate; the fold
    * array is bounded by per-user activity (human-scale; the
    * [[qEventLocf]] skew note applies). α = 0.25 and 1−α = 0.75 are
    * EXACT binary doubles and the fold evaluates in one fixed order, so
    * the result is bit-identical cross-engine and across partitionings
    * (same discipline as [[graft.ext.TextOps.qDocBigramLm]]'s mean fold).
    *
    * Output: final smoothed level per user + the observation count —
    * the state a feature store would checkpoint per entity.
    */
  def qEventEwma(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .filter($"event_type" === "purchase")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_obs"),
        array_sort(collect_list(struct($"ts", $"event_id", $"value"))).as("seq"))
      .select($"user_id", $"n_obs",
        expr("aggregate(slice(seq, 2, size(seq) - 1), seq[0].value," +
          " (acc, s) -> 0.25D * s.value + 0.75D * acc)").as("ewma"))
      .orderBy($"user_id")
  }

  val qEventEwmaSql: String =
    """SELECT user_id, count(*) AS n_obs,
      |  list_reduce(list(value ORDER BY ts, event_id),
      |    (acc, v) -> 0.25 * v + 0.75 * acc) AS ewma
      |FROM events WHERE event_type = 'purchase'
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // --- ACF: lag-k autocorrelation of the daily value series ---

  /** Lag 1..7 autocorrelation of each event type's DAILY value total —
    * the weekly-seasonality probe every metrics pipeline runs before
    * trusting a trend. Estimator: Pearson correlation of the series
    * against itself shifted k CALENDAR days (integer epoch-day join
    * keys, so a missing day drops its pairs instead of silently
    * compressing the lag the way an index-shift over observed rows
    * would). Moments accumulate as exact BIGINT CENTS — NOT decimals:
    * a decimal sum whose unscaled value tops 2⁵³ reaches double through
    * TWO roundings in DuckDB (unscaled/10^scale) vs one in the JVM, a
    * last-ulp divergence the sf0.1 sweep actually caught here — and the
    * closing formula casts only exact BIGINT differences (each one
    * deterministic rounding) into one fixed-shape double expression, so
    * the result hash-matches cross-engine at any parallelism.
    *
    * Scale (100 TB): the event corpus collapses to |types|×|days| rows
    * in ONE partially-aggregated shuffle; the lag cross (broadcast
    * 7-row literal), calendar self-join, and moment aggregation all run
    * on that metadata-sized series table. Nothing downstream of the
    * first aggregate ever sees a raw event.
    */
  def qEventAcf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // daily totals in exact BIGINT CENTS: decimal sums above 2⁵³ unscaled
    // cast to double with TWO roundings in DuckDB vs one in the JVM (the
    // known divergence class — bit at sf0.1 in the round-10 sweep), so
    // every moment stays integer and only exact BIGINT differences cross
    // the double boundary (one deterministic rounding in both engines).
    // Bounds: products fit int64 while n_days·(max daily cents)² < 2⁶³ —
    // ≈ $1.5M/day/type at a year of lags, 30× above the sf0.1 load.
    // round() before the BIGINT cast: without it the cast itself carries
    // the engines' disagreement on sub-cent mass (Spark ANSI truncates a
    // decimal→BIGINT cast, DuckDB rounds) — latent on 2-decimal data but
    // live the day a sub-cent value appears; HALF_UP == half-away-from-
    // zero on nonnegative sums, so both engines round identically
    val daily = Tables.events(spark, sfDir)
      .groupBy($"event_type",
        datediff(to_date($"ts"), lit("1970-01-01")).cast("long").as("dn"))
      .agg(expr("CAST(round(sum(CAST(value AS DECIMAL(18,4))) * 100) AS BIGINT)").as("v"))
    val lags = spark.range(1, 8).select($"id".cast("int").as("lag"))
    val a = daily.toDF("event_type", "dn", "x").as("acf_a")
    val b = daily.toDF("event_type", "dn", "y").as("acf_b")
    val m = a.crossJoin(broadcast(lags))
      .join(b, col("acf_a.event_type") === col("acf_b.event_type") &&
        col("acf_b.dn") === col("acf_a.dn") + col("lag"))
      .select(col("acf_a.event_type").as("event_type"), col("lag"),
        col("x"), col("y"))
      .groupBy($"event_type", $"lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum($"x").as("sx"), sum($"x" * $"x").as("sxx"),
        sum($"y").as("sy"), sum($"y" * $"y").as("syy"),
        sum($"x" * $"y").as("sxy"))
    // the two centered denominators are cast SEPARATELY (each an exact
    // BIGINT, one rounding) and multiplied in double — their int64
    // product would overflow
    m.select($"event_type", $"lag", $"n_pairs",
        (($"n_pairs" * $"sxy" - $"sx" * $"sy").cast("double") /
          sqrt(($"n_pairs" * $"sxx" - $"sx" * $"sx").cast("double") *
            ($"n_pairs" * $"syy" - $"sy" * $"sy").cast("double"))).as("acf"))
      .orderBy($"event_type", $"lag")
  }

  val qEventAcfSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dn,
      |    CAST(round(sum(CAST(value AS DECIMAL(18,4))) * 100) AS BIGINT) AS v
      |  FROM events GROUP BY event_type, dn
      |),
      |lags AS (SELECT unnest(generate_series(1, 7)) AS lag),
      |m AS (
      |  SELECT a.event_type, l.lag, count(*) AS n_pairs,
      |    CAST(sum(a.v) AS BIGINT) AS sx, CAST(sum(a.v * a.v) AS BIGINT) AS sxx,
      |    CAST(sum(b.v) AS BIGINT) AS sy, CAST(sum(b.v * b.v) AS BIGINT) AS syy,
      |    CAST(sum(a.v * b.v) AS BIGINT) AS sxy
      |  FROM daily a
      |  CROSS JOIN lags l
      |  JOIN daily b ON b.event_type = a.event_type AND b.dn = a.dn + l.lag
      |  GROUP BY a.event_type, l.lag
      |)
      |SELECT event_type, CAST(lag AS INTEGER) AS lag, n_pairs,
      |  CAST(n_pairs * sxy - sx * sy AS DOUBLE) /
      |    sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE) *
      |         CAST(n_pairs * syy - sy * sy AS DOUBLE)) AS acf
      |FROM m ORDER BY event_type, lag""".stripMargin

  // --- OLS daily trend: regression line + R² from exact integer moments ---

  /** Per-type linear trend of daily revenue: OLS slope, intercept and R²
    * of the (day-number, daily total) series — the "is this metric
    * growing" primitive behind every dashboard sparkline, and the
    * regression member missing from the exact-moment family
    * ([[qEventValueStats]] mean/stddev/corr, [[qEventAcf]]
    * autocorrelation). Determinism discipline goes one step further
    * than ACF: the daily totals are floored to integer CENTS and the
    * day numbers centered on the corpus min-day (a 1-row broadcast), so
    * every OLS moment (n, Σx, Σx², Σy, Σxy, Σy²) is an exact BIGINT —
    * int64→double conversion is single-rounding IEEE in every engine at
    * ANY magnitude, unlike decimal→double which DuckDB rounds twice
    * past 2⁵³ unscaled (the E136 trap). The closing slope / intercept /
    * R² formulas are fixed-shape double expressions over those exact
    * integers, so the hash matches cross-engine at any parallelism.
    *
    * Scale (100 TB): identical profile to [[qEventAcf]] — the corpus
    * collapses to |types|×|days| daily points in ONE partially-
    * aggregated shuffle; centering rides a broadcast 1-row min; the
    * moment aggregation runs on the metadata-sized series. Centering
    * is also what keeps the integer moments in int64 at century-long
    * histories: x is days-since-first-day, not epoch days.
    */
  def qEventTrend(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .groupBy($"event_type",
        datediff(to_date($"ts"), lit("1970-01-01")).cast("long").as("dn"))
      .agg(sum($"value".cast(DecimalType(18, 4))).as("v"))
    val mn = daily.agg(min($"dn").as("mn"))
    val pts = daily.crossJoin(broadcast(mn))
      .select($"event_type", ($"dn" - $"mn").as("x"),
        floor($"v" * 100).cast("long").as("y"))
    val m = pts.groupBy($"event_type").agg(
      count(lit(1)).as("n"),
      sum($"x").as("sx"), sum($"x" * $"x").as("sxx"),
      sum($"y").as("sy"), sum($"x" * $"y").as("sxy"),
      sum($"y" * $"y").as("syy"))
    // exact-int64 differences, cast ONCE to double; slope in cents/day
    val det = ($"n" * $"sxx" - $"sx" * $"sx").cast("double")
    val num = ($"n" * $"sxy" - $"sx" * $"sy").cast("double")
    val syDet = ($"n" * $"syy" - $"sy" * $"sy").cast("double")
    m.select($"event_type", $"n".as("n_days"),
        (num / det).as("slope_cents"),
        (($"sy" * $"sxx" - $"sx" * $"sxy").cast("double") / det).as("intercept_cents"),
        (num * num / (det * syDet)).as("r2"))
      .orderBy($"event_type")
  }

  val qEventTrendSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dn,
      |    sum(CAST(value AS DECIMAL(18,4))) AS v
      |  FROM events GROUP BY event_type, dn
      |),
      |mn AS (SELECT min(dn) AS mn FROM daily),
      |pts AS (
      |  SELECT event_type, dn - mn AS x, CAST(floor(v * 100) AS BIGINT) AS y
      |  FROM daily, mn
      |),
      |m AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM pts GROUP BY event_type
      |)
      |SELECT event_type, n AS n_days,
      |  CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_cents,
      |  CAST(sy * sxx - sx * sxy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) AS intercept_cents,
      |  (CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)) /
      |    (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)) AS r2
      |FROM m ORDER BY event_type""".stripMargin

  // --- seasonal decomposition: DOW profile of the detrended series ---

  /** Trend + seasonality decomposition, the step after [[qEventTrend]]:
    * fit the per-type OLS line, then profile the RESIDUALS by day of
    * week — the additive weekly-seasonal component (what [[qEventAcf]]
    * detects, this op QUANTIFIES). The seasonal mean needs no per-day
    * residual materialization: residuals are linear in (x, y), so
    * mean(resid | dow) = mean(y|dow) − intercept − slope·mean(x|dow) —
    * two more exact-BIGINT sums per (type, dow) cell and one
    * fixed-shape double formula over them + the trend params. Day of
    * week is pure integer epoch-day arithmetic ((dn+4) mod 7,
    * 0=Monday): no engine week-truncation or locale rules anywhere.
    *
    * Scale (100 TB): shares [[qEventTrend]]'s profile — everything
    * after the ONE corpus collapse runs on the |types|×|days| series;
    * the params join is |types| rows broadcast onto 7·|types| cells.
    */
  def qEventSeasonality(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .groupBy($"event_type",
        datediff(to_date($"ts"), lit("1970-01-01")).cast("long").as("dn"))
      .agg(sum($"value".cast(DecimalType(18, 4))).as("v"))
    val mn = daily.agg(min($"dn").as("mn"))
    val pts = daily.crossJoin(broadcast(mn))
      .select($"event_type", $"dn", ($"dn" - $"mn").as("x"),
        floor($"v" * 100).cast("long").as("y"))
      .persist()
    pts.count() // eager: trend params + seasonal cells both consume it
    val m = pts.groupBy($"event_type").agg(
      count(lit(1)).as("n"),
      sum($"x").as("sx"), sum($"x" * $"x").as("sxx"),
      sum($"y").as("sy"), sum($"x" * $"y").as("sxy"))
    val det = ($"n" * $"sxx" - $"sx" * $"sx").cast("double")
    val par = m.select($"event_type",
      (($"n" * $"sxy" - $"sx" * $"sy").cast("double") / det).as("slope"),
      (($"sy" * $"sxx" - $"sx" * $"sxy").cast("double") / det).as("icept"))
    val cells = pts
      .groupBy($"event_type", (($"dn" + 4) % 7).as("dow"))
      .agg(count(lit(1)).as("n_days"), sum($"x").as("sxd"), sum($"y").as("syd"))
    cells.join(broadcast(par), "event_type")
      .select($"event_type", $"dow".cast("int").as("dow"), $"n_days",
        ($"syd".cast("double") / $"n_days".cast("double")).as("mean_y_cents"),
        ($"syd".cast("double") / $"n_days".cast("double") - $"icept"
          - $"slope" * ($"sxd".cast("double") / $"n_days".cast("double")))
          .as("mean_resid_cents"))
      .orderBy($"event_type", $"dow")
  }

  val qEventSeasonalitySql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dn,
      |    sum(CAST(value AS DECIMAL(18,4))) AS v
      |  FROM events GROUP BY event_type, dn
      |),
      |mn AS (SELECT min(dn) AS mn FROM daily),
      |pts AS (
      |  SELECT event_type, dn, dn - mn AS x, CAST(floor(v * 100) AS BIGINT) AS y
      |  FROM daily, mn
      |),
      |m AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy
      |  FROM pts GROUP BY event_type
      |),
      |par AS (
      |  SELECT event_type,
      |    CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
      |    CAST(sy * sxx - sx * sxy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) AS icept
      |  FROM m
      |),
      |cells AS (
      |  SELECT event_type, (dn + 4) % 7 AS dow, CAST(count(*) AS BIGINT) AS n_days,
      |    CAST(sum(x) AS BIGINT) AS sxd, CAST(sum(y) AS BIGINT) AS syd
      |  FROM pts GROUP BY event_type, dow
      |)
      |SELECT event_type, CAST(dow AS INTEGER) AS dow, n_days,
      |  CAST(syd AS DOUBLE) / CAST(n_days AS DOUBLE) AS mean_y_cents,
      |  CAST(syd AS DOUBLE) / CAST(n_days AS DOUBLE) - icept
      |    - slope * (CAST(sxd AS DOUBLE) / CAST(n_days AS DOUBLE)) AS mean_resid_cents
      |FROM cells JOIN par USING (event_type)
      |ORDER BY event_type, dow""".stripMargin

  // --- rolling 7-day distinct actives (WAU): explode, don't window ---

  /** Trailing-7-day distinct active users per day — WAU, the metric
    * every product dashboard carries. COUNT(DISTINCT) is not a window
    * function in any engine (distinct state can't slide), so the
    * standard rewrite: dedup to user-DAYS first, then each user-day
    * contributes its user to the ≤ 7 window-end days it falls in
    * (bounded explode, the [[qEventHopWindow]] trick for windows
    * measured in days), then one exact distinct per window end. Window
    * ends past the data's last day are clamped by a 1-row broadcast
    * max; leading windows are partial by convention (a dashboard's
    * first week always is).
    *
    * Scale (100 TB): the raw corpus collapses to distinct user-days in
    * ONE partially-aggregated shuffle (the only pass over events); the
    * ×7 fan-out happens AFTER that dedup, on the much smaller user-day
    * table; the per-window distinct is Spark's two-phase
    * distinct-aggregate on (day, user) — never a self-join of events
    * against a day grid, which reshuffles the corpus once per window
    * width.
    */
  def qEventRollingActive(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ud = Tables.events(spark, sfDir)
      .select($"user_id",
        datediff(to_date($"ts"), lit("1970-01-01")).cast("long").as("dn"))
      .distinct()
    val mx = ud.agg(max($"dn").as("mx"))
    ud.withColumn("window_end", explode(sequence($"dn", $"dn" + 6)))
      .crossJoin(broadcast(mx)).filter($"window_end" <= $"mx")
      .groupBy($"window_end")
      .agg(countDistinct($"user_id").as("active_users"),
        count(lit(1)).as("n_user_days"))
      .orderBy($"window_end")
  }

  val qEventRollingActiveSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id,
      |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dn
      |  FROM events
      |),
      |bounds AS (SELECT max(dn) AS mx FROM ud),
      |ex AS (
      |  SELECT user_id, unnest(generate_series(dn, dn + 6)) AS window_end
      |  FROM ud
      |)
      |SELECT window_end, count(DISTINCT user_id) AS active_users,
      |  count(*) AS n_user_days
      |FROM ex, bounds WHERE window_end <= mx
      |GROUP BY window_end ORDER BY window_end""".stripMargin

  // --- behavioral segment bitmasks: audience overlap without re-scans ---

  /** Audience-overlap ("Venn") report: each user's SET of event types
    * packed into one integer bitmask — bit i set iff the user ever did
    * the i-th type (alphabetical type index, derived from the data so
    * the encoding is engine-independent) — then counted per exact
    * combination. The bitmask is the compact segment encoding behind
    * overlap dashboards: once users carry a mask, ANY intersection /
    * union / exclusion cardinality is a bitwise filter over this
    * |2^types|-row table, never another pass over events.
    *
    * Scale (100 TB): `bit_or` is idempotent, so no pre-distinct is
    * needed — the per-user mask is ONE map-side-combinable aggregate
    * over raw events (the shuffle carries one long per user per task),
    * and the venn rollup aggregates the per-user masks. The type-index
    * table is |types| rows, broadcast.
    */
  def qEventSegments(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val types = Tables.events(spark, sfDir).select($"event_type").distinct()
      .withColumn("idx",
        (row_number().over(Window.orderBy($"event_type")) - 1).cast("long"))
    Tables.events(spark, sfDir)
      .join(broadcast(types), "event_type")
      .groupBy($"user_id")
      .agg(expr("bit_or(shiftleft(1L, idx))").as("mask"))
      .groupBy($"mask")
      .agg(count(lit(1)).as("n_users"))
      .select($"mask", bit_count($"mask").as("n_types"), $"n_users")
      .orderBy($"mask")
  }

  val qEventSegmentsSql: String =
    """WITH t AS (
      |  SELECT event_type,
      |    CAST(row_number() OVER (ORDER BY event_type) - 1 AS BIGINT) AS idx
      |  FROM (SELECT DISTINCT event_type FROM events)
      |),
      |um AS (
      |  SELECT user_id, bit_or(1 << idx) AS mask
      |  FROM events JOIN t USING (event_type)
      |  GROUP BY user_id
      |)
      |SELECT mask, CAST(bit_count(mask) AS INTEGER) AS n_types,
      |  count(*) AS n_users
      |FROM um GROUP BY mask ORDER BY mask""".stripMargin

  // --- chi-square contingency: is event type independent of weekday? ---

  /** Pearson chi-square contingency audit of event_type × ISO weekday —
    * the independence test behind "does behavior differ by day?"
    * dashboards and drift alarms (the categorical complement of
    * [[graft.etl.Quality.qEventDrift]]'s value histograms). Emitted
    * PER CELL — observed count, expected count under independence
    * (row·col/N), and the cell's χ² contribution — because the global
    * statistic is a sum of doubles whose partition order an engine is
    * free to choose: per-cell values are each ONE fixed-shape double
    * expression over exact integer margins (correctly rounded, so
    * hash-identical cross-engine), and consumers sum the 35 cells
    * client-side (AnalyticsSpec does, against a local replay).
    *
    * Scale (100 TB): one partially-aggregated corpus scan down to the
    * |types|×7 cell table; margins are window sums OVER THAT tiny
    * frame. The single-partition total window touches 35 rows, never
    * the corpus.
    */
  def qEventTypeDowChisq(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.events(spark, sfDir)
      .groupBy($"event_type", expr("weekday(ts) + 1").cast("int").as("isodow"))
      .agg(count(lit(1)).as("o"))
    val m = cells
      .withColumn("r", sum($"o").over(Window.partitionBy($"event_type")))
      .withColumn("c", sum($"o").over(Window.partitionBy($"isodow")))
      .withColumn("n", sum($"o").over(Window.partitionBy()))
      .select($"event_type", $"isodow", $"o",
        (($"r".cast("double") * $"c".cast("double")) / $"n".cast("double"))
          .as("expected"))
    m.select($"event_type", $"isodow", $"o", $"expected",
        (($"o".cast("double") - $"expected") * ($"o".cast("double") - $"expected") /
          $"expected").as("chi2_contrib"))
      .orderBy($"event_type", $"isodow")
  }

  val qEventTypeDowChisqSql: String =
    """WITH cells AS (
      |  SELECT event_type, CAST(isodow(ts) AS INTEGER) AS isodow, count(*) AS o
      |  FROM events GROUP BY event_type, isodow
      |),
      |m AS (
      |  SELECT event_type, isodow, o,
      |    sum(o) OVER (PARTITION BY event_type) AS r,
      |    sum(o) OVER (PARTITION BY isodow) AS c,
      |    sum(o) OVER () AS n
      |  FROM cells
      |),
      |e AS (
      |  SELECT event_type, isodow, o,
      |    (CAST(r AS DOUBLE) * CAST(c AS DOUBLE)) / CAST(n AS DOUBLE) AS expected
      |  FROM m
      |)
      |SELECT event_type, isodow, o, expected,
      |  (CAST(o AS DOUBLE) - expected) * (CAST(o AS DOUBLE) - expected) / expected
      |    AS chi2_contrib
      |FROM e ORDER BY event_type, isodow""".stripMargin

  // --- Mutual information: event_type × ISO weekday, exact micro-nats ---

  /** Micro-nat quantization scale for [[qEventMi]] (the
    * [[graft.ext.TextOps]] `logScale` rule: one correctly-rounded `ln`
    * per distinct count, floor-quantized to integers so every
    * accumulation is exact BIGINT arithmetic in any engine).
    */
  final val miScale = 1000000L

  private def qln(c: Column): Column =
    floor(log(c.cast("double")) * miScale).cast("long")

  private def qlnSql(e: String): String =
    s"CAST(floor(ln(CAST($e AS DOUBLE)) * $miScale) AS BIGINT)"

  /** MUTUAL INFORMATION between event_type and ISO weekday — the
    * effect-SIZE companion to [[qEventTypeDowChisq]]'s significance test
    * (χ² says whether dependence exists; MI says how many nats of
    * weekday information an event's type carries — the quantity feature-
    * selection and drift dashboards actually rank by), plus both marginal
    * entropies and the normalized MI = MI / min(H_type, H_dow).
    *
    * Determinism: every log rides the [[miScale]] micro-nat quantization
    * — per-cell/per-margin integer terms `n·(qln(n)+qln(N)−qln(r)−qln(c))`
    * accumulate in exact BIGINT; the only float steps are one `ln` per
    * distinct count and the final one-shot divisions (exposed alongside
    * the integer numerators so the checked columns include the exact
    * form).
    *
    * Scale (100 TB): ONE corpus-sized partial agg down to the
    * |types|×7 cell table; margins and totals are |cells|-sized
    * re-aggregations of that tiny frame (joins, not windows — same
    * result, no sort); the output is a single row. Nothing after the
    * first agg ever touches the corpus.
    */
  def qEventMi(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.events(spark, sfDir)
      .groupBy($"event_type", expr("weekday(ts) + 1").cast("int").as("isodow"))
      .agg(count(lit(1)).as("o"))
    val rowm = cells.groupBy($"event_type").agg(sum($"o").as("r"))
    val colm = cells.groupBy($"isodow").agg(sum($"o").as("c"))
    val tot = cells.agg(sum($"o").as("n"), count(lit(1)).as("n_cells"))
    val mi = cells.join(rowm, "event_type").join(colm, "isodow")
      .crossJoin(broadcast(tot.select($"n")))
      .agg(sum($"o" * (qln($"o") + qln($"n") - qln($"r") - qln($"c")))
        .as("mi_num"))
    val hx = rowm.crossJoin(broadcast(tot.select($"n".as("nx"))))
      .agg(sum($"r" * (qln($"nx") - qln($"r"))).as("hx_num"))
    val hy = colm.crossJoin(broadcast(tot.select($"n".as("ny"))))
      .agg(sum($"c" * (qln($"ny") - qln($"c"))).as("hy_num"))
    tot.crossJoin(mi).crossJoin(hx).crossJoin(hy)
      .select($"n_cells", $"n".as("n_total"),
        ($"hx_num".cast("double") / $"n".cast("double") / miScale).as("h_type"),
        ($"hy_num".cast("double") / $"n".cast("double") / miScale).as("h_dow"),
        ($"mi_num".cast("double") / $"n".cast("double") / miScale).as("mi_nats"),
        ($"mi_num".cast("double") / least($"hx_num", $"hy_num").cast("double"))
          .as("nmi"))
  }

  val qEventMiSql: String =
    s"""WITH cells AS (
       |  SELECT event_type, CAST(isodow(ts) AS INTEGER) AS isodow, count(*) AS o
       |  FROM events GROUP BY event_type, isodow
       |),
       |rowm AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY event_type),
       |colm AS (SELECT isodow, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY isodow),
       |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n, count(*) AS n_cells FROM cells),
       |mi AS (
       |  SELECT CAST(sum(o * (${qlnSql("o")} + ${qlnSql("n")} - ${qlnSql("r")} - ${qlnSql("c")})) AS BIGINT) AS mi_num
       |  FROM cells JOIN rowm USING (event_type) JOIN colm USING (isodow) CROSS JOIN tot
       |),
       |hx AS (
       |  SELECT CAST(sum(r * (${qlnSql("n")} - ${qlnSql("r")})) AS BIGINT) AS hx_num
       |  FROM rowm CROSS JOIN tot
       |),
       |hy AS (
       |  SELECT CAST(sum(c * (${qlnSql("n")} - ${qlnSql("c")})) AS BIGINT) AS hy_num
       |  FROM colm CROSS JOIN tot
       |)
       |SELECT n_cells, n AS n_total,
       |  CAST(hx_num AS DOUBLE) / CAST(n AS DOUBLE) / $miScale AS h_type,
       |  CAST(hy_num AS DOUBLE) / CAST(n AS DOUBLE) / $miScale AS h_dow,
       |  CAST(mi_num AS DOUBLE) / CAST(n AS DOUBLE) / $miScale AS mi_nats,
       |  CAST(mi_num AS DOUBLE) / CAST(least(hx_num, hy_num) AS DOUBLE) AS nmi
       |FROM tot CROSS JOIN mi CROSS JOIN hx CROSS JOIN hy""".stripMargin

  // --- Cross-type correlation of daily volumes (co-movement matrix) ---

  /** PEARSON CORRELATION MATRIX of daily event volumes across event
    * types — do clicks and purchases co-move day over day, or does the
    * error stream spike independently? The co-movement view drift
    * dashboards pair with [[qEventMi]]'s within-event dependence: MI asks
    * "does one event's type predict its timing", this asks "do the
    * SERIES move together" — leading indicators, shared seasonality,
    * incident correlation.
    *
    * Correctness guard: the day×type grid is ZERO-FILLED before
    * correlating (a day where a type is absent is a 0 observation, not a
    * missing row) — correlating only co-present days is the classic
    * silent bias. All five Pearson sums (Σx, Σy, Σxy, Σx², Σy²) are over
    * INTEGER counts, so every accumulation is exact; the only float math
    * is the final one-shot formula.
    *
    * Scale (100 TB): ONE corpus-sized partial agg to |days|×|types|
    * cells; the grid fill is a broadcast cross of two tiny distinct
    * frames; the pair expansion self-joins the CELL table on day (fan-out
    * C(|types|,2) per day — type-count-bounded, never corpus); output is
    * |types|²-bounded. Nothing after the first agg touches the corpus.
    */
  def qEventTypeCorr(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.events(spark, sfDir)
      .groupBy(to_date($"ts").as("day"), $"event_type")
      .agg(count(lit(1)).as("n"))
    val grid = cells.select($"day").distinct()
      .crossJoin(broadcast(cells.select($"event_type").distinct()))
      .join(cells, Seq("day", "event_type"), "left")
      .select($"day", $"event_type", coalesce($"n", lit(0L)).as("n"))
    val pairs = grid.as("a")
      .join(grid.as("b"),
        col("a.day") === col("b.day") &&
          col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
        col("a.n").as("x"), col("b.n").as("y"))
    pairs.groupBy($"type_a", $"type_b")
      .agg(count(lit(1)).as("n_days"),
        sum($"x").as("sx"), sum($"y").as("sy"), sum($"x" * $"y").as("sxy"),
        sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"))
      .select($"type_a", $"type_b", $"n_days", $"sx", $"sy", $"sxy",
        (($"n_days" * $"sxy" - $"sx" * $"sy").cast("double") /
          sqrt(($"n_days" * $"sxx" - $"sx" * $"sx").cast("double") *
            ($"n_days" * $"syy" - $"sy" * $"sy").cast("double"))).as("pearson_r"))
      .orderBy($"type_a", $"type_b")
  }

  val qEventTypeCorrSql: String =
    """WITH cells AS (
      |  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
      |  FROM events GROUP BY 1, 2
      |),
      |grid AS (
      |  SELECT d.day, t.event_type, COALESCE(c.n, 0) AS n
      |  FROM (SELECT DISTINCT day FROM cells) d
      |  CROSS JOIN (SELECT DISTINCT event_type FROM cells) t
      |  LEFT JOIN cells c ON c.day = d.day AND c.event_type = t.event_type
      |),
      |pairs AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |         a.n AS x, b.n AS y
      |  FROM grid a JOIN grid b
      |    ON a.day = b.day AND a.event_type < b.event_type
      |)
      |SELECT type_a, type_b, count(*) AS n_days,
      |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |  CAST(sum(x * y) AS BIGINT) AS sxy,
      |  CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS DOUBLE)
      |    / sqrt(CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS DOUBLE)
      |         * CAST(count(*) * sum(y * y) - sum(y) * sum(y) AS DOUBLE))
      |    AS pearson_r
      |FROM pairs GROUP BY type_a, type_b
      |ORDER BY type_a, type_b""".stripMargin

  // --- Cross-type audience overlap (distinct-user Jaccard matrix) ---

  /** AUDIENCE OVERLAP between event types — for each type pair, how many
    * distinct users emitted both, with the Jaccard of their user sets.
    * The segmentation primitive behind funnel design and feature-flag
    * targeting ("what share of purchasers also hit errors?"), and the
    * exact counterpart the [[graft.ext.Sketches]] approximate set ops
    * would estimate at extreme cardinalities.
    *
    * Scale (100 TB): instances collapse map-side to the distinct
    * (user, type) PRESENCE table — the only corpus-sized exchange; the
    * pair expansion self-joins presence ON USER with fan-out
    * C(types-per-user, 2) ≤ C(|types|, 2) — type-count-bounded per user,
    * never corpus-shaped. Per-type audience sizes ride a |types|-row
    * broadcast. At billions of users this exact plan still holds (the
    * shuffle key is user_id, perfectly spreadable); only at
    * trillion-scale set sizes would the sketch path take over.
    */
  def qEventUserOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ut = Tables.events(spark, sfDir)
      .select($"user_id", $"event_type").distinct()
    val sizes = ut.groupBy($"event_type").agg(count(lit(1)).as("nu"))
    val both = ut.as("a")
      .join(ut.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    both
      .join(broadcast(sizes.select($"event_type".as("type_a"), $"nu".as("n_a"))),
        "type_a")
      .join(broadcast(sizes.select($"event_type".as("type_b"), $"nu".as("n_b"))),
        "type_b")
      .select($"type_a", $"type_b", $"n_a", $"n_b", $"n_both",
        ($"n_both".cast("double") /
          ($"n_a" + $"n_b" - $"n_both").cast("double")).as("jaccard"))
      .orderBy($"type_a", $"type_b")
  }

  val qEventUserOverlapSql: String =
    """WITH ut AS (
      |  SELECT DISTINCT user_id, event_type FROM events
      |),
      |sizes AS (
      |  SELECT event_type, count(*) AS nu FROM ut GROUP BY event_type
      |),
      |overlap AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |         count(*) AS n_both
      |  FROM ut a JOIN ut b
      |    ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY a.event_type, b.event_type
      |)
      |SELECT type_a, type_b, sa.nu AS n_a, sb.nu AS n_b, n_both,
      |  CAST(n_both AS DOUBLE) / CAST(sa.nu + sb.nu - n_both AS DOUBLE)
      |    AS jaccard
      |FROM overlap
      |JOIN sizes sa ON sa.event_type = type_a
      |JOIN sizes sb ON sb.event_type = type_b
      |ORDER BY type_a, type_b""".stripMargin

  // --- Markov next-event prediction with a leakage-free temporal split ---

  /** First-order MARKOV next-event-type prediction, evaluated with a
    * LEAKAGE-FREE TEMPORAL SPLIT: transition counts are fit on
    * transitions completing before the cut (2024-01-25), the per-state
    * argmax (ties → lexicographically smaller type, deterministic) is the
    * model, and accuracy is scored only on transitions completing at or
    * after the cut. The protocol — not the tiny model — is the operator:
    * a temporal split where the EVALUATION events never feed the fitted
    * counts is exactly the contamination discipline [[graft.ext.Dedup]]'s
    * decontamination op enforces for corpora, applied to behavioral
    * modeling; the skyline accuracy of a one-step Markov chain is also
    * the baseline any sequence model must beat to justify itself.
    *
    * Scale (100 TB): transition extraction is ONE user-keyed window
    * (lead over (ts, event_id) — the sessionization exchange, perfectly
    * key-spread); the fitted model is |types|² counts, broadcast to the
    * test arm; scoring is a map-side join. Per-state output.
    */
  def qEventMarkovEval(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cut = lit("2024-01-25").cast("timestamp")
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val pairs = Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type".as("prev_type"),
        lead($"event_type", 1).over(w).as("next_type"),
        lead($"ts", 1).over(w).as("next_ts"))
      .filter($"next_type".isNotNull)
    val train = pairs.filter($"next_ts" < cut)
      .groupBy($"prev_type", $"next_type").agg(count(lit(1)).as("n"))
    val wArg = Window.partitionBy($"prev_type")
      .orderBy($"n".desc, $"next_type")
    val model = train.withColumn("rk", row_number().over(wArg))
      .filter($"rk" === 1)
      .select($"prev_type", $"next_type".as("predicted"), $"n".as("n_train_wins"))
    pairs.filter($"next_ts" >= cut)
      .join(broadcast(model), Seq("prev_type"))
      .groupBy($"prev_type", $"predicted")
      .agg(count(lit(1)).as("n_test"),
        sum(when($"next_type" === $"predicted", 1L).otherwise(0L)).as("n_correct"))
      .select($"prev_type", $"predicted", $"n_test", $"n_correct",
        ($"n_correct".cast("double") / $"n_test".cast("double")).as("accuracy"))
      .orderBy($"prev_type")
  }

  val qEventMarkovEvalSql: String =
    """WITH pairs AS (
      |  SELECT user_id, event_type AS prev_type,
      |    lead(event_type) OVER w AS next_type,
      |    lead(ts) OVER w AS next_ts
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |),
      |train AS (
      |  SELECT prev_type, next_type, count(*) AS n
      |  FROM pairs
      |  WHERE next_type IS NOT NULL AND next_ts < TIMESTAMP '2024-01-25'
      |  GROUP BY prev_type, next_type
      |),
      |model AS (
      |  SELECT prev_type, next_type AS predicted
      |  FROM (SELECT *, row_number() OVER (PARTITION BY prev_type
      |          ORDER BY n DESC, next_type) AS rk FROM train)
      |  WHERE rk = 1
      |)
      |SELECT prev_type, predicted, count(*) AS n_test,
      |  CAST(sum(CASE WHEN next_type = predicted THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_correct,
      |  CAST(sum(CASE WHEN next_type = predicted THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) AS accuracy
      |FROM pairs JOIN model USING (prev_type)
      |WHERE next_type IS NOT NULL AND next_ts >= TIMESTAMP '2024-01-25'
      |GROUP BY prev_type, predicted
      |ORDER BY prev_type""".stripMargin

  // --- Market-basket association rules over order line items ---

  /** Minimum pair co-occurrence count for [[qBasketRules]] — the
    * classic min-support cut that keeps the rule table signal, not
    * noise (and bounds output size at any corpus scale).
    */
  final val basketMinSupport = 3

  /** MARKET-BASKET ASSOCIATION RULES over order baskets: part pairs
    * co-purchased in ≥ [[basketMinSupport]] orders, emitted as DIRECTED
    * rules with the three standard measures — support (share of all
    * baskets), confidence (P(consequent | antecedent)) and lift
    * (observed co-rate over independence). The frequent-itemset
    * primitive (Apriori at k=2) behind recommendations and cross-sell
    * analytics; lift > 1 marks genuinely associated parts, and both
    * directions of a pair are emitted because confidence is asymmetric.
    *
    * Everything up to the final three ratios is exact integer counting.
    *
    * Scale (100 TB): the basket table collapses to distinct
    * (order, part) map-side; the pair join is per-order with fan-out
    * C(basket width, 2) — width-bounded (≤ 7 here; real baskets tens),
    * never corpus-shaped, and the min-support filter is pushed into the
    * pair aggregate. Item and basket totals ride broadcast frames.
    * k > 2 itemsets iterate the same join-prune loop (Apriori) with
    * support-pruned candidates.
    */
  def qBasketRules(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val items = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("p")).distinct()
    val nBaskets = items.select($"ok").distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemN = items.groupBy($"p").agg(count(lit(1)).as("np"))
    val pairs = items.as("a")
      .join(items.as("b"), col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
      .agg(count(lit(1)).as("n_both"))
      .filter($"n_both" >= basketMinSupport)
    val directed = pairs.select($"pa".as("antecedent"), $"pb".as("consequent"), $"n_both")
      .unionAll(pairs.select($"pb".as("antecedent"), $"pa".as("consequent"), $"n_both"))
    directed
      .join(broadcast(itemN.select($"p".as("antecedent"), $"np".as("n_ante"))),
        "antecedent")
      .join(broadcast(itemN.select($"p".as("consequent"), $"np".as("n_cons"))),
        "consequent")
      .crossJoin(broadcast(nBaskets))
      .select($"antecedent", $"consequent", $"n_ante", $"n_cons", $"n_both",
        ($"n_both".cast("double") / $"n_baskets".cast("double")).as("support"),
        ($"n_both".cast("double") / $"n_ante".cast("double")).as("confidence"),
        (($"n_both" * $"n_baskets").cast("double") /
          ($"n_ante" * $"n_cons").cast("double")).as("lift"))
      .orderBy($"antecedent", $"consequent")
  }

  val qBasketRulesSql: String =
    s"""WITH items AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
       |),
       |nb AS (SELECT count(DISTINCT ok) AS n_baskets FROM items),
       |item_n AS (SELECT p, count(*) AS np FROM items GROUP BY p),
       |pairs AS (
       |  SELECT a.p AS pa, b.p AS pb, count(*) AS n_both
       |  FROM items a JOIN items b ON a.ok = b.ok AND a.p < b.p
       |  GROUP BY a.p, b.p
       |  HAVING count(*) >= $basketMinSupport
       |),
       |directed AS (
       |  SELECT pa AS antecedent, pb AS consequent, n_both FROM pairs
       |  UNION ALL
       |  SELECT pb AS antecedent, pa AS consequent, n_both FROM pairs
       |)
       |SELECT antecedent, consequent,
       |  na.np AS n_ante, nc.np AS n_cons, n_both,
       |  CAST(n_both AS DOUBLE) / CAST(n_baskets AS DOUBLE) AS support,
       |  CAST(n_both AS DOUBLE) / CAST(na.np AS DOUBLE) AS confidence,
       |  CAST(n_both * n_baskets AS DOUBLE) / CAST(na.np * nc.np AS DOUBLE)
       |    AS lift
       |FROM directed
       |JOIN item_n na ON na.p = antecedent
       |JOIN item_n nc ON nc.p = consequent
       |CROSS JOIN nb
       |ORDER BY antecedent, consequent""".stripMargin

  // --- Watermark-lateness audit under a deterministic arrival model ---

  /** Max synthetic network delay (seconds) for [[qEventLateness]]'s
    * arrival model, and the candidate watermark delays the audit prices.
    */
  final val latenessMaxDelay = 120L

  /** WATERMARK-SETTING AUDIT: how late do events arrive relative to the
    * event-time frontier, and what fraction would each candidate
    * watermark delay drop? The shipped events table is perfectly
    * time-ordered (generator artifact), so the audit applies a
    * DETERMINISTIC arrival model — per-event network delay =
    * hash(event_id) mod [[latenessMaxDelay]] seconds — and measures each
    * event's lateness against the frontier (max event time among
    * earlier-ARRIVING events, at one-second granularity). Output: one
    * row with the lateness distribution (on-time / ≤10 s / ≤30 s /
    * ≤60 s / beyond) and the drop count at watermark delays 10/30/60 s —
    * the exact table you read before choosing `withWatermark`
    * ([[graft.streaming.EventStreams]] consumes the resulting bound).
    *
    * Scale (100 TB): the frontier is computed on a per-ARRIVAL-SECOND
    * bucket table — max event-time per second, then one running-max
    * window over the bucket table, whose cardinality is the TIME SPAN in
    * seconds, independent of corpus size (2.6 M rows per month at any
    * SF); events join their bucket's previous-second frontier by key.
    * No corpus-wide window, no per-event sort; the one corpus shuffle is
    * the second-bucket aggregate.
    */
  def qEventLateness(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select($"event_id", unix_micros($"ts").as("et_us"))
      .withColumn("delay_s",
        pmod(graft.ext.TextOps.portableHash($"event_id".cast("string")),
          lit(latenessMaxDelay)))
      .withColumn("asec", expr("(et_us + delay_s * 1000000L) div 1000000L"))
    val buckets = ev.groupBy($"asec").agg(max($"et_us").as("mx"))
    val wRun = Window.orderBy($"asec")
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = buckets
      .select($"asec", max($"mx").over(wRun).as("frontier_us"))
    ev.join(frontier, "asec")
      .select(
        greatest(lit(0L), $"frontier_us" - $"et_us").as("late_us"))
      .agg(count(lit(1)).as("n_events"),
        sum(when($"late_us" > 0, 1L).otherwise(0L)).as("n_late"),
        sum(when($"late_us" > 0 && $"late_us" <= 10000000L, 1L).otherwise(0L))
          .as("late_10s"),
        sum(when($"late_us" > 10000000L && $"late_us" <= 30000000L, 1L).otherwise(0L))
          .as("late_10_30s"),
        sum(when($"late_us" > 30000000L && $"late_us" <= 60000000L, 1L).otherwise(0L))
          .as("late_30_60s"),
        sum(when($"late_us" > 60000000L, 1L).otherwise(0L)).as("late_over_60s"),
        sum(when($"late_us" > 10000000L, 1L).otherwise(0L)).as("dropped_at_10s"),
        sum(when($"late_us" > 30000000L, 1L).otherwise(0L)).as("dropped_at_30s"),
        sum(when($"late_us" > 60000000L, 1L).otherwise(0L)).as("dropped_at_60s"),
        expr("max(late_us) div 1000000L").as("max_lateness_s"))
  }

  val qEventLatenessSql: String =
    s"""WITH ev AS (
       |  SELECT event_id, epoch_us(ts) AS et_us,
       |    (${graft.ext.TextOps.portableHashSql("CAST(event_id AS VARCHAR)")}) % $latenessMaxDelay AS delay_s
       |  FROM events
       |),
       |ev2 AS (
       |  SELECT *, (et_us + delay_s * 1000000) // 1000000 AS asec FROM ev
       |),
       |buckets AS (SELECT asec, max(et_us) AS mx FROM ev2 GROUP BY asec),
       |frontier AS (
       |  SELECT asec, max(mx) OVER (ORDER BY asec
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS frontier_us
       |  FROM buckets
       |),
       |lat AS (
       |  SELECT greatest(0, frontier_us - et_us) AS late_us
       |  FROM ev2 JOIN frontier USING (asec)
       |)
       |SELECT count(*) AS n_events,
       |  CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       |  CAST(sum(CASE WHEN late_us > 0 AND late_us <= 10000000 THEN 1 ELSE 0 END) AS BIGINT) AS late_10s,
       |  CAST(sum(CASE WHEN late_us > 10000000 AND late_us <= 30000000 THEN 1 ELSE 0 END) AS BIGINT) AS late_10_30s,
       |  CAST(sum(CASE WHEN late_us > 30000000 AND late_us <= 60000000 THEN 1 ELSE 0 END) AS BIGINT) AS late_30_60s,
       |  CAST(sum(CASE WHEN late_us > 60000000 THEN 1 ELSE 0 END) AS BIGINT) AS late_over_60s,
       |  CAST(sum(CASE WHEN late_us > 10000000 THEN 1 ELSE 0 END) AS BIGINT) AS dropped_at_10s,
       |  CAST(sum(CASE WHEN late_us > 30000000 THEN 1 ELSE 0 END) AS BIGINT) AS dropped_at_30s,
       |  CAST(sum(CASE WHEN late_us > 60000000 THEN 1 ELSE 0 END) AS BIGINT) AS dropped_at_60s,
       |  max(late_us) // 1000000 AS max_lateness_s
       |FROM lat""".stripMargin

  // --- Arrival-process dispersion: Fano factor per event type ---

  /** ARRIVAL-PROCESS DISPERSION audit: per event type, the mean and
    * variance of DAILY counts over the zero-filled day grid and their
    * ratio (the Fano factor). A Poisson arrival process has Fano ≈ 1;
    * materially above means bursty/overdispersed arrivals — and every
    * alarm threshold, capacity plan or anomaly score that assumes
    * Poisson (√n noise bands) is miscalibrated for that stream. This is
    * the one-row-per-type check you run BEFORE trusting
    * [[qEventAnomalies]]-style z-scores.
    *
    * Variance numerator n·Σx²−(Σx)² is exact integer arithmetic; the
    * final divisions are the only float steps.
    *
    * Scale: same cell table as [[qEventTypeCorr]] (one corpus agg to
    * |days|×|types|), then a |types|-row rollup.
    */
  def qEventDispersion(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.events(spark, sfDir)
      .groupBy(to_date($"ts").as("day"), $"event_type")
      .agg(count(lit(1)).as("n"))
    val grid = cells.select($"day").distinct()
      .crossJoin(broadcast(cells.select($"event_type").distinct()))
      .join(cells, Seq("day", "event_type"), "left")
      .select($"event_type", coalesce($"n", lit(0L)).as("x"))
    grid.groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"), sum($"x").as("sx"),
        sum($"x" * $"x").as("sxx"))
      .select($"event_type", $"n_days", $"sx".as("total"),
        ($"sx".cast("double") / $"n_days".cast("double")).as("mean_daily"),
        (($"n_days" * $"sxx" - $"sx" * $"sx").cast("double") /
          ($"n_days" * ($"n_days" - 1)).cast("double")).as("var_daily"),
        ((($"n_days" * $"sxx" - $"sx" * $"sx") * lit(1L)).cast("double") /
          (($"n_days" - 1) * $"sx").cast("double")).as("fano"))
      .orderBy($"event_type")
  }

  val qEventDispersionSql: String =
    """WITH cells AS (
      |  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
      |  FROM events GROUP BY 1, 2
      |),
      |grid AS (
      |  SELECT t.event_type, COALESCE(c.n, 0) AS x
      |  FROM (SELECT DISTINCT day FROM cells) d
      |  CROSS JOIN (SELECT DISTINCT event_type FROM cells) t
      |  LEFT JOIN cells c ON c.day = d.day AND c.event_type = t.event_type
      |)
      |SELECT event_type, count(*) AS n_days,
      |  CAST(sum(x) AS BIGINT) AS total,
      |  CAST(sum(x) AS DOUBLE) / count(*) AS mean_daily,
      |  CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS DOUBLE)
      |    / CAST(count(*) * (count(*) - 1) AS DOUBLE) AS var_daily,
      |  CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS DOUBLE)
      |    / CAST((count(*) - 1) * sum(x) AS DOUBLE) AS fano
      |FROM grid GROUP BY event_type ORDER BY event_type""".stripMargin

  // --- A/B experiment readout with CUPED variance reduction ---

  /** A/B EXPERIMENT READOUT with CUPED variance reduction — the
    * experimentation-platform core: users are deterministically hashed
    * into two arms (the real assignment mechanism — stable, uniform,
    * join-free), per-user PRE-period (before 2024-01-15) and POST-period
    * spend are aggregated in exact integer cents, and the readout emits
    * per arm the user count, mean post spend, post variance, and the
    * CUPED-adjusted variance var(Y)·(1−ρ²) using the pooled
    * θ = cov(post, pre)/var(pre) — the Deng et al. 2013 estimator in its
    * closed algebraic form, so no per-user float adjustment pass exists
    * at all. `var_reduction_pct` is the fraction of readout noise the
    * pre-period covariate removes — the number that decides how long the
    * experiment must run.
    *
    * All moment numerators (n·Σxy − Σx·Σy etc.) accumulate in exact
    * BIGINT cents²; the only float steps are the final closed-form
    * divisions. (Past ~10⁹ users × large spend the cents² sums need
    * DECIMAL(38) partials — same mergeability, wider lanes.)
    *
    * Scale (100 TB): ONE user-keyed partial agg over the fact stream
    * (pre/post conditional sums collapse map-side), then a 2-row arm
    * rollup. No joins, no windows, no second corpus pass.
    */
  def qEventAbCuped(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cut = lit("2024-01-15").cast("timestamp")
    val perUser = Tables.events(spark, sfDir)
      .select($"user_id", $"ts",
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy($"user_id")
      .agg(sum(when($"ts" < cut, $"cents").otherwise(0L)).as("pre"),
        sum(when($"ts" >= cut, $"cents").otherwise(0L)).as("post"))
      .withColumn("arm",
        pmod(graft.ext.TextOps.portableHash($"user_id".cast("string")), lit(2L))
          .cast("int"))
    val arms = perUser.groupBy($"arm")
      .agg(count(lit(1)).as("n_users"),
        sum($"post").as("sy"), sum($"post" * $"post").as("syy"),
        sum($"pre").as("sx"), sum($"pre" * $"pre").as("sxx"),
        sum($"pre" * $"post").as("sxy"))
    // pooled theta from BOTH arms (standard CUPED practice: the
    // covariate relationship is assignment-independent by design)
    val pooled = perUser
      .agg(count(lit(1)).as("n"),
        sum($"post").as("py"), sum($"pre").as("px"),
        sum($"pre" * $"post").as("pxy"), sum($"pre" * $"pre").as("pxx"))
      .select($"n", $"px", $"pxx", $"pxy", $"py",
        (($"n" * $"pxy" - $"px" * $"py").cast("double") /
          ($"n" * $"pxx" - $"px" * $"px").cast("double")).as("theta"))
    arms.crossJoin(broadcast(pooled.select($"theta")))
      .select($"arm", $"n_users",
        ($"sy".cast("double") / $"n_users".cast("double") / 100.0)
          .as("mean_post"),
        (($"n_users" * $"syy" - $"sy" * $"sy").cast("double") /
          ($"n_users" * ($"n_users" - 1)).cast("double") / 10000.0)
          .as("var_post"),
        $"theta",
        ((($"n_users" * $"syy" - $"sy" * $"sy").cast("double") -
          lit(2.0) * $"theta" * ($"n_users" * $"sxy" - $"sx" * $"sy").cast("double") +
          $"theta" * $"theta" * ($"n_users" * $"sxx" - $"sx" * $"sx").cast("double")) /
          ($"n_users" * ($"n_users" - 1)).cast("double") / 10000.0)
          .as("var_cuped"))
      .withColumn("var_reduction_pct",
        (lit(1.0) - $"var_cuped" / $"var_post") * 100.0)
      .orderBy($"arm")
  }

  val qEventAbCupedSql: String =
    s"""WITH per_user AS (
       |  SELECT user_id,
       |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-15'
       |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT)
       |      AS pre,
       |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-15'
       |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT)
       |      AS post,
       |    CAST((${graft.ext.TextOps.portableHashSql("CAST(user_id AS VARCHAR)")}) % 2
       |      AS INTEGER) AS arm
       |  FROM events GROUP BY user_id
       |),
       |arms AS (
       |  SELECT arm, count(*) AS n_users,
       |    CAST(sum(post) AS BIGINT) AS sy, CAST(sum(post * post) AS BIGINT) AS syy,
       |    CAST(sum(pre) AS BIGINT) AS sx, CAST(sum(pre * pre) AS BIGINT) AS sxx,
       |    CAST(sum(pre * post) AS BIGINT) AS sxy
       |  FROM per_user GROUP BY arm
       |),
       |pooled AS (
       |  SELECT CAST(count(*) * sum(pre * post) - sum(pre) * sum(post) AS DOUBLE)
       |       / CAST(count(*) * sum(pre * pre) - sum(pre) * sum(pre) AS DOUBLE)
       |       AS theta
       |  FROM per_user
       |)
       |SELECT arm, n_users,
       |  CAST(sy AS DOUBLE) / n_users / 100.0 AS mean_post,
       |  CAST(n_users * syy - sy * sy AS DOUBLE)
       |    / CAST(n_users * (n_users - 1) AS DOUBLE) / 10000.0 AS var_post,
       |  theta,
       |  (CAST(n_users * syy - sy * sy AS DOUBLE)
       |    - 2.0 * theta * CAST(n_users * sxy - sx * sy AS DOUBLE)
       |    + theta * theta * CAST(n_users * sxx - sx * sx AS DOUBLE))
       |    / CAST(n_users * (n_users - 1) AS DOUBLE) / 10000.0 AS var_cuped,
       |  (1.0 - ((CAST(n_users * syy - sy * sy AS DOUBLE)
       |    - 2.0 * theta * CAST(n_users * sxy - sx * sy AS DOUBLE)
       |    + theta * theta * CAST(n_users * sxx - sx * sx AS DOUBLE))
       |    / CAST(n_users * (n_users - 1) AS DOUBLE) / 10000.0)
       |    / (CAST(n_users * syy - sy * sy AS DOUBLE)
       |    / CAST(n_users * (n_users - 1) AS DOUBLE) / 10000.0)) * 100.0
       |    AS var_reduction_pct
       |FROM arms CROSS JOIN pooled
       |ORDER BY arm""".stripMargin

  // --- User-lifetime survival curve (retention beyond cohort grids) ---

  /** USER-LIFETIME SURVIVAL CURVE: for each day offset t, the share of
    * users whose observed lifetime (days between first and last event)
    * reaches at least t — S(t) — plus the discrete hazard
    * h(t) = P(lifetime = t | lifetime ≥ t), the churn-risk-by-age view
    * that [[qEventCohortRetention]]'s cohort×week grid cannot show
    * directly. The standard caveat applies and is part of the operator's
    * contract: lifetimes here are right-censored by the stream horizon
    * (a user still active at the last observed day has lifetime ≥
    * observed), so S(t) is the EMPIRICAL curve over observed spans —
    * Kaplan–Meier censor-weighting is the extension once a real
    * "still-subscribed" flag exists.
    *
    * All counts exact integers; survival/hazard are one-shot divisions.
    *
    * Scale (100 TB): ONE user-keyed partial agg (min/max day collapse
    * map-side) to the user-grain lifetime table, one |lifetimes|-sized
    * histogram agg, then a window over ≤|distinct lifetimes| rows
    * (days-bounded, corpus-size-independent) for the tail-cumulative
    * sum. No corpus-wide window.
    */
  def qEventSurvival(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val lifetimes = Tables.events(spark, sfDir)
      .groupBy($"user_id")
      .agg(datediff(max(to_date($"ts")), min(to_date($"ts"))).as("lt"))
    val hist = lifetimes.groupBy($"lt").agg(count(lit(1)).as("n_end"))
    val wTail = Window.orderBy($"lt")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wAll = Window.orderBy($"lt")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    hist
      .select($"lt".as("t_days"), $"n_end",
        sum($"n_end").over(wTail).as("n_at_risk"),
        sum($"n_end").over(wAll).as("n_users"))
      .select($"t_days", $"n_end", $"n_at_risk",
        ($"n_at_risk".cast("double") / $"n_users".cast("double")).as("survival"),
        ($"n_end".cast("double") / $"n_at_risk".cast("double")).as("hazard"))
      .orderBy($"t_days")
  }

  val qEventSurvivalSql: String =
    """WITH lt AS (
      |  SELECT user_id,
      |    date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE))) AS lt
      |  FROM events GROUP BY user_id
      |),
      |hist AS (SELECT lt, count(*) AS n_end FROM lt GROUP BY lt)
      |SELECT CAST(lt AS INTEGER) AS t_days, n_end,
      |  CAST(sum(n_end) OVER (ORDER BY lt
      |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
      |    AS n_at_risk,
      |  CAST(sum(n_end) OVER (ORDER BY lt
      |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS DOUBLE)
      |    / CAST(sum(n_end) OVER () AS DOUBLE) AS survival,
      |  CAST(n_end AS DOUBLE)
      |    / CAST(sum(n_end) OVER (ORDER BY lt
      |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS DOUBLE)
      |    AS hazard
      |FROM hist ORDER BY t_days""".stripMargin

  // --- Lead–lag cross-correlation between event-type series ---

  /** Max day offset for [[qEventCrossCorr]]. */
  final val xcorrMaxLag = 3

  /** LEAD–LAG CROSS-CORRELATION between daily event-type volumes: for
    * every ORDERED type pair and lag ℓ ∈ 0..[[xcorrMaxLag]], the Pearson
    * correlation of x(day) against y(day+ℓ) over the zero-filled grid —
    * the leading-indicator scan [[qEventTypeCorr]]'s contemporaneous
    * matrix cannot see (signups today correlating with purchases in two
    * days is invisible at lag 0). Ordered pairs because lead–lag is
    * asymmetric; the overlap shrinks by ℓ days and `n_days` reports it.
    * All five Pearson sums are exact integers.
    *
    * Scale (100 TB): one corpus agg to |days|×|types| cells; the lag
    * join shifts the grid on the day key (cell-sized equi-join per lag,
    * unioned); output is |types|²·(lags+1) rows.
    */
  def qEventCrossCorr(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.events(spark, sfDir)
      .groupBy(to_date($"ts").as("day"), $"event_type")
      .agg(count(lit(1)).as("n"))
    val grid = cells.select($"day").distinct()
      .crossJoin(broadcast(cells.select($"event_type").distinct()))
      .join(cells, Seq("day", "event_type"), "left")
      .select($"day", $"event_type", coalesce($"n", lit(0L)).as("n"))
      .persist()
    grid.count() // eager: one join pair per lag
    val arms = (0 to xcorrMaxLag).map { lag =>
      grid.as("a")
        .join(grid.as("b"),
          expr(s"date_add(a.day, $lag)") === col("b.day") &&
            col("a.event_type") =!= col("b.event_type"))
        .select(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
          lit(lag).as("lag"), col("a.n").as("x"), col("b.n").as("y"))
    }
    arms.reduce(_.unionAll(_))
      .groupBy($"type_a", $"type_b", $"lag")
      .agg(count(lit(1)).as("n_days"),
        sum($"x").as("sx"), sum($"y").as("sy"), sum($"x" * $"y").as("sxy"),
        sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"))
      .select($"type_a", $"type_b", $"lag", $"n_days",
        (($"n_days" * $"sxy" - $"sx" * $"sy").cast("double") /
          sqrt(($"n_days" * $"sxx" - $"sx" * $"sx").cast("double") *
            ($"n_days" * $"syy" - $"sy" * $"sy").cast("double"))).as("xcorr"))
      .orderBy($"type_a", $"type_b", $"lag")
  }

  val qEventCrossCorrSql: String = {
    val arms = (0 to xcorrMaxLag).map { lag =>
      s"""SELECT a.event_type AS type_a, b.event_type AS type_b,
         |  $lag AS lag, a.n AS x, b.n AS y
         |FROM grid a JOIN grid b
         |  ON a.day + INTERVAL $lag DAY = b.day
         | AND a.event_type <> b.event_type""".stripMargin
    }
    s"""WITH cells AS (
       |  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
       |  FROM events GROUP BY 1, 2
       |),
       |grid AS MATERIALIZED (
       |  SELECT d.day, t.event_type, COALESCE(c.n, 0) AS n
       |  FROM (SELECT DISTINCT day FROM cells) d
       |  CROSS JOIN (SELECT DISTINCT event_type FROM cells) t
       |  LEFT JOIN cells c ON c.day = d.day AND c.event_type = t.event_type
       |),
       |arms AS (
       |${arms.mkString("\nUNION ALL\n")}
       |)
       |SELECT type_a, type_b, CAST(lag AS INTEGER) AS lag, count(*) AS n_days,
       |  CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS DOUBLE)
       |    / sqrt(CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS DOUBLE)
       |         * CAST(count(*) * sum(y * y) - sum(y) * sum(y) AS DOUBLE))
       |    AS xcorr
       |FROM arms GROUP BY type_a, type_b, lag
       |ORDER BY type_a, type_b, lag""".stripMargin
  }

  // --- Markov entropy rate: how predictable is the next event ---

  /** CONDITIONAL NEXT-EVENT ENTROPY per state — the information-theoretic
    * companion to [[qEventMarkovEval]]: for each current event type, the
    * entropy H(next | prev) of the full-stream transition distribution
    * in exact micro-nats, plus each state's share of transitions. A
    * state with near-log₂|types| entropy is unpredictable no matter the
    * model; near-zero entropy states are where a sequence model earns
    * accuracy for free — reading this table NEXT TO the eval's accuracy
    * separates "model is weak" from "signal isn't there" (the skyline
    * [[qEventMi]] gives for the type↔time pair, here for type↔type).
    *
    * H_p = Σ_t n_pt·(qln(n_p) − qln(n_pt)) / n_p — BIGINT accumulation,
    * one division.
    *
    * Scale: one user-keyed window for transitions (the sessionization
    * exchange), one |types|²-cell agg, |types|-row output.
    */
  def qEventEntropyRate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val trans = Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type".as("prev_type"),
        lead($"event_type", 1).over(w).as("next_type"))
      .filter($"next_type".isNotNull)
      .groupBy($"prev_type", $"next_type").agg(count(lit(1)).as("n_pt"))
    val byPrev = trans.groupBy($"prev_type").agg(sum($"n_pt").as("n_p"))
    val tot = byPrev.agg(sum($"n_p").as("n_all"))
    trans.join(broadcast(byPrev), "prev_type")
      .groupBy($"prev_type", $"n_p")
      .agg(sum($"n_pt" * (qln($"n_p") - qln($"n_pt"))).as("h_num"),
        count(lit(1)).as("n_branches"))
      .crossJoin(broadcast(tot))
      .select($"prev_type", $"n_p".as("n_transitions"), $"n_branches",
        ($"h_num".cast("double") / $"n_p".cast("double") / miScale)
          .as("h_next_nats"),
        ($"n_p".cast("double") / $"n_all".cast("double")).as("state_share"))
      .orderBy($"prev_type")
  }

  val qEventEntropyRateSql: String =
    s"""WITH pairs AS (
       |  SELECT event_type AS prev_type,
       |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |      AS next_type
       |  FROM events
       |),
       |trans AS (
       |  SELECT prev_type, next_type, count(*) AS n_pt
       |  FROM pairs WHERE next_type IS NOT NULL
       |  GROUP BY prev_type, next_type
       |),
       |by_prev AS (
       |  SELECT prev_type, CAST(sum(n_pt) AS BIGINT) AS n_p
       |  FROM trans GROUP BY prev_type
       |),
       |tot AS (SELECT CAST(sum(n_p) AS BIGINT) AS n_all FROM by_prev)
       |SELECT prev_type, n_p AS n_transitions, count(*) AS n_branches,
       |  CAST(sum(n_pt * (${qlnSql("n_p")} - ${qlnSql("n_pt")})) AS DOUBLE)
       |    / CAST(n_p AS DOUBLE) / $miScale AS h_next_nats,
       |  CAST(n_p AS DOUBLE) / CAST(n_all AS DOUBLE) AS state_share
       |FROM trans JOIN by_prev USING (prev_type) CROSS JOIN tot
       |GROUP BY prev_type, n_p, n_all
       |ORDER BY prev_type""".stripMargin

  // --- Order-to-ship lead time distribution per priority ---

  /** ORDER-TO-SHIP LEAD TIME per order priority: exact day-difference
    * statistics (count, min/max, integer-exact mean) plus a fixed
    * 30/60/90-day bucket histogram — the fulfillment-SLA view of the
    * star schema, and the operational metric behind [[q4_late_orders]]'s
    * late-flag count. Bucket edges are business constants, so the
    * histogram is engine-stable integers end to end.
    *
    * Scale: one fact-side join to orders on the orderkey (the schema's
    * natural co-partition key), one priority-keyed rollup; output is
    * |priorities| rows.
    */
  def qOrderLeadTime(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val lt = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), $"l_orderkey" === $"o_orderkey")
      .select($"o_orderpriority",
        datediff(to_date($"l_shipdate"), to_date($"o_orderdate")).as("days"))
    lt.groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        min($"days").as("min_days"), max($"days").as("max_days"),
        sum($"days").as("sum_days"),
        sum(when($"days" <= 30, 1L).otherwise(0L)).as("d0_30"),
        sum(when($"days" > 30 && $"days" <= 60, 1L).otherwise(0L)).as("d31_60"),
        sum(when($"days" > 60 && $"days" <= 90, 1L).otherwise(0L)).as("d61_90"),
        sum(when($"days" > 90, 1L).otherwise(0L)).as("d_over_90"))
      .select($"o_orderpriority", $"n_lines", $"min_days", $"max_days",
        ($"sum_days".cast("double") / $"n_lines".cast("double")).as("mean_days"),
        $"d0_30", $"d31_60", $"d61_90", $"d_over_90")
      .orderBy($"o_orderpriority")
  }

  val qOrderLeadTimeSql: String =
    """WITH lt AS (
      |  SELECT o_orderpriority,
      |    date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
      |      AS days
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |)
      |SELECT o_orderpriority, count(*) AS n_lines,
      |  CAST(min(days) AS INTEGER) AS min_days,
      |  CAST(max(days) AS INTEGER) AS max_days,
      |  CAST(sum(days) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_days,
      |  CAST(sum(CASE WHEN days <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d0_30,
      |  CAST(sum(CASE WHEN days > 30 AND days <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS d31_60,
      |  CAST(sum(CASE WHEN days > 60 AND days <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS d61_90,
      |  CAST(sum(CASE WHEN days > 90 THEN 1 ELSE 0 END) AS BIGINT) AS d_over_90
      |FROM lt GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // --- Peak concurrency: sweep-line max over open interval counts ---

  /** Daily PEAK CONCURRENCY of open 30-minute visit windows — the
    * continuous-time maximum of "how many intervals are open right now",
    * which no frame-aligned window ([[qEventHopWindow]]) can express: the
    * peak can fall between any two frame edges. Classic sweep line,
    * relationalized: each event opens an interval [s, s+1800) in epoch
    * seconds; intervals emit a +1 marker at open and a −1 at close, an
    * interval crossing midnight re-opens (+1) at the next midnight so
    * every day's sweep is SELF-CONTAINED; markers collapse to one net
    * delta per (day, second); the running prefix sum of net deltas ordered
    * by second is the concurrency level, and its per-day max is the peak.
    * Collapsing per second keeps the half-open semantics exact: within one
    * second closes apply before opens, so the level attained there is
    * max(prev, prev+net) — both prefixes the window emits. All integer,
    * hash-exact cross-engine.
    *
    * Scale (100 TB): the marker explode is a bounded ×(2..3) narrow map;
    * the (day, second) collapse partial-aggregates map-side, so the first
    * exchange carries ≤ 86 400 rows per day REGARDLESS of corpus size —
    * that pre-shrink is what makes the per-day sweep window safe (its
    * day-keyed partition sorts a bounded frame, not the corpus; contrast
    * [[qEventGlobalRunning]], whose two-phase offsets solve the unbounded
    * per-key case). The final day agg reuses the window's partitioning.
    *
    * Output per day: peak concurrency and the number of intervals open at
    * any point during the day (started in-day or carried over midnight).
    */
  /** Collapsed sweep markers for the 30-min visit intervals: one row per
    * (day, second) with the net open/close delta and the count of interval
    * opens (in-day starts + midnight carries) at that second. Shared by
    * [[qEventPeakConcurrency]] and [[qEventCoverage]]. The close marker
    * lives in the day of the interval's LAST OPEN second, (e−1) div 86400 —
    * placing it by e's day would, for an interval ending exactly at
    * midnight, put an unbalanced −1 into a day the interval never touches
    * (half-open [s, e) is closed at the midnight instant).
    */
  /** Collapsed ±1 sweep markers for an arbitrary (s, e) interval frame
    * (epoch seconds, half-open, each interval crossing AT MOST one
    * midnight — one re-open marker; a multi-day generalization would
    * explode one carry per crossed day). See [[sweepMarkers]] for the
    * marker-placement reasoning.
    */
  private[graft] def sweepMarkersOf(iv: DataFrame): DataFrame =
    iv.select(explode(expr(
      """filter(array(
        |  struct(s div 86400 AS day, s AS t, 1L AS delta, 1L AS opens),
        |  struct((e - 1) div 86400 AS day, e AS t, -1L AS delta, 0L AS opens),
        |  IF((e - 1) div 86400 > s div 86400,
        |     struct((e - 1) div 86400 AS day, ((e - 1) div 86400) * 86400L AS t,
        |            1L AS delta, 1L AS opens),
        |     NULL)), m -> m IS NOT NULL)""".stripMargin)).as("m"))
      .select(col("m.day").as("day"), col("m.t").as("t"),
        col("m.delta").as("delta"), col("m.opens").as("opens"))
      .groupBy(col("day"), col("t"))
      .agg(sum(col("delta")).as("net"), sum(col("opens")).as("opens"))

  private def sweepMarkers(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    sweepMarkersOf(Tables.events(spark, sfDir)
      .select(expr("unix_micros(ts) div 1000000").as("s"))
      .withColumn("e", $"s" + lit(1800L)))
  }

  /** Interval-generic peak-concurrency kernel over an (s, e) epoch-second
    * frame (half-open [s, e)) → (day, peak_concurrency, n_open).
    * PropertiesSpec checks it against a brute-force live count on random
    * interval sets including midnight-crossers and exact-midnight ends.
    */
  private[graft] def peakConcurrencyOf(iv: DataFrame): DataFrame = {
    val wSweep = Window.partitionBy(col("day")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sweepMarkersOf(iv)
      .select(col("day"), sum(col("net")).over(wSweep).as("conc"), col("opens"))
      .groupBy(col("day"))
      .agg(max(col("conc")).as("peak_concurrency"), sum(col("opens")).as("n_open"))
  }

  def qEventPeakConcurrency(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    peakConcurrencyOf(Tables.events(spark, sfDir)
      .select(expr("unix_micros(ts) div 1000000").as("s"))
      .withColumn("e", $"s" + lit(1800L)))
      .select(expr("date_add(DATE '1970-01-01', CAST(day AS INT))").as("d"),
        $"peak_concurrency", $"n_open")
      .orderBy($"d")
  }

  /** Oracle: the identical sweep — floor-to-second opens (flooring IS the
    * operator's definition of the interval, not an approximation), UNION
    * ALL markers, per-(day,second) net collapse, windowed prefix sum,
    * per-day max. DuckDB's BIGINT sums widen to HUGEINT, so the outputs
    * cast back (the registry-wide sum-type rule).
    */
  /** Shared oracle CTEs mirroring [[sweepMarkers]] — both sweep oracles
    * compose these so the marker semantics cannot drift between them.
    */
  private val sweepCteSql: String =
    """iv AS (
      |  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS s,
      |         CAST(floor(epoch(ts)) AS BIGINT) + 1800 AS e
      |  FROM events
      |),
      |m AS (
      |  SELECT s // 86400 AS day, s AS t, CAST(1 AS BIGINT) AS delta,
      |         CAST(1 AS BIGINT) AS opens
      |  FROM iv
      |  UNION ALL
      |  SELECT (e - 1) // 86400, e, -1, 0 FROM iv
      |  UNION ALL
      |  SELECT (e - 1) // 86400, ((e - 1) // 86400) * 86400, 1, 1
      |  FROM iv WHERE (e - 1) // 86400 > s // 86400
      |),
      |c AS (
      |  SELECT day, t, sum(delta) AS net, sum(opens) AS opens
      |  FROM m GROUP BY day, t
      |)""".stripMargin

  val qEventPeakConcurrencySql: String =
    s"""WITH $sweepCteSql,
      |r AS (
      |  SELECT day, opens,
      |    sum(net) OVER (PARTITION BY day ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
      |  FROM c
      |)
      |SELECT DATE '1970-01-01' + CAST(day AS INTEGER) AS d,
      |  CAST(max(conc) AS BIGINT) AS peak_concurrency,
      |  CAST(sum(opens) AS BIGINT) AS n_open
      |FROM r GROUP BY day ORDER BY d""".stripMargin

  /** Daily COVERAGE — seconds of the day covered by ≥1 open interval (the
    * union length of the 30-min visit windows): "busy time", the
    * concurrency-DEDUPLICATED utilization a billing or capacity dashboard
    * wants where raw `count·1800` double-counts overlap. Same collapsed
    * sweep as [[qEventPeakConcurrency]]; a covered stretch is a marker gap
    * whose running level is positive, so coverage = Σ (next_t − t) over
    * rows with conc > 0, the last gap closing at midnight (an interval
    * still open there carries to the next day's midnight marker). The
    * running sum and the lead ride ONE day-keyed exchange and sort (offset
    * frame ≠ aggregate frame, so Spark plans two Window operators — but
    * zero extra exchanges; plan-asserted). All integer until the one
    * utilization division.
    *
    * Scale (100 TB): identical to the peak sweep — the (day, second)
    * collapse bounds everything downstream at ≤ 86 400 rows/day.
    */
  /** Interval-generic coverage kernel over an (s, e) epoch-second frame →
    * (day, covered_sec). Property-tested alongside [[peakConcurrencyOf]].
    */
  private[graft] def coverageOf(iv: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("day")).orderBy(col("t"))
    val wSweep = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sweepMarkersOf(iv)
      .select(col("day"), col("t"),
        sum(col("net")).over(wSweep).as("conc"),
        lead(col("t"), 1).over(wOrd).as("nxt"))
      .select(col("day"),
        when(col("conc") > 0,
          coalesce(col("nxt"), (col("day") + 1) * 86400L) - col("t")).otherwise(0L)
          .as("covered"))
      .groupBy(col("day"))
      .agg(sum(col("covered")).as("covered_sec"))
  }

  def qEventCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    coverageOf(Tables.events(spark, sfDir)
      .select(expr("unix_micros(ts) div 1000000").as("s"))
      .withColumn("e", $"s" + lit(1800L)))
      .select(expr("date_add(DATE '1970-01-01', CAST(day AS INT))").as("d"),
        $"covered_sec",
        ($"covered_sec".cast("double") / 86400.0d).as("busy_ratio"))
      .orderBy($"d")
  }

  val qEventCoverageSql: String =
    s"""WITH $sweepCteSql,
      |r AS (
      |  SELECT day, t,
      |    sum(net) OVER (PARTITION BY day ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc,
      |    lead(t, 1) OVER (PARTITION BY day ORDER BY t) AS nxt
      |  FROM c
      |)
      |SELECT DATE '1970-01-01' + CAST(day AS INTEGER) AS d,
      |  CAST(sum(CASE WHEN conc > 0
      |    THEN coalesce(nxt, (day + 1) * 86400) - t ELSE 0 END) AS BIGINT)
      |    AS covered_sec,
      |  CAST(sum(CASE WHEN conc > 0
      |    THEN coalesce(nxt, (day + 1) * 86400) - t ELSE 0 END) AS DOUBLE)
      |    / 86400 AS busy_ratio
      |FROM r GROUP BY day ORDER BY d""".stripMargin

  // --- Q7: volume shipping between two nations (dual-direction star) ---

  /** TPC-H Q7 shape: bilateral trade volume between two REGIONS
    * (AMERICA ↔ ASIA) by ship year — the fact joins BOTH its dimension
    * paths (customer geography via orders, supplier geography directly)
    * and keeps rows where the pair matches in either direction. The
    * level is region rather than nation only because the harness's
    * sf0.001 supplier sample covers every region but not every nation —
    * the dual-path disjunctive-predicate shape is identical. The pair
    * predicate evaluates on broadcast-joined dim columns, not as a join
    * condition — the big join stays a plain equi-join on orderkey.
    *
    * Scale: lineitem⋈orders is the one real shuffle (orderkey-keyed);
    * supplier/customer/nation→region chains are broadcast; year
    * extraction and the pair filter are narrow.
    */
  def q7NationVolume(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def geo(prefix: String) = Tables.nation(spark, sfDir)
      .join(Tables.region(spark, sfDir), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey".as(s"${prefix}_nk"), $"r_name".as(s"${prefix}_region"))
    Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(spark, sfDir)), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.supplier(spark, sfDir)), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(geo("c")), $"c_nationkey" === $"c_nk")
      .join(broadcast(geo("s")), $"s_nationkey" === $"s_nk")
      .filter(($"s_region" === "AMERICA" && $"c_region" === "ASIA") ||
        ($"s_region" === "ASIA" && $"c_region" === "AMERICA"))
      .groupBy($"s_region".as("supp_region"), $"c_region".as("cust_region"),
        year($"l_shipdate").as("l_year"))
      .agg(sum(revenue($"l_extendedprice", $"l_discount")).cast("double").as("volume"))
      .orderBy($"supp_region", $"cust_region", $"l_year")
  }

  val q7NationVolumeSql: String =
    """SELECT rs.r_name AS supp_region, rc.r_name AS cust_region,
      |  CAST(date_part('year', l_shipdate) AS INTEGER) AS l_year,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |           (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
      |    AS DOUBLE) AS volume
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation nc ON c_nationkey = nc.n_nationkey
      |JOIN region rc ON nc.n_regionkey = rc.r_regionkey
      |JOIN nation ns ON s_nationkey = ns.n_nationkey
      |JOIN region rs ON ns.n_regionkey = rs.r_regionkey
      |WHERE (rs.r_name = 'AMERICA' AND rc.r_name = 'ASIA')
      |   OR (rs.r_name = 'ASIA' AND rc.r_name = 'AMERICA')
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin

  // --- Q8: market share of one supplier nation within a region ---

  /** TPC-H Q8 shape: NATION_3's share of PROMO-part revenue among
    * region-1 customers, by order year — a conditional-aggregate ratio
    * over a 5-table star. Both the numerator (revenue from NATION_1
    * suppliers) and denominator (all revenue) come from ONE aggregation
    * pass (a `when`-guarded decimal sum), and the share divides the two
    * exact decimals once per year row.
    *
    * Scale: part is the selective filter — it prunes lineitem FIRST
    * (broadcast semi-shape before the orderkey shuffle), so the
    * fact-fact join moves only PROMO rows. Everything else broadcasts.
    */
  def q8MarketShare(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val regionNations = Tables.nation(spark, sfDir)
      .filter($"n_regionkey" === 1).select($"n_nationkey".as("rc_nk"))
    val promoParts = Tables.part(spark, sfDir)
      .filter($"p_type" === "PROMO").select($"p_partkey")
    Tables.lineitem(spark, sfDir)
      .join(broadcast(promoParts), $"l_partkey" === $"p_partkey")
      .join(Tables.orders(spark, sfDir), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(spark, sfDir)), $"o_custkey" === $"c_custkey")
      .join(broadcast(regionNations), $"c_nationkey" === $"rc_nk")
      .join(broadcast(Tables.supplier(spark, sfDir)), $"l_suppkey" === $"s_suppkey")
      .groupBy(year($"o_orderdate").as("o_year"))
      .agg(
        sum(when($"s_nationkey" === 3,
          revenue($"l_extendedprice", $"l_discount"))
          .otherwise(lit(0).cast(DecimalType(18, 4)))).as("nation_rev"),
        sum(revenue($"l_extendedprice", $"l_discount")).as("total_rev"))
      .select($"o_year",
        ($"nation_rev".cast("double") / $"total_rev".cast("double")).as("mkt_share"),
        $"total_rev".cast("double").as("total_rev"))
      .orderBy($"o_year")
  }

  val q8MarketShareSql: String =
    """WITH base AS (
      |  SELECT CAST(date_part('year', o_orderdate) AS INTEGER) AS o_year,
      |    s_nationkey,
      |    CAST(l_extendedprice AS DECIMAL(18,4)) *
      |      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS rev
      |  FROM lineitem
      |  JOIN part     ON l_partkey = p_partkey AND p_type = 'PROMO'
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation   ON c_nationkey = n_nationkey AND n_regionkey = 1
      |  JOIN supplier ON l_suppkey = s_suppkey
      |)
      |SELECT o_year,
      |  CAST(sum(CASE WHEN s_nationkey = 3 THEN rev ELSE CAST(0 AS DECIMAL(18,4)) END)
      |    AS DOUBLE) / CAST(sum(rev) AS DOUBLE) AS mkt_share,
      |  CAST(sum(rev) AS DOUBLE) AS total_rev
      |FROM base GROUP BY o_year ORDER BY o_year""".stripMargin

  // --- Q10: returned-item revenue ranking (top-20 global TakeOrdered) ---

  /** TPC-H Q10 shape: the 20 customers who returned the most revenue in
    * 1998Q1 — per-customer decimal revenue over an orderdate-pruned,
    * returnflag-filtered join, ranked globally. The top-20 plans as
    * TakeOrdered (per-partition heaps), never a full sort; the custkey
    * tiebreak makes the cut deterministic.
    *
    * Scale: the orderdate range prunes orders BEFORE the join (pushed
    * scan filter); returnflag prunes lineitem likewise; the join then
    * shuffles only the quarter's rows. Customer/nation broadcast.
    */
  def q10ReturnedCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir)
      .filter($"o_orderdate" >= lit("1998-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1998-04-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey")
    Tables.lineitem(spark, sfDir)
      .filter($"l_returnflag" === "R")
      .join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(spark, sfDir)), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, sfDir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
      .agg(sum(revenue($"l_extendedprice", $"l_discount")).cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  val q10ReturnedCustomersSql: String =
    """SELECT c_custkey, c_name, c_acctbal, n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |           (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
      |    AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1998-01-01'
      |  AND o_orderdate <  TIMESTAMP '1998-04-01'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  // --- Top user journeys: ordered 3-step sequence pattern mining ---

  /** The 20 most-travelled 3-step event paths (s1 → s2 → s3 over
    * consecutive events of one user) with each path's share of all
    * journeys — sequence-pattern mining one level up from
    * [[qEventTransitions]]' first-order matrix. Consecutive-step pairing
    * is two `lead`s over ONE user-keyed window (same spec, one select →
    * a single Window node); the global top-20 plans as TakeOrdered —
    * never a full sort of the |types|³ path table. The share denominator
    * is a 1-row broadcast; ties at the cut are broken by the path text,
    * so the limit is deterministic cross-engine.
    *
    * Scale: one user exchange + per-user sort for the leads; the path
    * aggregate is |types|³-bounded (a domain constant); TakeOrdered
    * keeps per-partition heaps of 20.
    */
  def qEventJourneys(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val paths = Tables.events(spark, sfDir)
      .select($"user_id", $"event_type".as("s1"),
        lead($"event_type", 1).over(w).as("s2"),
        lead($"event_type", 2).over(w).as("s3"))
      .filter($"s3".isNotNull)
      .groupBy($"s1", $"s2", $"s3").agg(count(lit(1)).as("n"))
    val total = paths.agg(sum($"n").as("tot"))
    paths.crossJoin(broadcast(total))
      .select($"s1", $"s2", $"s3", $"n",
        ($"n".cast("double") / $"tot").as("share"))
      .orderBy($"n".desc, $"s1", $"s2", $"s3")
      .limit(20)
  }

  val qEventJourneysSql: String =
    """WITH seq3 AS (
      |  SELECT s1, s2, s3 FROM (
      |    SELECT event_type AS s1,
      |      lead(event_type, 1) OVER w AS s2,
      |      lead(event_type, 2) OVER w AS s3
      |    FROM events
      |    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |  WHERE s3 IS NOT NULL
      |),
      |paths AS (SELECT s1, s2, s3, count(*) AS n FROM seq3 GROUP BY s1, s2, s3),
      |t AS (SELECT sum(n) AS tot FROM paths)
      |SELECT s1, s2, s3, n, CAST(n AS DOUBLE) / tot AS share
      |FROM paths CROSS JOIN t
      |ORDER BY n DESC, s1, s2, s3
      |LIMIT 20""".stripMargin

  // --- Event-type co-occurrence mining (association / lift analysis) ---

  /** Which event types co-occur in the same user's history more than
    * their individual popularity predicts: for every unordered type pair
    * (a < b), the number of users exhibiting both, and the lift
    * users(a∧b)·N / (users(a)·users(b)) — > 1 means positive association.
    * The single-division double at the end is exact-integer in, correctly
    * rounded out, so it is bit-identical cross-engine.
    *
    * Scale: the corpus first collapses to DISTINCT (user, type) — at most
    * |users|·|types| rows, the only row-scale shuffle. The pair
    * self-join keys on user_id against that already-deduplicated frame,
    * so per-user fan-out is bounded by |types|² (a domain constant, 10
    * pairs here) — never events², never a cross join. Per-type totals
    * are a |types|-row broadcast; the user count is a 1-row broadcast
    * (the [[q22DormantRich]] scalar pattern).
    */
  def qEventCooccur(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ut = Tables.events(spark, sfDir)
      .select($"user_id", $"event_type").distinct()
    val nUsers = ut.select($"user_id").distinct()
      .agg(count(lit(1)).as("n_users"))
    val perType = ut.groupBy($"event_type").agg(count(lit(1)).as("type_users"))
    val pairs = ut.as("a")
      .join(ut.as("b"),
        $"a.user_id" === $"b.user_id" && $"a.event_type" < $"b.event_type")
      .groupBy($"a.event_type".as("type_a"), $"b.event_type".as("type_b"))
      .agg(count(lit(1)).as("pair_users"))
    pairs
      .join(broadcast(perType.select($"event_type".as("type_a"), $"type_users".as("n_a"))), "type_a")
      .join(broadcast(perType.select($"event_type".as("type_b"), $"type_users".as("n_b"))), "type_b")
      .crossJoin(broadcast(nUsers))
      .select($"type_a", $"type_b", $"n_a", $"n_b", $"pair_users",
        (($"pair_users" * $"n_users").cast("double") / ($"n_a" * $"n_b")).as("lift"))
      .orderBy($"type_a", $"type_b")
  }

  val qEventCooccurSql: String =
    """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
      |n AS (SELECT count(DISTINCT user_id) AS n_users FROM ut),
      |pt AS (SELECT event_type, count(*) AS type_users FROM ut GROUP BY event_type),
      |pairs AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS pair_users
      |  FROM ut a JOIN ut b
      |    ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2
      |)
      |SELECT type_a, type_b, pa.type_users AS n_a, pb.type_users AS n_b, pair_users,
      |  CAST(pair_users * n_users AS DOUBLE) / (pa.type_users * pb.type_users) AS lift
      |FROM pairs
      |JOIN pt pa ON pa.event_type = type_a
      |JOIN pt pb ON pb.event_type = type_b
      |CROSS JOIN n
      |ORDER BY type_a, type_b""".stripMargin

  /** name → (query fn, oracle SQL) for SparkEntry wiring. Ordered: the
    * driver's Bench runs entries in this sequence and the FIRST one absorbs
    * JVM/Spark warmup (~3-8 s), so a cheap query leads and headline entries
    * stay comparable across rounds.
    */
  // ------------------------------------------------------------------
  // Saturating running balance in closed form (E149)
  // ------------------------------------------------------------------

  /** Per-user prepaid-wallet ledger with a ZERO FLOOR: purchases top the
    * wallet up by their value in cents, every other interaction bills a
    * flat 25¢ fee, and the balance saturates at zero (a fee against an
    * empty wallet is forfeited, not owed). The recurrence is
    *
    *   b_k = max(0, b_{k-1} + x_k)
    *
    * — order-dependent state that LOOKS like it needs a sequential fold
    * (the [[qEventEwma]] treatment). It doesn't: clamp-at-zero has the
    * closed form  b_k = s_k − min(0, min_{j≤k} s_j)  over the plain
    * running sum s, because the clamp only ever adds back exactly the
    * depth the unclamped sum sank below zero. So the whole ledger is two
    * stacked windows — running sum, then running min of it — sharing ONE
    * user-keyed exchange and ONE (ts, event_id) sort, fully parallel
    * across users. Per user it reports the final balance, the peak, and
    * the total forfeited (= −min(0, s_min), the clamp's lifetime bite).
    *
    * All integer cents (purchase credit = floor(value·100), an IEEE
    * multiply+floor identical in both engines), so every balance is
    * hash-exact at any parallelism.
    *
    * Scale (100 TB): one shuffle keyed on user_id, windows stream
    * per-user in sort order with O(1) state, final agg rides the same
    * exchange. No collect, no fold, no state store.
    */
  def qUserBalance(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val deltas = Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id",
        when($"event_type" === "purchase",
          floor($"value" * 100).cast("long")).otherwise(lit(-25L)).as("delta_c"))
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withS = deltas.select($"user_id", $"ts", $"event_id", $"delta_c",
      sum($"delta_c").over(w).as("s"))
    withS
      .select($"user_id", $"delta_c", $"s",
        ($"s" - least(lit(0L), min($"s").over(w))).as("b"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        (sum($"delta_c") - least(lit(0L), min($"s"))).as("final_balance_c"),
        max($"b").as("peak_balance_c"),
        (-least(lit(0L), min($"s"))).as("forfeited_c"))
      .orderBy($"user_id")
  }

  /** Oracle: the identical two stacked windows + closed-form clamp. */
  val qUserBalanceSql: String =
    """WITH d AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN event_type = 'purchase'
      |      THEN CAST(floor(value * 100) AS BIGINT)
      |      ELSE CAST(-25 AS BIGINT) END AS delta_c
      |  FROM events
      |),
      |r AS (
      |  SELECT user_id, ts, event_id, delta_c,
      |    sum(delta_c) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
      |  FROM d
      |),
      |b AS (
      |  SELECT user_id, delta_c, s,
      |    s - least(0, min(s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS b
      |  FROM r
      |)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(delta_c) - least(0, min(s)) AS BIGINT) AS final_balance_c,
      |  CAST(max(b) AS BIGINT) AS peak_balance_c,
      |  CAST(-least(0, min(s)) AS BIGINT) AS forfeited_c
      |FROM b GROUP BY user_id ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------------
  // CUSUM change-point detection (E150)
  // ------------------------------------------------------------------

  /** Single change-point locator over each type's daily-revenue series:
    * the day k* maximizing the CUSUM deviation |S_k − (k/n)·T| — the
    * largest gap between observed cumulative mass and the uniform-rate
    * line (Page's statistic with known totals; the offline "where did
    * the level shift" question behind regression detection in metrics
    * pipelines). Kept EXACT by scaling out the division: D_k =
    * n·S_k − k·T in BIGINT cents (|D| < n·T ≈ 2⁶⁰ headroom at sf1000),
    * so the argmax and the tie-break (earliest day on equal |D|) are
    * integer-deterministic; the one normalized double, |D*|/(n·T) ∈
    * [0,1), is a single fixed-shape division at the very end.
    *
    * The argmax rides the composite-key pattern ([[qEventAttribMultiTouch]]):
    * Spark `max_by` on the struct (|D|, −k); DuckDB `arg_max` needs a
    * SCALAR key, so the same order is encoded as the HUGEINT
    * |D|·2²⁰ + (2²⁰−1−k) (k < 2²⁰ always — it counts distinct days).
    *
    * Scale (100 TB): the corpus collapses to the |types|×|days| daily
    * series in ONE partial-agg shuffle ([[qEventTrend]]'s profile); the
    * running sum, row_number and whole-partition totals share one
    * type-keyed exchange over ≤ thousands of rows.
    */
  def qEventChangepoint(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .groupBy($"event_type",
        datediff(to_date($"ts"), lit("1970-01-01")).cast("long").as("dn"))
      .agg(sum($"value".cast(DecimalType(18, 4))).as("v"))
      .select($"event_type", $"dn", floor($"v" * 100).cast("long").as("y"))
    val wOrd = Window.partitionBy($"event_type").orderBy($"dn")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy($"event_type")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    daily.select($"event_type", $"dn",
        sum($"y").over(wRun).as("sk"),
        row_number().over(wOrd).cast("long").as("k"),
        sum($"y").over(wAll).as("tot"),
        count(lit(1)).over(wAll).as("n"))
      .select($"event_type", $"dn", $"k", $"tot", $"n",
        abs($"n" * $"sk" - $"k" * $"tot").as("absd"))
      .groupBy($"event_type")
      .agg(max($"n").as("n_days"), max($"tot").as("total_c"),
        expr("max_by(dn, struct(absd, -k))").as("cp_dn"),
        max($"absd").as("d_stat"))
      .select($"event_type", $"n_days", $"total_c",
        expr("date_add(DATE '1970-01-01', CAST(cp_dn AS INT))").as("change_day"),
        $"d_stat",
        ($"d_stat".cast("double") /
          ($"n_days".cast("double") * $"total_c".cast("double"))).as("cusum_ratio"))
      .orderBy($"event_type")
  }

  /** Oracle: identical scaled-integer CUSUM; arg_max on the HUGEINT
    * composite so the earliest-day tie-break matches the struct order.
    */
  val qEventChangepointSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dn,
      |    CAST(floor(sum(CAST(value AS DECIMAL(18,4))) * 100) AS BIGINT) AS y
      |  FROM events GROUP BY event_type, dn
      |),
      |r AS (
      |  SELECT event_type, dn,
      |    CAST(sum(y) OVER (PARTITION BY event_type ORDER BY dn
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sk,
      |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY dn) AS BIGINT) AS k,
      |    CAST(sum(y) OVER (PARTITION BY event_type) AS BIGINT) AS tot,
      |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      |  FROM daily
      |),
      |s AS (
      |  SELECT event_type, dn, k, tot, n, abs(n * sk - k * tot) AS absd
      |  FROM r
      |)
      |SELECT event_type, max(n) AS n_days, max(tot) AS total_c,
      |  DATE '1970-01-01' + CAST(arg_max(dn,
      |    CAST(absd AS HUGEINT) * 1048576 + (1048575 - k)) AS INTEGER) AS change_day,
      |  CAST(max(absd) AS BIGINT) AS d_stat,
      |  CAST(max(absd) AS DOUBLE) /
      |    (CAST(max(n) AS DOUBLE) * CAST(max(tot) AS DOUBLE)) AS cusum_ratio
      |FROM s GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------------
  // Consecutive-day activity streaks, gaps-and-islands (E151)
  // ------------------------------------------------------------------

  /** Per-user CONSECUTIVE-DAY activity streaks — the gaps-and-islands
    * idiom on calendar integers: dedup to (user, epoch-day), then
    * `dn − row_number()` is CONSTANT exactly within a run of consecutive
    * days (both advance by 1), so grouping on that difference labels each
    * island with no self-join and no iteration. Reports per user the
    * active-day count, number of streaks, the longest streak and the day
    * it started (earliest start on ties — argmax over the composite
    * (len, −start), [[qEventChangepoint]]'s pattern, here small enough
    * for a plain BIGINT key since both parts are < 2²⁰).
    *
    * Scale (100 TB): the user-day dedup is the only corpus-sized shuffle
    * (map-side combinable); the window + island agg ride one user-keyed
    * exchange over ≤ |users|×|days| rows. Everything integer epoch-day
    * arithmetic — no engine week/locale rules, hash-exact.
    */
  def qUserStreaks(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val days = Tables.events(spark, sfDir)
      .select($"user_id",
        datediff(to_date($"ts"), lit("1970-01-01")).cast("long").as("dn"))
      .distinct()
    val w = Window.partitionBy($"user_id").orderBy($"dn")
    val islands = days
      .select($"user_id", $"dn", ($"dn" - row_number().over(w)).as("grp"))
      .groupBy($"user_id", $"grp")
      .agg(count(lit(1)).as("len"), min($"dn").as("start_dn"))
    islands.groupBy($"user_id")
      .agg(sum($"len").as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max($"len").as("longest_streak"),
        // longest streak, ties to the EARLIEST start: struct key — valid
        // for any epoch day incl. pre-1970 (the oracle's packed
        // len·2²⁰+(2²⁰−1−start_dn) form needs 0 ≤ start_dn < 2²⁰, an
        // oracle-fidelity bound only; r12 #6)
        expr("max_by(start_dn, struct(len, -start_dn))")
          .as("longest_start_dn"))
      .select($"user_id", $"n_active_days", $"n_streaks", $"longest_streak",
        expr("date_add(DATE '1970-01-01', CAST(longest_start_dn AS INT))")
          .as("longest_start"))
      .orderBy($"user_id")
  }

  /** Oracle: identical islands via dn − row_number(); arg_max on the
    * same composite key.
    */
  val qUserStreaksSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id,
      |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dn
      |  FROM events
      |),
      |lab AS (
      |  SELECT user_id, dn,
      |    dn - row_number() OVER (PARTITION BY user_id ORDER BY dn) AS grp
      |  FROM days
      |),
      |isl AS (
      |  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len,
      |    min(dn) AS start_dn
      |  FROM lab GROUP BY user_id, grp
      |)
      |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
      |  CAST(count(*) AS BIGINT) AS n_streaks,
      |  CAST(max(len) AS BIGINT) AS longest_streak,
      |  DATE '1970-01-01' + CAST(arg_max(start_dn,
      |    len * 1048576 + (1048575 - start_dn)) AS INTEGER) AS longest_start
      |FROM isl GROUP BY user_id ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------------
  // Cooldown debounce / rate-limit dedup (E152)
  // ------------------------------------------------------------------

  /** Cooldown interval for [[qEventDebounce]], seconds. */
  val debounceGapSec: Long = 3600L

  /** State-encoding base for the debounce fold: state = last_kept_sec ·
    * 2²⁰ + kept_count. Epoch-seconds (< 2³¹) times 2²⁰ stays well inside
    * int64; kept counts per (user, type) are human-bounded ≪ 2²⁰.
    */
  val debounceEnc: Long = 1048576L

  /** Notification-throttle dedup: keep an event only if at least
    * [[debounceGapSec]] has elapsed since the last KEPT event of the same
    * (user, type) — the "at most one push per hour" rule. This is NOT a
    * window query: whether an event is kept depends on which earlier
    * events were KEPT, an irreducibly sequential recurrence (a
    * fixed-window `lag` against the previous RAW event misclassifies
    * bursts longer than the window). So it gets the [[qEventEwma]]
    * treatment — a per-key sequential fold over the (ts, id)-ordered
    * list, with the (last_kept, count) state packed into ONE BIGINT
    * ([[debounceEnc]]) because DuckDB's `list_reduce` accumulator must
    * have the element type: both engines then run the identical integer
    * fold, hash-exact. Timestamps enter at SECOND granularity (µs·2²⁰
    * would overflow int64); same-second repeats fall inside any positive
    * cooldown by construction.
    *
    * Scale (100 TB): one shuffle on (user, type); per-group state is one
    * BIGINT and the list is a human session history (the collect_list
    * boundedness argument of the EWMA op). The debounce itself never
    * re-scans — O(events per key) exactly once.
    */
  def qEventDebounce(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val m = debounceEnc
    val enc = Tables.events(spark, sfDir)
      .select($"user_id", $"event_type", $"ts", $"event_id",
        (expr("unix_micros(ts) div 1000000") * m).as("x"))
    enc.groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("n_total"),
        array_sort(collect_list(struct($"ts", $"event_id", $"x"))).as("seq"))
      .select($"user_id", $"event_type", $"n_total",
        expr(s"""aggregate(slice(seq, 2, size(seq) - 1), seq[0].x,
                 (acc, s) -> IF(s.x div ${m}L - acc div ${m}L >= $debounceGapSec,
                              s.x + acc % ${m}L + 1L, acc))""").as("st"))
      .select($"user_id", $"event_type", $"n_total",
        (expr(s"st % ${m}L") + 1L).as("n_kept"),
        expr(s"st div ${m}L").as("last_kept_sec"))
      .orderBy($"user_id", $"event_type")
  }

  /** Oracle: the identical packed-integer fold — `list_reduce` seeds the
    * accumulator with the first element (kept count 0), exactly like the
    * Spark side's seq[0] seed, so both add the +1 at the end.
    */
  val qEventDebounceSql: String =
    s"""SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_total,
       |  CAST(list_reduce(
       |      list(CAST(floor(epoch(ts)) AS BIGINT) * $debounceEnc
       |           ORDER BY ts, event_id),
       |      (acc, x) -> CASE WHEN x // $debounceEnc - acc // $debounceEnc
       |                          >= $debounceGapSec
       |                       THEN x + acc % $debounceEnc + 1
       |                       ELSE acc END) % $debounceEnc + 1 AS BIGINT)
       |    AS n_kept,
       |  CAST(list_reduce(
       |      list(CAST(floor(epoch(ts)) AS BIGINT) * $debounceEnc
       |           ORDER BY ts, event_id),
       |      (acc, x) -> CASE WHEN x // $debounceEnc - acc // $debounceEnc
       |                          >= $debounceGapSec
       |                       THEN x + acc % $debounceEnc + 1
       |                       ELSE acc END) // $debounceEnc AS BIGINT)
       |    AS last_kept_sec
       |FROM events
       |GROUP BY user_id, event_type
       |ORDER BY user_id, event_type""".stripMargin

  // ------------------------------------------------------------------
  // Item-item cosine similarity over co-engagement vectors (E155)
  // ------------------------------------------------------------------

  /** Item-item collaborative-filtering similarity at the event-type
    * level: each type is a |users|-dimensional count vector (how often
    * each user did it), and the output is the cosine between every type
    * pair — the "users who do A also do B" signal behind co-engagement
    * recommenders, here exact rather than sketched.
    *
    * Everything until the final cosine is INTEGER: dot products are
    * Σ_user n_a·n_b via a user-keyed self-join of the (user, type, n)
    * profile (fan-out bounded by |types|² per user), norms are Σ n² per
    * type. The one double expression is fixed-shape
    * dot / sqrt(double(nrm_a)·double(nrm_b)) — int64→double is
    * single-rounding IEEE at any magnitude (the E141 rule) and sqrt is
    * correctly rounded, so the hash matches cross-engine; sqrt(a·b) as
    * an INTEGER product is avoided because Σn² pairs can pass 2⁵³ at
    * large scale while each factor converts exactly.
    *
    * Scale (100 TB): the profile collapse is the only corpus-sized
    * shuffle; the self-join runs on |users|·|types| rows with |types|²
    * fan-out, and the norms table (|types| rows) broadcasts onto the
    * |types|² pair table.
    */
  def qTypeCosine(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val prof = Tables.events(spark, sfDir)
      .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("n"))
    val dots = prof.as("a")
      .join(prof.as("b"),
        $"a.user_id" === $"b.user_id" && $"a.event_type" < $"b.event_type")
      .groupBy($"a.event_type".as("type_a"), $"b.event_type".as("type_b"))
      .agg(sum($"a.n" * $"b.n").as("dot"), count(lit(1)).as("n_users_both"))
    val norms = prof.groupBy($"event_type").agg(sum($"n" * $"n").as("nrm2"))
    dots
      .join(broadcast(norms.select($"event_type".as("type_a"), $"nrm2".as("na2"))),
        "type_a")
      .join(broadcast(norms.select($"event_type".as("type_b"), $"nrm2".as("nb2"))),
        "type_b")
      .select($"type_a", $"type_b", $"dot", $"n_users_both",
        ($"dot".cast("double") /
          sqrt($"na2".cast("double") * $"nb2".cast("double"))).as("cosine"))
      .orderBy($"type_a", $"type_b")
  }

  /** Oracle: identical integer moments and the identical one-division,
    * one-sqrt closing shape.
    */
  val qTypeCosineSql: String =
    """WITH prof AS (
      |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY user_id, event_type
      |),
      |dots AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    CAST(sum(a.n * b.n) AS BIGINT) AS dot,
      |    CAST(count(*) AS BIGINT) AS n_users_both
      |  FROM prof a JOIN prof b
      |    ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY type_a, type_b
      |),
      |norms AS (
      |  SELECT event_type, CAST(sum(n * n) AS BIGINT) AS nrm2
      |  FROM prof GROUP BY event_type
      |)
      |SELECT d.type_a, d.type_b, d.dot, d.n_users_both,
      |  CAST(d.dot AS DOUBLE) /
      |    sqrt(CAST(na.nrm2 AS DOUBLE) * CAST(nb.nrm2 AS DOUBLE)) AS cosine
      |FROM dots d
      |JOIN norms na ON na.event_type = d.type_a
      |JOIN norms nb ON nb.event_type = d.type_b
      |ORDER BY d.type_a, d.type_b""".stripMargin

  // ------------------------------------------------------------------
  // Theil–Sen robust slope (E156)
  // ------------------------------------------------------------------

  /** Theil–Sen estimator over each type's daily-revenue series: the
    * MEDIAN of all pairwise slopes (y_j−y_i)/(x_j−x_i), the robust
    * complement to [[qEventTrend]]'s OLS — a handful of outlier days
    * move OLS arbitrarily but shift a slope median by at most one rank.
    *
    * Pairwise slopes are IEEE divisions of exact integers (cent deltas
    * over day deltas — both engines divide the same int64s, one
    * rounding), and the median is selected by ROW RANK over the total
    * order (slope, x_i, x_j) — identical doubles order identically, and
    * the integer tie-break pins rank even among equal slopes, so the
    * lower median (rank ⌈m/2⌉) is deterministic cross-engine. No
    * averaging of the two middle elements: that would add a second
    * double op for even m without changing the estimator's breakdown
    * point.
    *
    * Scale (100 TB): the corpus collapses to the |types|×|days| series
    * first (E141's profile); the O(days²) pair build runs per type on
    * that METADATA-sized table — ~250k pairs per 700-day type, a plan
    * constant independent of corpus size. The per-type sort for rank
    * selection is the only super-linear step, again on pairs of days.
    */
  def qEventTheilSen(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .groupBy($"event_type",
        datediff(to_date($"ts"), lit("1970-01-01")).cast("long").as("dn"))
      .agg(sum($"value".cast(DecimalType(18, 4))).as("v"))
      .select($"event_type", $"dn", floor($"v" * 100).cast("long").as("y"))
    val pairs = daily.as("a")
      .join(daily.as("b"),
        $"a.event_type" === $"b.event_type" && $"a.dn" < $"b.dn")
      .select($"a.event_type".as("event_type"), $"a.dn".as("x1"), $"b.dn".as("x2"),
        (($"b.y" - $"a.y").cast("double") / ($"b.dn" - $"a.dn").cast("double"))
          .as("slope"))
    val wOrd = Window.partitionBy($"event_type")
      .orderBy($"slope", $"x1", $"x2")
    val wAll = Window.partitionBy($"event_type")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    pairs.select($"event_type", $"slope",
        row_number().over(wOrd).cast("long").as("rk"),
        count(lit(1)).over(wAll).as("m"))
      .filter($"rk" === expr("(m + 1) div 2"))
      .select($"event_type", $"m".as("n_pairs"),
        $"slope".as("theil_sen_slope_cents"))
      .orderBy($"event_type")
  }

  /** Oracle: identical pair build, identical (slope, x1, x2) rank
    * selection of the lower median.
    */
  val qEventTheilSenSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dn,
      |    CAST(floor(sum(CAST(value AS DECIMAL(18,4))) * 100) AS BIGINT) AS y
      |  FROM events GROUP BY event_type, dn
      |),
      |pairs AS (
      |  SELECT a.event_type, a.dn AS x1, b.dn AS x2,
      |    CAST(b.y - a.y AS DOUBLE) / CAST(b.dn - a.dn AS DOUBLE) AS slope
      |  FROM daily a JOIN daily b
      |    ON a.event_type = b.event_type AND a.dn < b.dn
      |),
      |r AS (
      |  SELECT event_type, slope,
      |    CAST(row_number() OVER (PARTITION BY event_type
      |      ORDER BY slope, x1, x2) AS BIGINT) AS rk,
      |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS m
      |  FROM pairs
      |)
      |SELECT event_type, m AS n_pairs, slope AS theil_sen_slope_cents
      |FROM r WHERE rk = (m + 1) // 2
      |ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------------
  // Open-order backlog: the work-in-progress time series
  // ------------------------------------------------------------------

  /** OPEN-ORDER BACKLOG time series — work-in-progress by day: +1 when
    * an order is placed, −1 on the day its LAST line ships, running
    * sum = orders open that day. The operations counterpart of
    * [[qOrderLeadTime]]: lead time says how long one order takes,
    * backlog says how much is in flight at once — the number capacity
    * planning and SLA staffing actually consume, and the exact
    * interval-stabbing shape of [[qEventPeakConcurrency]] applied to
    * the order lifecycle (never a per-day × per-order range join).
    *
    * Exactness: day stamps are exact epoch-day integers (DATE
    * subtraction — no timezone arithmetic); deltas, daily nets and the
    * running backlog are pure BIGINT sums.
    *
    * Scale (100 TB): completion is ONE orderkey-keyed max over
    * lineitem (map-side combined — the only corpus-sized shuffle); the
    * delta union aggregates to DAY grain immediately, so the running-
    * sum window spans |days| rows — the TIME SPAN, corpus-size-
    * independent by construction.
    */
  def qOrderBacklog(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val epoch = lit("1970-01-01").cast("date")
    val placed = Tables.orders(spark, sfDir)
      .select(datediff(to_date($"o_orderdate".cast("timestamp")), epoch)
        .cast("long").as("day"))
      .select($"day", lit(1L).as("placed"), lit(0L).as("completed"))
    val completed = Tables.lineitem(spark, sfDir)
      .groupBy($"l_orderkey")
      .agg(max(to_date($"l_shipdate".cast("timestamp"))).as("last_ship"))
      .select(datediff($"last_ship", epoch).cast("long").as("day"))
      .select($"day", lit(0L).as("placed"), lit(1L).as("completed"))
    val daily = placed.unionAll(completed)
      .groupBy($"day")
      .agg(sum($"placed").as("n_placed"), sum($"completed").as("n_completed"))
    val w = Window.orderBy($"day").rowsBetween(Window.unboundedPreceding, 0)
    daily
      .select($"day", $"n_placed", $"n_completed",
        sum($"n_placed" - $"n_completed").over(w).as("backlog"))
      .orderBy($"day")
  }

  val qOrderBacklogSql: String =
    """WITH placed AS (
      |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
      |    1 AS placed, 0 AS completed
      |  FROM orders
      |),
      |completed AS (
      |  SELECT CAST(max(CAST(l_shipdate AS DATE)) - DATE '1970-01-01' AS BIGINT) AS day,
      |    0 AS placed, 1 AS completed
      |  FROM lineitem GROUP BY l_orderkey
      |),
      |daily AS (
      |  SELECT day, CAST(sum(placed) AS BIGINT) AS n_placed,
      |    CAST(sum(completed) AS BIGINT) AS n_completed
      |  FROM (SELECT * FROM placed UNION ALL SELECT * FROM completed)
      |  GROUP BY day
      |)
      |SELECT day, n_placed, n_completed,
      |  CAST(sum(n_placed - n_completed) OVER (ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS backlog
      |FROM daily
      |ORDER BY day""".stripMargin

  // ------------------------------------------------------------------
  // Open-order aging: how stale is the work still in the queue?
  // ------------------------------------------------------------------

  /** OPEN-ORDER AGING — per priority class, the orders still
    * unshipped at the horizon end with their age profile (count, mean
    * age, max age, and the share older than one year). The STOCK view
    * the flow family implies but never shows: [[qOrderBacklog]] counts
    * WIP over time, [[qLittlesByClass]] averages it — this looks at
    * the queue AS OF the horizon and asks how long its occupants have
    * been waiting, which is the aging report an expedite review
    * actually works from (the same rows are the censored mass behind
    * the flow audits' rel_gap).
    *
    * Exactness: ages are exact BIGINT days against the global max day;
    * the mean and share are single divisions.
    *
    * Scale (100 TB): the lead-time shape (orderkey max + left
    * anti-style join) with a 5-group rollup; open orders are a small
    * fraction of the corpus by construction.
    */
  def qOrderOpenAging(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val epoch = lit("1970-01-01").cast("date")
    val placed = Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_orderpriority".as("prio"),
        datediff(to_date($"o_orderdate".cast("timestamp")), epoch)
          .cast("long").as("placed_day"))
    val done = Tables.lineitem(spark, sfDir)
      .groupBy($"l_orderkey")
      .agg(max(to_date($"l_shipdate".cast("timestamp"))).as("last_ship"))
      .select($"l_orderkey", datediff($"last_ship", epoch).cast("long").as("done_day"))
    val horizon = placed.select($"placed_day".as("day"))
      .unionAll(done.select($"done_day".as("day")))
      .agg(max($"day").as("d_max"))
    val open = placed.join(done, $"o_orderkey" === $"l_orderkey", "left_anti")
    open.crossJoin(broadcast(horizon))
      .select($"prio", ($"d_max" - $"placed_day").as("age_days"))
      .groupBy($"prio")
      .agg(count(lit(1)).as("n_open"),
        sum($"age_days").as("age_sum"),
        max($"age_days").as("max_age_days"),
        sum(when($"age_days" > 365, 1L).otherwise(0L)).as("n_over_year"))
      .select($"prio", $"n_open",
        ($"age_sum".cast("double") / $"n_open").as("mean_age_days"),
        $"max_age_days",
        ($"n_over_year".cast("double") / $"n_open").as("share_over_year"))
      .orderBy($"prio")
  }

  val qOrderOpenAgingSql: String =
    """WITH placed AS (
      |  SELECT o_orderkey, o_orderpriority AS prio,
      |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS placed_day
      |  FROM orders
      |),
      |done AS (
      |  SELECT l_orderkey,
      |    CAST(max(CAST(l_shipdate AS DATE)) - DATE '1970-01-01' AS BIGINT) AS done_day
      |  FROM lineitem GROUP BY l_orderkey
      |),
      |horizon AS (
      |  SELECT CAST(max(day) AS BIGINT) AS d_max FROM (
      |    SELECT placed_day AS day FROM placed
      |    UNION ALL SELECT done_day AS day FROM done)
      |),
      |open_orders AS (
      |  SELECT prio, placed_day FROM placed
      |  WHERE o_orderkey NOT IN (SELECT l_orderkey FROM done)
      |),
      |aged AS (
      |  SELECT prio, d_max - placed_day AS age_days
      |  FROM open_orders CROSS JOIN horizon
      |)
      |SELECT prio, CAST(count(*) AS BIGINT) AS n_open,
      |  CAST(CAST(sum(age_days) AS BIGINT) AS DOUBLE) / count(*) AS mean_age_days,
      |  CAST(max(age_days) AS BIGINT) AS max_age_days,
      |  CAST(CAST(sum(CASE WHEN age_days > 365 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS DOUBLE) / count(*) AS share_over_year
      |FROM aged
      |GROUP BY prio
      |ORDER BY prio""".stripMargin

  // ------------------------------------------------------------------
  // SLA attainment curve: share shipped within d days, per priority
  // ------------------------------------------------------------------

  /** SLA thresholds (days) for the attainment curve — spanning the
    * observed lead-time distribution (mean ≈ 700 days in this synthetic
    * corpus). `final` per the init-cycle rule.
    */
  final val slaDays: Seq[Int] = Seq(90, 180, 365, 730, 1095)

  /** SLA ATTAINMENT CURVE — per order priority, the share of completed
    * orders fully shipped within each SLA threshold: the lead-time CDF
    * evaluated exactly where contracts are written. The distributional
    * view the scalar flow numbers collapse: [[qOrderLeadTime]] gives
    * the mean, [[qLittlesByClass]] the WIP it implies — this says what
    * fraction of customers actually got their order inside d days, per
    * class, which is the number an SLA penalty clause binds to. A flat
    * curve across priorities (as measured here) is itself the finding:
    * the priority field isn't driving fulfilment.
    *
    * Exactness: lead times are exact BIGINT days; attainment is a
    * conditional count over a broadcast threshold grid, one division
    * per cell.
    *
    * Scale (100 TB): ONE orderkey-keyed max over lineitem + one
    * orderkey equi-join (the lead-time shape), then a
    * (priority × thresholds) conditional aggregate — the curve grid is
    * a 5×5 broadcast cross, never a per-order fan-out through a
    * shuffle.
    */
  def qOrderSlaCurve(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val epoch = lit("1970-01-01").cast("date")
    val leads = Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_orderpriority".as("prio"),
        datediff(to_date($"o_orderdate".cast("timestamp")), epoch)
          .cast("long").as("placed_day"))
      .join(Tables.lineitem(spark, sfDir)
        .groupBy($"l_orderkey")
        .agg(max(to_date($"l_shipdate".cast("timestamp"))).as("last_ship"))
        .select($"l_orderkey",
          datediff($"last_ship", epoch).cast("long").as("done_day")),
        $"o_orderkey" === $"l_orderkey")
      .select($"prio", ($"done_day" - $"placed_day").as("lead_days"))
    val grid = slaDays.map(_.toLong).toDF("sla_days")
    leads.crossJoin(broadcast(grid))
      .groupBy($"prio", $"sla_days")
      .agg(count(lit(1)).as("n_completed"),
        sum(when($"lead_days" <= $"sla_days", 1L).otherwise(0L)).as("n_within"))
      .select($"prio", $"sla_days", $"n_completed", $"n_within",
        ($"n_within".cast("double") / $"n_completed").as("attainment"))
      .orderBy($"prio", $"sla_days")
  }

  val qOrderSlaCurveSql: String =
    s"""WITH leads AS (
       |  SELECT o_orderpriority AS prio,
       |    CAST(max(CAST(l_shipdate AS DATE)) - CAST(o_orderdate AS DATE) AS BIGINT)
       |      AS lead_days
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |  GROUP BY o_orderkey, o_orderpriority, o_orderdate
       |),
       |grid AS (SELECT CAST(unnest([${slaDays.mkString(", ")}]) AS BIGINT) AS sla_days)
       |SELECT prio, sla_days, CAST(count(*) AS BIGINT) AS n_completed,
       |  CAST(sum(CASE WHEN lead_days <= sla_days THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_within,
       |  CAST(CAST(sum(CASE WHEN lead_days <= sla_days THEN 1 ELSE 0 END) AS BIGINT)
       |    AS DOUBLE) / CAST(count(*) AS BIGINT) AS attainment
       |FROM leads CROSS JOIN grid
       |GROUP BY prio, sla_days
       |ORDER BY prio, sla_days""".stripMargin

  // ------------------------------------------------------------------
  // Mean-excess curve: what does the tail look like past a threshold?
  // ------------------------------------------------------------------

  /** Mean-excess thresholds in cents ($150/$250/$350/$450 against a
    * value range of 0–560 with mean ≈ 50). `final` per the init-cycle
    * rule.
    */
  final val mexThresholds: Seq[Long] = Seq(15000L, 25000L, 35000L, 45000L)

  /** MEAN-EXCESS CURVE — for each threshold u, the count of event
    * values exceeding u and the mean excess E[X−u | X>u], the classic
    * extreme-value-theory diagnostic: a mean-excess curve RISING in u
    * is a heavy (Pareto-class) tail, flat is exponential, falling is a
    * bounded tail. The distribution-free companion to the Hill
    * estimator ([[graft.ext.CorpusOps]]' tail exponent): Hill assumes
    * the Pareto form and fits its index — this SHOWS whether that
    * assumption holds, which is the first question any capacity or
    * risk model built on these values must answer.
    *
    * Exactness: cent-quantized BIGINT sums per threshold; the mean
    * excess is one division of exact integers.
    *
    * Scale (100 TB): one pass over events against a 4-row broadcast
    * grid, map-side combined to 4 rows.
    */
  def qValueMeanExcess(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val vals = Tables.events(spark, sfDir)
      .select(floor($"value" * 100 + 0.5).cast("long").as("c"))
    val grid = mexThresholds.toDF("u_cents")
    val tot = vals.agg(count(lit(1)).as("n_total"))
    vals.crossJoin(broadcast(grid))
      .groupBy($"u_cents")
      .agg(sum(when($"c" > $"u_cents", 1L).otherwise(0L)).as("n_exceed"),
        sum(when($"c" > $"u_cents", $"c" - $"u_cents").otherwise(0L))
          .as("excess_sum_c"))
      .crossJoin(broadcast(tot))
      .select($"u_cents", $"n_exceed", $"excess_sum_c",
        ($"n_exceed".cast("double") / $"n_total").as("exceed_rate"),
        // an empty tail (possible at tiny SFs) reports 0.0, identically
        // in the oracle, instead of dividing by zero under ANSI mode
        when($"n_exceed" > 0,
          $"excess_sum_c".cast("double") / ($"n_exceed" * lit(100L)).cast("double"))
          .otherwise(lit(0.0)).as("mean_excess"))
      .orderBy($"u_cents")
  }

  val qValueMeanExcessSql: String =
    s"""WITH vals AS (
       |  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events
       |),
       |grid AS (SELECT CAST(unnest([${mexThresholds.mkString(", ")}]) AS BIGINT) AS u_cents),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM vals)
       |SELECT u_cents,
       |  CAST(sum(CASE WHEN c > u_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_exceed,
       |  CAST(sum(CASE WHEN c > u_cents THEN c - u_cents ELSE 0 END) AS BIGINT)
       |    AS excess_sum_c,
       |  CAST(CAST(sum(CASE WHEN c > u_cents THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
       |    / n_total AS exceed_rate,
       |  CASE WHEN CAST(sum(CASE WHEN c > u_cents THEN 1 ELSE 0 END) AS BIGINT) > 0
       |    THEN CAST(CAST(sum(CASE WHEN c > u_cents THEN c - u_cents ELSE 0 END) AS BIGINT)
       |      AS DOUBLE) /
       |      CAST(CAST(sum(CASE WHEN c > u_cents THEN 1 ELSE 0 END) AS BIGINT) * 100
       |        AS BIGINT)
       |    ELSE CAST(0.0 AS DOUBLE) END AS mean_excess
       |FROM vals CROSS JOIN grid CROSS JOIN tot
       |GROUP BY u_cents, n_total
       |ORDER BY u_cents""".stripMargin

  // ------------------------------------------------------------------
  // FSM audit: which observed transitions violate the lifecycle model?
  // ------------------------------------------------------------------

  /** The declared lifecycle FSM: transitions an event stream is
    * SUPPOSED to contain. Anything observed outside this set is an
    * instrumentation bug, a replay artifact, or clock skew — exactly
    * the classes of corruption an event-log quality gate screens for.
    * signup is a source state (nothing precedes it for a user),
    * purchase must come via engagement (click/view), error can follow
    * anything but only recovers to view.
    */
  final val fsmAllowed: Seq[(String, String)] = Seq(
    "signup" -> "click", "signup" -> "view",
    "click" -> "click", "click" -> "view", "click" -> "purchase",
    "click" -> "error",
    "view" -> "view", "view" -> "click", "view" -> "purchase",
    "view" -> "error",
    "purchase" -> "view", "purchase" -> "click", "purchase" -> "error",
    "error" -> "view")

  /** FSM TRANSITION AUDIT — every observed consecutive (prev → next)
    * user transition, flagged against the declared lifecycle FSM, with
    * the violation mass per transition and the running violation share.
    * The VALIDATING complement of [[qEventTransitions]] (which
    * measures the matrix) and [[qEventMarkovEval]] (which scores its
    * predictiveness): this one says which cells should not exist at
    * all — the pre-modeling gate that catches broken instrumentation
    * before it poisons every downstream sequence model.
    *
    * Exactness: pure BIGINT counts off one lag window; shares are
    * single divisions; the allowed set is a broadcast literal flagged
    * via an IN over concatenated pair keys, identical both engines.
    *
    * Scale (100 TB): one user-partitioned window over events (the
    * module's sequence-op shape — sessions sort within user
    * partitions), collapsing map-side to the ≤|types|² matrix.
    */
  def qEventFsmAudit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val paired = Tables.events(spark, sfDir)
      .select($"event_type".as("prev_type"),
        lead($"event_type", 1).over(w).as("next_type"))
      .filter($"next_type".isNotNull)
    val allowedKeys = fsmAllowed.map { case (a, b) => s"$a>$b" }
    val matrix = paired.groupBy($"prev_type", $"next_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("allowed",
        concat($"prev_type", lit(">"), $"next_type")
          .isin(allowedKeys: _*))
    val tot = matrix.agg(sum($"n").as("n_tot"),
      sum(when($"allowed", 0L).otherwise($"n")).as("n_viol"))
    matrix.crossJoin(broadcast(tot))
      .select($"prev_type", $"next_type", $"n", $"allowed",
        ($"n".cast("double") / $"n_tot").as("share"),
        ($"n_viol".cast("double") / $"n_tot").as("violation_share"))
      .orderBy($"prev_type", $"next_type")
  }

  val qEventFsmAuditSql: String = {
    val inList = fsmAllowed.map { case (a, b) => s"'$a>$b'" }.mkString(", ")
    s"""WITH paired AS (
       |  SELECT event_type AS prev_type,
       |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |      AS next_type
       |  FROM events
       |),
       |matrix AS (
       |  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n,
       |    (prev_type || '>' || next_type) IN ($inList) AS allowed
       |  FROM paired WHERE next_type IS NOT NULL
       |  GROUP BY prev_type, next_type
       |),
       |tot AS (
       |  SELECT CAST(sum(n) AS BIGINT) AS n_tot,
       |    CAST(sum(CASE WHEN allowed THEN 0 ELSE n END) AS BIGINT) AS n_viol
       |  FROM matrix
       |)
       |SELECT prev_type, next_type, n, allowed,
       |  CAST(n AS DOUBLE) / n_tot AS share,
       |  CAST(n_viol AS DOUBLE) / n_tot AS violation_share
       |FROM matrix CROSS JOIN tot
       |ORDER BY prev_type, next_type""".stripMargin
  }

  // ------------------------------------------------------------------
  // Little's law by priority class: which class carries the WIP?
  // ------------------------------------------------------------------

  /** LITTLE'S LAW BY PRIORITY CLASS — the [[qLittlesLaw]] flow audit
    * broken out per `o_orderpriority`: per class, time-averaged WIP,
    * arrival rate, mean lead time and the censoring gap, all over the
    * GLOBAL horizon so classes are directly comparable. The question
    * this answers is the one the aggregate audit can't: when total WIP
    * is high, is it the urgent queue backing up (an expedite problem)
    * or the low classes pooling (a capacity problem)? Priority
    * systems routinely hide class-level starvation under a healthy
    * aggregate — this is the per-class L = λW readout that surfaces
    * it.
    *
    * Exactness and scale: identical discipline to [[qLittlesLaw]] —
    * BIGINT day arithmetic end-to-end, one orderkey-keyed lineitem max
    * and one orderkey equi-join as the only corpus exchanges, windows
    * at (class × day) grain partitioned by class.
    */
  def qLittlesByClass(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val epoch = lit("1970-01-01").cast("date")
    val placed = Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_orderpriority".as("prio"),
        datediff(to_date($"o_orderdate".cast("timestamp")), epoch)
          .cast("long").as("placed_day"))
    val done = Tables.lineitem(spark, sfDir)
      .groupBy($"l_orderkey")
      .agg(max(to_date($"l_shipdate".cast("timestamp"))).as("last_ship"))
      .select($"l_orderkey", datediff($"last_ship", epoch).cast("long").as("done_day"))
    val withDone = placed.join(done, $"o_orderkey" === $"l_orderkey", "left")
    val deltas = withDone
      .select($"prio", $"placed_day".as("day"), lit(1L).as("d"))
      .unionAll(withDone.where($"done_day".isNotNull)
        .select($"prio", $"done_day".as("day"), lit(-1L).as("d")))
      .groupBy($"prio", $"day").agg(sum($"d").as("net"))
    val span = deltas.agg(max($"day").as("d_max"), min($"day").as("d_min"))
    val runW = Window.partitionBy($"prio").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, 0)
    val offW = Window.partitionBy($"prio").orderBy($"day")
    val series = deltas.select($"prio", $"day",
      sum($"net").over(runW).as("backlog"),
      lead($"day", 1).over(offW).as("next_day"))
    // per-class area, closing each class's still-open interval at the
    // global horizon end so the area identity holds per class
    val area = series.crossJoin(broadcast(span))
      .select($"prio",
        when($"next_day".isNotNull, $"backlog" * ($"next_day" - $"day"))
          .otherwise($"backlog" * ($"d_max" - $"day")).as("a"))
      .groupBy($"prio").agg(sum($"a").as("area"))
    val leads = withDone.groupBy($"prio")
      .agg(count(lit(1)).as("n_orders"),
        count($"done_day").as("n_completed"),
        coalesce(sum($"done_day" - $"placed_day"), lit(0L)).as("lead_sum"))
    leads.join(area, "prio").crossJoin(broadcast(span))
      .select($"prio", $"n_orders", $"n_completed",
        ($"d_max" - $"d_min").as("horizon_days"), $"area", $"lead_sum",
        ($"area".cast("double") / ($"d_max" - $"d_min")).as("wip_avg"),
        ($"lead_sum".cast("double") / $"n_completed").as("lead_avg_days"),
        ($"lead_sum".cast("double") / ($"d_max" - $"d_min")).as("wip_pred"),
        (($"area" - $"lead_sum").cast("double") / $"area".cast("double"))
          .as("rel_gap"))
      .orderBy($"prio")
  }

  val qLittlesByClassSql: String =
    """WITH placed AS (
      |  SELECT o_orderkey, o_orderpriority AS prio,
      |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS placed_day
      |  FROM orders
      |),
      |done AS (
      |  SELECT l_orderkey,
      |    CAST(max(CAST(l_shipdate AS DATE)) - DATE '1970-01-01' AS BIGINT) AS done_day
      |  FROM lineitem GROUP BY l_orderkey
      |),
      |with_done AS (
      |  SELECT prio, placed_day, done_day
      |  FROM placed LEFT JOIN done ON o_orderkey = l_orderkey
      |),
      |deltas AS (
      |  SELECT prio, day, CAST(sum(d) AS BIGINT) AS net FROM (
      |    SELECT prio, placed_day AS day, 1 AS d FROM with_done
      |    UNION ALL
      |    SELECT prio, done_day AS day, -1 AS d FROM with_done
      |    WHERE done_day IS NOT NULL)
      |  GROUP BY prio, day
      |),
      |span AS (
      |  SELECT CAST(max(day) AS BIGINT) AS d_max, CAST(min(day) AS BIGINT) AS d_min
      |  FROM deltas
      |),
      |series AS (
      |  SELECT prio, day,
      |    sum(net) OVER (PARTITION BY prio ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS backlog,
      |    lead(day) OVER (PARTITION BY prio ORDER BY day) AS next_day
      |  FROM deltas
      |),
      |areat AS (
      |  SELECT prio, CAST(sum(CASE WHEN next_day IS NOT NULL
      |      THEN backlog * (next_day - day)
      |      ELSE backlog * (d_max - day) END) AS BIGINT) AS area
      |  FROM series CROSS JOIN span
      |  GROUP BY prio
      |),
      |leads AS (
      |  SELECT prio, CAST(count(*) AS BIGINT) AS n_orders,
      |    CAST(count(done_day) AS BIGINT) AS n_completed,
      |    CAST(COALESCE(sum(done_day - placed_day), 0) AS BIGINT) AS lead_sum
      |  FROM with_done GROUP BY prio
      |)
      |SELECT prio, n_orders, n_completed,
      |  d_max - d_min AS horizon_days, area, lead_sum,
      |  CAST(area AS DOUBLE) / (d_max - d_min) AS wip_avg,
      |  CAST(lead_sum AS DOUBLE) / n_completed AS lead_avg_days,
      |  CAST(lead_sum AS DOUBLE) / (d_max - d_min) AS wip_pred,
      |  CAST(area - lead_sum AS DOUBLE) / CAST(area AS DOUBLE) AS rel_gap
      |FROM leads JOIN areat USING (prio) CROSS JOIN span
      |ORDER BY prio""".stripMargin

  // ------------------------------------------------------------------
  // Quantile bridge: WHERE in the distribution did the metric move?
  // ------------------------------------------------------------------

  /** Quantile-bridge percentile grid. `final` per the init-cycle rule
    * (referenced from the SQL string below).
    */
  final val qbPs: Seq[Int] = Seq(10, 25, 50, 75, 90)

  /** QUANTILE BRIDGE — per event type, the p10/p25/p50/p75/p90 shift
    * vector of `value` between the baseline and current halves (the
    * [[graft.etl.Quality]] drift boundary). The distribution-shape
    * complement of the PSI histogram drift: PSI says THAT mass moved
    * between bins, the bridge says WHERE in the distribution — a pure
    * median shift (all quantiles move together) reads completely
    * differently from a tail widening (p90 moves alone), and that
    * distinction decides whether an alert is "prices rose" or "a
    * whale appeared".
    *
    * Exactness: quantiles are exact percentile_disc at cent grain via
    * the cumulative-count compare (rank = ⌈p·n/100⌉ — integer
    * cross-multiplication, no interpolation, the q-digest oracle
    * pattern); shifts are BIGINT cent differences and the relative
    * shift one double division.
    *
    * Scale (100 TB): the corpus collapses to (type, period, cent)
    * grain in ONE map-side-combined aggregate; cumulative counts and
    * the 5-point grid probe run on that value-dictionary-sized table
    * (windows partitioned by type×period).
    */
  def qEventQuantileBridge(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val boundary = lit("2024-01-16").cast("timestamp")
    val g = Tables.events(spark, sfDir)
      .select($"event_type",
        when($"ts" < boundary, 0L).otherwise(1L).as("period"),
        floor($"value" * 100 + 0.5).cast("long").as("vq"))
      .groupBy($"event_type", $"period", $"vq")
      .agg(count(lit(1)).as("cnt"))
    val tot = g.groupBy($"event_type", $"period").agg(sum($"cnt").as("n"))
    val w = Window.partitionBy($"event_type", $"period").orderBy($"vq")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = g.select($"event_type", $"period", $"vq",
      sum($"cnt").over(w).as("cum"))
    val ps = qbPs.toDF("p").select($"p".cast("long").as("p"))
    val q = cum.join(tot, Seq("event_type", "period"))
      .crossJoin(broadcast(ps))
      .filter(expr("cum >= (p * n + 99) div 100"))
      .groupBy($"event_type", $"period", $"p")
      .agg(min($"vq").as("qv"))
    val base = q.filter($"period" === 0)
      .select($"event_type", $"p", $"qv".as("base_q_c"))
    val cur = q.filter($"period" === 1)
      .select($"event_type", $"p", $"qv".as("cur_q_c"))
    base.join(cur, Seq("event_type", "p"))
      .select($"event_type", $"p", $"base_q_c", $"cur_q_c",
        ($"cur_q_c" - $"base_q_c").as("shift_c"),
        (($"cur_q_c" - $"base_q_c").cast("double") / $"base_q_c")
          .as("shift_rel"))
      .orderBy($"event_type", $"p")
  }

  val qEventQuantileBridgeSql: String =
    s"""WITH g AS (
       |  SELECT event_type,
       |    CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END AS period,
       |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS vq,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM events GROUP BY 1, 2, 3
       |),
       |tot AS (
       |  SELECT event_type, period, CAST(sum(cnt) AS BIGINT) AS n
       |  FROM g GROUP BY event_type, period
       |),
       |cum AS (
       |  SELECT event_type, period, vq,
       |    CAST(sum(cnt) OVER (PARTITION BY event_type, period ORDER BY vq
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM g
       |),
       |ps AS (SELECT CAST(unnest([${qbPs.mkString(", ")}]) AS BIGINT) AS p),
       |q AS (
       |  SELECT event_type, period, p, min(vq) AS qv
       |  FROM cum JOIN tot USING (event_type, period) CROSS JOIN ps
       |  WHERE cum >= (p * n + 99) // 100
       |  GROUP BY event_type, period, p
       |)
       |SELECT event_type, p, base.qv AS base_q_c, cur.qv AS cur_q_c,
       |  cur.qv - base.qv AS shift_c,
       |  CAST(cur.qv - base.qv AS DOUBLE) / base.qv AS shift_rel
       |FROM (SELECT * FROM q WHERE period = 0) base
       |JOIN (SELECT * FROM q WHERE period = 1) cur USING (event_type, p)
       |ORDER BY event_type, p""".stripMargin

  // ------------------------------------------------------------------
  // Neyman sampling allocation: where should the sample budget go?
  // ------------------------------------------------------------------

  /** Neyman sample budget (rows to draw across strata). `final`
    * literal per the init-cycle rule.
    */
  final val neymanBudget = 10000L

  /** NEYMAN ALLOCATION — splits a fixed sampling budget across the
    * event-type strata proportional to N_h·σ_h (the variance-optimal
    * allocation for estimating the overall mean of `value`), next to
    * the proportional allocation for contrast. The design step the
    * registry's samplers skip: [[graft.ext.TextOps]]'s stratified
    * sampler takes per-stratum rates as GIVEN — this computes the
    * rates a measurement pipeline should be using, and the
    * neyman-vs-proportional gap is the read on whether stratification
    * by this key pays at all (equal σ_h ⇒ the two coincide).
    *
    * Exactness: moments are exact BIGINTs over cent-quantized values;
    * N_h·σ_h = √(nΣx²−(Σx)²) is floored to an integer weight
    * IMMEDIATELY (IEEE sqrt is correctly rounded, so both engines
    * floor the same value), making the weight total an order-free
    * BIGINT sum and the allocation an exact integer division
    * budget·w_h // W. Shares are single double divisions.
    *
    * Scale (100 TB): one |types|-group aggregate with map-side
    * partials — the corpus is touched once, narrow. The n·Σx² product
    * crosses 2^63 near 10⁹ rows/stratum at cent grain; past that
    * widen the moment product to DECIMAL(38,0) (weights stay integer).
    */
  def qEventNeyman(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val m = Tables.events(spark, sfDir)
      .select($"event_type",
        floor($"value" * 100 + 0.5).cast("long").as("c"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_h"), sum($"c").as("sx"),
        sum($"c" * $"c").as("sxx"))
      .select($"event_type", $"n_h", $"sx",
        floor(sqrt(($"n_h" * $"sxx" - $"sx" * $"sx").cast("double")))
          .cast("long").as("w_q"))
    val tot = m.agg(sum($"w_q").as("w_tot"), sum($"n_h").as("n_tot"))
    m.crossJoin(tot)
      .select($"event_type", $"n_h", $"w_q",
        ($"w_q".cast("double") / $"w_tot").as("neyman_share"),
        expr(s"(w_q * $neymanBudget) div w_tot").as("alloc_neyman"),
        expr(s"(n_h * $neymanBudget) div n_tot").as("alloc_prop"))
      .orderBy($"event_type")
  }

  val qEventNeymanSql: String =
    s"""WITH m AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_h,
       |    CAST(sum(c) AS BIGINT) AS sx, CAST(sum(c * c) AS BIGINT) AS sxx
       |  FROM (SELECT event_type,
       |          CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
       |        FROM events)
       |  GROUP BY event_type
       |),
       |w AS (
       |  SELECT event_type, n_h,
       |    CAST(floor(sqrt(CAST(n_h * sxx - sx * sx AS DOUBLE))) AS BIGINT) AS w_q
       |  FROM m
       |),
       |tot AS (
       |  SELECT CAST(sum(w_q) AS BIGINT) AS w_tot,
       |    CAST(sum(n_h) AS BIGINT) AS n_tot
       |  FROM w
       |)
       |SELECT event_type, n_h, w_q,
       |  CAST(w_q AS DOUBLE) / w_tot AS neyman_share,
       |  (w_q * $neymanBudget) // w_tot AS alloc_neyman,
       |  (n_h * $neymanBudget) // n_tot AS alloc_prop
       |FROM w CROSS JOIN tot
       |ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------------
  // Sequential precedence mining: which events happen BEFORE which?
  // ------------------------------------------------------------------

  /** PRECEDENCE-PAIR MINING — for every ordered event-type pair (a, b),
    * the number of users with SOME a strictly before SOME b, plus the
    * lift against independence. The sequential-pattern complement of
    * the adjacent-step views: [[qEventTransitions]] counts only
    * consecutive steps and [[qEventMarkovEval]] scores them — this
    * counts "a precedes b ANYWHERE in the user's history" (the
    * PrefixSpan length-2 support), which is what funnel hypothesis
    * generation actually wants ("does anyone purchase before signup?").
    * The exists-quantifier collapses per user to one min/max pair per
    * type: some a before some b ⟺ min_ts(a) < max_ts(b).
    *
    * Exactness: timestamps compare as exact epoch-micro BIGINTs; lift
    * is one double division of exact BIGINT products, identical shape
    * both engines.
    *
    * Scale (100 TB): ONE (user, type) aggregate over events (map-side
    * combined — the only corpus shuffle); the per-user type-pair join
    * fans out to ≤|types|² rows per user (25 here) and collapses
    * map-side to the |types|² output grid. Never a per-event self-join.
    */
  def qEventPrecedence(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val perUserType = Tables.events(spark, sfDir)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
      .groupBy($"user_id", $"event_type")
      .agg(min($"us").as("first_us"), max($"us").as("last_us"))
    val nUsers = Tables.events(spark, sfDir)
      .agg(countDistinct($"user_id").as("n_users"))
    val typeUsers = perUserType.groupBy($"event_type")
      .agg(count(lit(1)).as("nu"))
    val a = perUserType.select($"user_id", $"event_type".as("type_a"),
      $"first_us")
    val b = perUserType.select($"user_id".as("user_b"),
      $"event_type".as("type_b"), $"last_us")
    val support = a.join(b,
        $"user_id" === $"user_b" && $"type_a" =!= $"type_b" &&
          $"first_us" < $"last_us")
      .groupBy($"type_a", $"type_b")
      .agg(count(lit(1)).as("support"))
    support
      .join(typeUsers.select($"event_type".as("type_a"), $"nu".as("n_a")), "type_a")
      .join(typeUsers.select($"event_type".as("type_b"), $"nu".as("n_b")), "type_b")
      .crossJoin(nUsers)
      .select($"type_a", $"type_b", $"support", $"n_a", $"n_b",
        (($"support" * $"n_users").cast("double") /
          ($"n_a" * $"n_b").cast("double")).as("lift"))
      .orderBy($"type_a", $"type_b")
  }

  val qEventPrecedenceSql: String =
    """WITH put AS (
      |  SELECT user_id, event_type,
      |    CAST(min(epoch_us(ts)) AS BIGINT) AS first_us,
      |    CAST(max(epoch_us(ts)) AS BIGINT) AS last_us
      |  FROM events GROUP BY user_id, event_type
      |),
      |nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM events),
      |tu AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nu FROM put GROUP BY event_type),
      |sup AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    CAST(count(*) AS BIGINT) AS support
      |  FROM put a JOIN put b
      |    ON a.user_id = b.user_id AND a.event_type <> b.event_type
      |   AND a.first_us < b.last_us
      |  GROUP BY a.event_type, b.event_type
      |)
      |SELECT type_a, type_b, support, ta.nu AS n_a, tb.nu AS n_b,
      |  CAST(support * n_users AS DOUBLE) / CAST(ta.nu * tb.nu AS DOUBLE) AS lift
      |FROM sup
      |JOIN tu ta ON ta.event_type = type_a
      |JOIN tu tb ON tb.event_type = type_b
      |CROSS JOIN nu
      |ORDER BY type_a, type_b""".stripMargin

  // ------------------------------------------------------------------
  // Little's law audit: L = λW over the order lifecycle
  // ------------------------------------------------------------------

  /** LITTLE'S LAW flow audit — the one-row sanity check tying the three
    * flow numbers the ops queries report separately: time-averaged WIP
    * `L` (area under [[qOrderBacklog]]'s curve / horizon), arrival rate
    * `λ` (orders / horizon day), and mean lead time `W`
    * ([[qOrderLeadTime]]'s family). Little's law says L = λW for a
    * system observed start-empty to end-empty; the reported `rel_gap`
    * is EXACTLY the share of WIP-area contributed by orders that never
    * fully ship inside the horizon (area identity: Σ backlog·gap =
    * Σ_orders (min(ship_day, horizon_end) − placed_day), asserted in
    * NewOpsSpec) — a direct measure of how censored the lead-time
    * number is, which is what anyone quoting `W` at a review needs.
    *
    * Exactness: the WIP area, lead-time sum and horizon are pure BIGINT
    * day arithmetic; every double is a single division (or subtraction
    * then division) of exact BIGINTs, written identically in both
    * engines, so the hash compare is byte-stable.
    *
    * Scale (100 TB): one orderkey-keyed max over lineitem (map-side
    * combined) + one orderkey equi-join for the lead sum — the only
    * corpus-sized exchanges; the area/lead window work runs at DAY
    * grain (|days| rows, corpus-size-independent). The single-partition
    * day-grain window is the documented [[qOrderBacklog]] trade.
    */
  def qLittlesLaw(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val epoch = lit("1970-01-01").cast("date")
    val placed = Tables.orders(spark, sfDir)
      .select($"o_orderkey",
        datediff(to_date($"o_orderdate".cast("timestamp")), epoch)
          .cast("long").as("placed_day"))
    val done = Tables.lineitem(spark, sfDir)
      .groupBy($"l_orderkey")
      .agg(max(to_date($"l_shipdate".cast("timestamp"))).as("last_ship"))
      .select($"l_orderkey", datediff($"last_ship", epoch).cast("long").as("done_day"))
    val deltas = placed.select($"placed_day".as("day"), lit(1L).as("d"))
      .unionAll(done.select($"done_day".as("day"), lit(-1L).as("d")))
      .groupBy($"day").agg(sum($"d").as("net"))
    val runW = Window.orderBy($"day").rowsBetween(Window.unboundedPreceding, 0)
    val offW = Window.orderBy($"day")
    val series = deltas.select($"day",
      sum($"net").over(runW).as("backlog"),
      lead($"day", 1).over(offW).as("next_day"))
    val area = series.where($"next_day".isNotNull)
      .agg(sum($"backlog" * ($"next_day" - $"day")).as("area"))
    val span = deltas.agg((max($"day") - min($"day")).as("horizon_days"))
    val leads = placed.join(done, $"o_orderkey" === $"l_orderkey")
      .agg(count(lit(1)).as("n_completed"),
        sum($"done_day" - $"placed_day").as("lead_sum"))
    val tot = placed.agg(count(lit(1)).as("n_orders"))
    tot.crossJoin(span).crossJoin(area).crossJoin(leads)
      .select($"n_orders", $"n_completed", $"horizon_days", $"area", $"lead_sum",
        ($"area".cast("double") / $"horizon_days").as("wip_avg"),
        ($"n_orders".cast("double") / $"horizon_days").as("arrivals_per_day"),
        ($"lead_sum".cast("double") / $"n_completed").as("lead_avg_days"),
        ($"lead_sum".cast("double") / $"horizon_days").as("wip_pred"),
        (($"area" - $"lead_sum").cast("double") / $"area".cast("double")).as("rel_gap"))
  }

  val qLittlesLawSql: String =
    """WITH placed AS (
      |  SELECT o_orderkey,
      |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS placed_day
      |  FROM orders
      |),
      |done AS (
      |  SELECT l_orderkey,
      |    CAST(max(CAST(l_shipdate AS DATE)) - DATE '1970-01-01' AS BIGINT) AS done_day
      |  FROM lineitem GROUP BY l_orderkey
      |),
      |deltas AS (
      |  SELECT day, CAST(sum(d) AS BIGINT) AS net FROM (
      |    SELECT placed_day AS day, 1 AS d FROM placed
      |    UNION ALL SELECT done_day AS day, -1 AS d FROM done)
      |  GROUP BY day
      |),
      |series AS (
      |  SELECT day,
      |    sum(net) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS backlog,
      |    lead(day) OVER (ORDER BY day) AS next_day
      |  FROM deltas
      |),
      |areat AS (
      |  SELECT CAST(sum(backlog * (next_day - day)) AS BIGINT) AS area
      |  FROM series WHERE next_day IS NOT NULL
      |),
      |span AS (SELECT CAST(max(day) - min(day) AS BIGINT) AS horizon_days FROM deltas),
      |leads AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_completed,
      |    CAST(sum(done_day - placed_day) AS BIGINT) AS lead_sum
      |  FROM placed JOIN done ON o_orderkey = l_orderkey
      |),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_orders FROM placed)
      |SELECT n_orders, n_completed, horizon_days, area, lead_sum,
      |  CAST(area AS DOUBLE) / horizon_days AS wip_avg,
      |  CAST(n_orders AS DOUBLE) / horizon_days AS arrivals_per_day,
      |  CAST(lead_sum AS DOUBLE) / n_completed AS lead_avg_days,
      |  CAST(lead_sum AS DOUBLE) / horizon_days AS wip_pred,
      |  CAST(area - lead_sum AS DOUBLE) / CAST(area AS DOUBLE) AS rel_gap
      |FROM tot CROSS JOIN span CROSS JOIN areat CROSS JOIN leads""".stripMargin

  // ------------------------------------------------------------------
  // Funnel time-to-convert: how long does the journey take?
  // ------------------------------------------------------------------

  /** Funnel TIME-TO-CONVERT distribution — the duration layer
    * [[qEventFunnel]]'s step-count view lacks: two funnels with the
    * same conversion RATE are different products if one converts in
    * minutes and the other in weeks (campaign attribution windows,
    * cart-abandonment timers and re-targeting delays are all set from
    * this table). Over users completing the full
    * signup→click→purchase journey: exact count, mean seconds, and
    * the quartiles of signup→purchase time at MINUTE grain
    * (percentile_disc semantics — the smallest minute whose cumulative
    * count reaches ⌈p·n⌉, exact integer arithmetic end to end).
    *
    * Exactness: step times come from the same min-over-window chain as
    * [[qEventFunnel]]; gaps floor to integer seconds/minutes
    * identically in both engines; the quartile selection is a
    * cumulative-count compare — no interpolation, no doubles except
    * the one mean division.
    *
    * Scale (100 TB): user-keyed windows (the funnel shape), then ONE
    * minute-grain aggregate whose cardinality is the time SPAN in
    * minutes — corpus-size-independent by construction — so the
    * quartile windows never see a corpus-sized frame.
    */
  def qEventFunnelTime(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id")
    val stepped = Tables.events(spark, sfDir)
      .withColumn("t1", min(when($"event_type" === "signup", $"ts")).over(w))
      .withColumn("t3", min(when($"event_type" === "purchase" &&
        $"ts" > $"t1", $"ts")).over(w))
    val gaps = stepped.groupBy($"user_id")
      .agg(min($"t1").as("t1"), min($"t3").as("t3"))
      .filter($"t3".isNotNull)
      .select(expr("(unix_micros(t3) - unix_micros(t1)) div 1000000").as("gap_s"))
      .select($"gap_s", expr("gap_s div 60").as("gap_min"))
    val tot = gaps.agg(count(lit(1)).as("n_converted"), sum($"gap_s").as("sum_s"))
    val grain = gaps.groupBy($"gap_min").agg(count(lit(1)).as("cnt"))
    val wc = Window.orderBy($"gap_min")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = grain.withColumn("cum", sum($"cnt").over(wc))
    def quartile(pNum: Int): Column = min(when(
      col("cum") * 4 >= col("n_converted") * pNum, col("gap_min")))
    cum.crossJoin(broadcast(tot))
      .agg(max($"n_converted").as("n_converted"),
        (max($"sum_s").cast("double") / max($"n_converted").cast("double"))
          .as("mean_gap_s"),
        quartile(1).as("p25_min"), quartile(2).as("p50_min"),
        quartile(3).as("p75_min"))
  }

  val qEventFunnelTimeSql: String =
    """WITH s1 AS (
      |  SELECT user_id, ts, event_type,
      |    min(CASE WHEN event_type = 'signup' THEN ts END)
      |      OVER (PARTITION BY user_id) AS t1
      |  FROM events
      |),
      |s3 AS (
      |  SELECT user_id, t1,
      |    min(CASE WHEN event_type = 'purchase' AND ts > t1 THEN ts END)
      |      OVER (PARTITION BY user_id) AS t3
      |  FROM s1
      |),
      |gaps AS (
      |  SELECT (epoch_us(min(t3)) - epoch_us(min(t1))) // 1000000 AS gap_s,
      |    ((epoch_us(min(t3)) - epoch_us(min(t1))) // 1000000) // 60 AS gap_min
      |  FROM s3 GROUP BY user_id
      |  HAVING min(t3) IS NOT NULL
      |),
      |tot AS (
      |  SELECT count(*) AS n_converted, CAST(sum(gap_s) AS BIGINT) AS sum_s FROM gaps
      |),
      |cum AS (
      |  SELECT gap_min, CAST(sum(count(*)) OVER (ORDER BY gap_min) AS BIGINT) AS cum
      |  FROM gaps GROUP BY gap_min
      |)
      |SELECT max(n_converted) AS n_converted,
      |  CAST(max(sum_s) AS DOUBLE) / CAST(max(n_converted) AS DOUBLE) AS mean_gap_s,
      |  CAST(min(CASE WHEN cum * 4 >= n_converted * 1 THEN gap_min END) AS BIGINT) AS p25_min,
      |  CAST(min(CASE WHEN cum * 4 >= n_converted * 2 THEN gap_min END) AS BIGINT) AS p50_min,
      |  CAST(min(CASE WHEN cum * 4 >= n_converted * 3 THEN gap_min END) AS BIGINT) AS p75_min
      |FROM cum CROSS JOIN tot""".stripMargin

  // ------------------------------------------------------------------
  // Burstiness index: are arrivals clocklike, Poisson, or bursty?
  // ------------------------------------------------------------------

  /** Burstiness index per event type (Goh & Barabási 2008):
    * B = (σ−μ)/(σ+μ) over WITHIN-USER inter-arrival gaps — −1 is a
    * perfect clock, 0 memoryless Poisson, →1 heavy-tailed bursts. The
    * inter-arrival-domain companion of [[qEventDispersion]]'s count-
    * domain Fano factor: dispersion says whether daily VOLUMES are
    * Poisson, burstiness says whether the arrival PROCESS is — a bursty
    * process breaks sessionization timeout tuning and rate-limiter
    * sizing even when daily counts look tame.
    *
    * Exactness: gaps quantize to whole seconds (floored micro diffs —
    * identical in both engines); n, Σg, Σg² accumulate as exact BIGINTs
    * per type; μ, σ and B are a fixed double tree over those integers
    * — σ via Σg²/n − μ² rather than (nΣg²−Σg²)/n², because the n·Σg²
    * product overflows int64 at sf0.1 month-scale gaps (measured) while
    * the sum itself stays exact. Int64 bound on Σg²: safe past 10⁸
    * month-span gaps at second resolution; quantize to minutes beyond.
    *
    * Scale (100 TB): the lag window is (user, type)-keyed — thousands
    * of rows per partition, never a per-type global sort; the moment
    * roll-up is ONE map-side-combinable agg to |types| rows.
    */
  def qEventBurstiness(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id", $"event_type").orderBy($"ts", $"event_id")
    val gaps = Tables.events(spark, sfDir)
      .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
      .filter($"prev_us".isNotNull)
      .select($"event_type",
        expr("(unix_micros(ts) - prev_us) div 1000000").as("gap_s"))
    val mu = $"sg".cast("double") / $"n_gaps".cast("double")
    val sd = sqrt($"sgg".cast("double") / $"n_gaps".cast("double") - mu * mu)
    gaps.groupBy($"event_type")
      .agg(count(lit(1)).as("n_gaps"),
        sum($"gap_s").as("sg"),
        sum($"gap_s" * $"gap_s").as("sgg"))
      .select($"event_type", $"n_gaps", $"sg", $"sgg",
        mu.as("mean_gap_s"), sd.as("sd_gap_s"),
        ((sd - mu) / (sd + mu)).as("burstiness"))
      .orderBy($"event_type")
  }

  val qEventBurstinessSql: String = {
    val mu = "(CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))"
    val sd = s"(sqrt(CAST(sgg AS DOUBLE) / CAST(n_gaps AS DOUBLE) - $mu * $mu))"
    s"""WITH gaps AS (
       |  SELECT event_type,
       |    (epoch_us(ts) - prev_us) // 1000000 AS gap_s
       |  FROM (
       |    SELECT event_type, ts,
       |      lag(epoch_us(ts), 1) OVER (PARTITION BY user_id, event_type
       |        ORDER BY ts, event_id) AS prev_us
       |    FROM events)
       |  WHERE prev_us IS NOT NULL
       |),
       |moments AS (
       |  SELECT event_type, count(*) AS n_gaps,
       |    CAST(sum(gap_s) AS BIGINT) AS sg,
       |    CAST(sum(gap_s * gap_s) AS BIGINT) AS sgg
       |  FROM gaps GROUP BY event_type
       |)
       |SELECT event_type, n_gaps, sg, sgg,
       |  $mu AS mean_gap_s,
       |  $sd AS sd_gap_s,
       |  ($sd - $mu) / ($sd + $mu) AS burstiness
       |FROM moments
       |ORDER BY event_type""".stripMargin
  }

  // ------------------------------------------------------------------
  // SPC control chart: Shewhart 3σ + runs-rule violations per type
  // ------------------------------------------------------------------

  /** Baseline fraction (first 6/10 of the observed day span trains the
    * control limits) and the runs-rule length (8 consecutive points one
    * side of the center line — the classic Western Electric rule 4).
    * Literal RHS `final` per the init-cycle rule.
    */
  final val spcBaseNum = 6L
  final val spcBaseDen = 10L
  final val spcRunLen = 8L

  /** SPC CONTROL CHART over each event type's DAILY event count — the
    * monitoring primitive every ingest pipeline runs on its volume
    * series: train center line and 3σ control limits on a baseline
    * window (first [[spcBaseNum]]/[[spcBaseDen]] of the observed day
    * span), then flag the monitoring remainder with the two classic
    * Shewhart tests — rule 1 (a point beyond ±3σ) and the runs rule (a
    * run of ≥ [[spcRunLen]] consecutive observed days strictly one side
    * of the center line, Western Electric rule 4). Where
    * [[qEventChangepoint]] finds the single largest level shift
    * retrospectively, this is the ONLINE operating view: per-type
    * violation counts a pager would key on.
    *
    * Exactness: the rule-1 compare never touches a double — with
    * baseline day-count n, sum S, sum-of-squares Q, point x, the test
    * |x − S/n| > 3σ cross-multiplies to
    * (x·n − S)²·(n−1) > 9·n·(n·Q − S²), all exact BIGINTs (int64-safe
    * to ~10⁸ events/day/type; past that widen the products to
    * DECIMAL(38,0)). The side of the center line is sign(x·n − S),
    * also exact, so run boundaries are deterministic; runs are
    * gaps-and-islands over the observed monitor days (standard chart
    * semantics: points, not calendar gaps). The EMITTED mean/σ are
    * single divisions / one sqrt of those exact integers — identical
    * doubles in both engines.
    *
    * Scale (100 TB): the raw corpus collapses to |types|×|days| daily
    * rows in ONE partially-aggregated shuffle; the span probe is a
    * 1-row broadcast, baseline moments a |types|-row broadcast, and the
    * runs windows partition by (type[, side]) over the metadata-sized
    * daily series. Nothing after the first aggregate sees a raw event.
    */
  def qEventSpc(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .groupBy($"event_type",
        datediff(to_date($"ts"), lit("1970-01-01")).cast("long").as("dn"))
      .agg(count(lit(1)).as("x"))
    val span = daily.agg(min($"dn").as("d0"), max($"dn").as("d1"))
      .select(($"d0" + expr(
        s"((d1 - d0 + 1) * $spcBaseNum) div $spcBaseDen")).as("d_cut"))
    val cut = daily.crossJoin(broadcast(span))
    val base = cut.filter($"dn" < $"d_cut")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("nb"), sum($"x").as("s"),
        sum($"x" * $"x").as("q"))
      .filter($"nb" >= 2)
    val mon = cut.filter($"dn" >= $"d_cut")
      .join(broadcast(base), "event_type")
      .withColumn("dev", $"x" * $"nb" - $"s")
      .withColumn("side",
        when($"dev" > 0, 1).when($"dev" < 0, -1).otherwise(0))
      .withColumn("r1",
        $"dev" * $"dev" * ($"nb" - 1) > lit(9L) * $"nb" * ($"nb" * $"q" - $"s" * $"s"))
    val wAll = Window.partitionBy($"event_type").orderBy($"dn")
    val wSide = Window.partitionBy($"event_type", $"side").orderBy($"dn")
    val runs = mon
      .withColumn("grp", row_number().over(wAll) - row_number().over(wSide))
      .groupBy($"event_type", $"side", $"grp")
      .agg(count(lit(1)).as("len"))
      .groupBy($"event_type")
      .agg(sum(when($"side" =!= 0 && $"len" >= spcRunLen, 1L).otherwise(0L))
        .as("n_runs_rule"),
        max(when($"side" =!= 0, $"len").otherwise(0L)).as("max_run"))
    val monAgg = mon.groupBy($"event_type")
      .agg(count(lit(1)).as("n_mon_days"),
        sum(when($"r1", 1L).otherwise(0L)).as("n_rule1"))
    base
      .join(monAgg, "event_type").join(runs, "event_type")
      .select($"event_type", $"nb".as("n_base_days"), $"n_mon_days",
        ($"s".cast("double") / $"nb").as("base_mean"),
        sqrt(($"nb" * $"q" - $"s" * $"s").cast("double") /
          ($"nb" * ($"nb" - 1)).cast("double")).as("base_sd"),
        $"n_rule1", $"n_runs_rule", $"max_run")
      .orderBy($"event_type")
  }

  val qEventSpcSql: String =
    s"""WITH daily AS (
       |  SELECT event_type,
       |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dn,
       |    count(*) AS x
       |  FROM events GROUP BY event_type, dn
       |),
       |span AS (
       |  SELECT min(dn) + ((max(dn) - min(dn) + 1) * $spcBaseNum) // $spcBaseDen
       |    AS d_cut FROM daily
       |),
       |base AS (
       |  SELECT event_type, count(*) AS nb, CAST(sum(x) AS BIGINT) AS s,
       |    CAST(sum(x * x) AS BIGINT) AS q
       |  FROM daily CROSS JOIN span WHERE dn < d_cut
       |  GROUP BY event_type HAVING count(*) >= 2
       |),
       |mon AS (
       |  SELECT daily.event_type, dn, x, nb, s, q,
       |    x * nb - s AS dev,
       |    CASE WHEN x * nb - s > 0 THEN 1
       |         WHEN x * nb - s < 0 THEN -1 ELSE 0 END AS side,
       |    (x * nb - s) * (x * nb - s) * (nb - 1) > 9 * nb * (nb * q - s * s)
       |      AS r1
       |  FROM daily CROSS JOIN span
       |  JOIN base ON base.event_type = daily.event_type
       |  WHERE dn >= d_cut
       |),
       |runs AS (
       |  SELECT event_type, side, count(*) AS len
       |  FROM (
       |    SELECT event_type, side,
       |      row_number() OVER (PARTITION BY event_type ORDER BY dn) -
       |      row_number() OVER (PARTITION BY event_type, side ORDER BY dn)
       |        AS grp
       |    FROM mon)
       |  GROUP BY event_type, side, grp
       |),
       |run_agg AS (
       |  SELECT event_type,
       |    sum(CASE WHEN side <> 0 AND len >= $spcRunLen THEN 1 ELSE 0 END)
       |      AS n_runs_rule,
       |    max(CASE WHEN side <> 0 THEN len ELSE 0 END) AS max_run
       |  FROM runs GROUP BY event_type
       |),
       |mon_agg AS (
       |  SELECT event_type, count(*) AS n_mon_days,
       |    sum(CASE WHEN r1 THEN 1 ELSE 0 END) AS n_rule1
       |  FROM mon GROUP BY event_type
       |)
       |SELECT base.event_type, nb AS n_base_days, n_mon_days,
       |  CAST(s AS DOUBLE) / nb AS base_mean,
       |  sqrt(CAST(nb * q - s * s AS DOUBLE) / CAST(nb * (nb - 1) AS DOUBLE))
       |    AS base_sd,
       |  CAST(n_rule1 AS BIGINT) AS n_rule1,
       |  CAST(n_runs_rule AS BIGINT) AS n_runs_rule,
       |  CAST(max_run AS BIGINT) AS max_run
       |FROM base
       |JOIN mon_agg ON mon_agg.event_type = base.event_type
       |JOIN run_agg ON run_agg.event_type = base.event_type
       |ORDER BY base.event_type""".stripMargin

  // ------------------------------------------------------------------
  // Poisson bootstrap: distributed CI for the per-type mean value
  // ------------------------------------------------------------------

  /** Replicate count and the order-statistic ranks (1-based) emitted as
    * the ~95% percentile interval: the 2nd and 39th of 40 sorted
    * replicate means bracket the central 92.7%–97.5% nominal band.
    * Literal RHS `final` per the init-cycle rule.
    */
  final val bootReps = 40
  final val bootLoIdx = 2
  final val bootHiIdx = 39

  /** Replicate-mixing multiplier — MINSTD's 48271, a primitive root of
    * the prime M = 2³¹−1 — and its power table c^b mod M for
    * b < [[bootReps]]. Every power is nonzero mod the PRIME M, so each
    * per-replicate multiplier is a bijection of Z_M (per-replicate
    * uniformity stays exact), while consecutive replicates follow the
    * multiplicative Lehmer recurrence u_{b+1} = c·u_b mod M instead of
    * an arithmetic progression in b: the r11-advice fix — the old
    * linear (c+b) multipliers gave every event a rep-to-rep step ≡ u₀,
    * nearly freezing the replicate weights of small-u₀ events and
    * deflating replicate variance. Same two-int64-op cost per row
    * (table lookup + one multiply-mod).
    */
  final val bootMixC = 48271L
  val bootMults: Seq[Long] =
    Iterator.iterate(1L)(m => (m * bootMixC) % 2147483647L).take(bootReps).toSeq

  /** POISSON BOOTSTRAP confidence interval for each event type's mean
    * value — THE distributed bootstrap: a classical resample draws n of
    * n rows WITH replacement, which needs global coordination, but each
    * row's multiplicity in a resample is asymptotically Poisson(1), so
    * every row can draw its own multiplicity per replicate INDEPENDENTLY
    * — one narrow ×[[bootReps]] fan-out, no global pass (the estimator
    * behind bootstrap CIs in every large-scale metrics system). Here the
    * multiplicity is DERANDOMIZED — and hashed ONCE per event, not once
    * per (event, replicate): u₀ = portable-hash(event_id) mod the prime
    * M = 2³¹−1, shifted nonzero (u₀ % (M−1) + 1 ∈ [1, M−1], so no
    * event's weights freeze across all replicates), and replicate b's
    * uniform is u₀·([[bootMults]](b)) mod M mod 10⁶ — the MINSTD power
    * table: per-replicate uniformity is exact (each power is a
    * bijection of Z_M) and rep-to-rep steps follow the multiplicative
    * Lehmer recurrence, not an arithmetic progression (see
    * [[bootMixC]]). The md5 was the ×[[bootReps]] hot loop
    * (40·N digests); the rescramble is two int64 ops inside codegen
    * (r11: 4.9 s → the shuffle floor at sf0.1). u feeds the exact
    * Poisson(1) inverse CDF in micro-units (thresholds 367879, 735758,
    * 919698, 981011, 996340, 999405, 999916, capped at 8) — both
    * engines walk the identical integer CASE chain, so every replicate
    * is reproducible.
    *
    * Exactness: weighted sums are DECIMAL(18,4)·int (exact,
    * order-free); each replicate mean and the point mean are single
    * exact-to-double divisions; the interval is a rank pick
    * ([[bootLoIdx]]/[[bootHiIdx]]) from the sorted replicate means —
    * a [[bootReps]]-bounded array, the constant-size model-state
    * exception, not a data collect.
    *
    * Scale (100 TB): the fan-out is NARROW (explode of a literal
    * sequence inside codegen) and combines map-side to (type, rep)
    * grain BEFORE the shuffle — the exchange carries
    * |types|·[[bootReps]] partial rows regardless of input size;
    * the sort is over [[bootReps]] values per type.
    */
  def qEventBootstrap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.events(spark, sfDir)
      .select($"event_type", $"event_id", dec($"value").as("v"))
    val m = {
      val u = col("u")
      when(u < 367879L, 0L).when(u < 735758L, 1L).when(u < 919698L, 2L)
        .when(u < 981011L, 3L).when(u < 996340L, 4L).when(u < 999405L, 5L)
        .when(u < 999916L, 6L).when(u < 999989L, 7L).otherwise(8L)
    }
    val reps = base
      .withColumn("u0", graft.ext.TextOps.h31($"event_id".cast("string")))
      // nonzero seed: u₀ = 0 would pin every replicate at u = 0 (event
      // absent from all resamples); % (M−1) + 1 lands in [1, M−1]
      .withColumn("u0p", ($"u0" % 2147483646L) + 1L)
      .select($"event_type", $"v", $"u0p",
        explode(expr(s"sequence(0, ${bootReps - 1})")).as("b"))
      .withColumn("u",
        ($"u0p" * element_at(typedLit(bootMults), ($"b" + 1).cast("int")))
          % 2147483647L % 1000000L)
      .withColumn("m", m)
      .groupBy($"event_type", $"b")
      .agg(sum($"m").as("mw"), sum($"v" * $"m").as("sv"))
      .filter($"mw" > 0)
      .select($"event_type",
        ($"sv".cast("double") / $"mw".cast("double")).as("bm"))
    val ci = reps.groupBy($"event_type")
      .agg(count(lit(1)).as("n_reps"),
        array_sort(collect_list($"bm")).as("ms"))
      .select($"event_type", $"n_reps",
        element_at($"ms", bootLoIdx).as("ci_lo"),
        element_at($"ms", bootHiIdx).as("ci_hi"))
    base.groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        (sum($"v").cast("double") / count(lit(1))).as("mean_value"))
      .join(ci, "event_type")
      .orderBy($"event_type")
  }

  val qEventBootstrapSql: String = {
    val h0 = "(CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)) " +
      "AS BIGINT) % 2147483647)"
    s"""WITH base AS (
       |  SELECT event_type, event_id, CAST(value AS DECIMAL(18,4)) AS v
       |  FROM events
       |),
       |drawn AS (
       |  SELECT event_type, b, v,
       |    CASE WHEN u < 367879 THEN 0 WHEN u < 735758 THEN 1
       |         WHEN u < 919698 THEN 2 WHEN u < 981011 THEN 3
       |         WHEN u < 996340 THEN 4 WHEN u < 999405 THEN 5
       |         WHEN u < 999916 THEN 6 WHEN u < 999989 THEN 7
       |         ELSE 8 END AS m
       |  FROM (
       |    SELECT event_type, v, b,
       |      ((u0p * CAST(${bootMults.mkString("[", ", ", "]")}[b + 1] AS BIGINT))
       |        % 2147483647) % 1000000 AS u
       |    FROM (SELECT event_type, v, ($h0 % 2147483646) + 1 AS u0p FROM base)
       |    CROSS JOIN (SELECT unnest(range($bootReps)) AS b))
       |),
       |reps AS (
       |  SELECT event_type,
       |    CAST(sum(m * v) AS DOUBLE) / CAST(sum(m) AS DOUBLE) AS bm
       |  FROM drawn GROUP BY event_type, b HAVING sum(m) > 0
       |),
       |ci AS (
       |  SELECT event_type, count(*) AS n_reps,
       |    list(bm ORDER BY bm) AS ms
       |  FROM reps GROUP BY event_type
       |)
       |SELECT base.event_type, count(*) AS n,
       |  CAST(sum(v) AS DOUBLE) / count(*) AS mean_value,
       |  any_value(n_reps) AS n_reps,
       |  any_value(ms[$bootLoIdx]) AS ci_lo,
       |  any_value(ms[$bootHiIdx]) AS ci_hi
       |FROM base JOIN ci ON ci.event_type = base.event_type
       |GROUP BY base.event_type
       |ORDER BY base.event_type""".stripMargin
  }

  // ------------------------------------------------------------------
  // SAX symbolization: the daily value series as a 4-letter word
  // ------------------------------------------------------------------

  /** PAA segment width in days and the 4-symbol Gaussian breakpoints
    * (±0.6745 ≈ the standard-normal quartiles, the canonical SAX
    * alphabet-4 table). Literal RHS `final` per the init-cycle rule.
    */
  final val saxSegDays = 7L
  final val saxBreakHi = 0.6745
  final val saxBreakLo = -0.6745

  /** SAX SYMBOLIZATION (Lin et al. 2003) of each event type's daily
    * value series: z-normalize the daily totals against the type's own
    * mean/σ, average into [[saxSegDays]]-day PAA segments, and map each
    * segment mean through the Gaussian-quartile breakpoints to the
    * 4-letter alphabet a–d — the series becomes ONE WORD per type, the
    * representation behind wholesale time-series indexing, motif
    * mining, and anomaly grammars. Where [[qEventSeasonality]] and
    * [[qEventAcf]] measure periodic structure numerically, SAX is the
    * SYMBOLIC compression downstream discrete algorithms consume.
    *
    * Exactness: daily totals are exact BIGINT cents; series moments
    * (n, Σx, Σx²) are exact BIGINTs (int64-safe to ~10⁹-cent days;
    * widen past that); each segment's z-score and the breakpoint
    * compares evaluate one fixed double expression over those exact
    * integers — identical IEEE results in both engines (sqrt and ÷ are
    * correctly-rounded everywhere; no libm transcendentals). Constant
    * series (σ = 0) are excluded rather than divided by zero (ANSI
    * rule).
    *
    * Scale (100 TB): the corpus collapses to |types|×|days| in one
    * partially-aggregated shuffle; moments are a |types|-row broadcast;
    * segments and the word assembly (sorted-struct fold, ≤ days/7
    * letters per type) are metadata-sized.
    */
  def qEventSax(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .groupBy($"event_type",
        datediff(to_date($"ts"), lit("1970-01-01")).cast("long").as("dn"))
      .agg(floor(sum(dec($"value")) * 100).cast("long").as("xc"))
    val span = daily.agg(min($"dn").as("d0"))
    val mom = daily.groupBy($"event_type")
      .agg(count(lit(1)).as("nb"), sum($"xc").as("s"),
        sum($"xc" * $"xc").as("q"))
      .filter($"nb" >= 2 && $"nb" * $"q" - $"s" * $"s" > 0)
    val segs = daily.crossJoin(broadcast(span))
      .withColumn("seg", expr(s"(dn - d0) div $saxSegDays"))
      .groupBy($"event_type", $"seg")
      .agg(count(lit(1)).as("cnt"), sum($"xc").as("sx"))
    val z = segs.join(broadcast(mom), "event_type")
      .withColumn("sd",
        sqrt(($"nb" * $"q" - $"s" * $"s").cast("double") /
          ($"nb" * ($"nb" - 1)).cast("double")))
      .withColumn("z",
        (($"sx".cast("double") / $"cnt") - ($"s".cast("double") / $"nb")) / $"sd")
      .withColumn("sym",
        when($"z" < saxBreakLo, "a").when($"z" < 0.0, "b")
          .when($"z" < saxBreakHi, "c").otherwise("d"))
    z.groupBy($"event_type")
      .agg(max($"nb").as("n_days"), count(lit(1)).as("n_segments"),
        concat_ws("", transform(
          array_sort(collect_list(struct($"seg", $"sym"))),
          x => x.getField("sym"))).as("sax_word"),
        sum(when($"sym" === "a", 1L).otherwise(0L)).as("n_a"),
        sum(when($"sym" === "b", 1L).otherwise(0L)).as("n_b"),
        sum(when($"sym" === "c", 1L).otherwise(0L)).as("n_c"),
        sum(when($"sym" === "d", 1L).otherwise(0L)).as("n_d"))
      .orderBy($"event_type")
  }

  val qEventSaxSql: String =
    s"""WITH daily AS (
       |  SELECT event_type,
       |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dn,
       |    CAST(floor(sum(CAST(value AS DECIMAL(18,4))) * 100) AS BIGINT) AS xc
       |  FROM events GROUP BY event_type, dn
       |),
       |span AS (SELECT min(dn) AS d0 FROM daily),
       |mom AS (
       |  SELECT event_type, count(*) AS nb, CAST(sum(xc) AS BIGINT) AS s,
       |    CAST(sum(xc * xc) AS BIGINT) AS q
       |  FROM daily GROUP BY event_type
       |  HAVING count(*) >= 2 AND count(*) * sum(xc * xc) - sum(xc) * sum(xc) > 0
       |),
       |segs AS (
       |  SELECT event_type, (dn - d0) // $saxSegDays AS seg,
       |    count(*) AS cnt, CAST(sum(xc) AS BIGINT) AS sx
       |  FROM daily CROSS JOIN span
       |  GROUP BY event_type, seg
       |),
       |z AS (
       |  SELECT segs.event_type AS event_type, seg, nb,
       |    CASE WHEN zv < $saxBreakLo THEN 'a' WHEN zv < 0.0 THEN 'b'
       |         WHEN zv < $saxBreakHi THEN 'c' ELSE 'd' END AS sym
       |  FROM (
       |    SELECT segs.event_type, seg, nb,
       |      ((CAST(sx AS DOUBLE) / cnt) - (CAST(s AS DOUBLE) / nb)) /
       |        sqrt(CAST(nb * q - s * s AS DOUBLE) /
       |             CAST(nb * (nb - 1) AS DOUBLE)) AS zv
       |    FROM segs JOIN mom ON mom.event_type = segs.event_type) segs
       |)
       |SELECT event_type, max(nb) AS n_days, count(*) AS n_segments,
       |  string_agg(sym, '' ORDER BY seg) AS sax_word,
       |  CAST(sum(CASE WHEN sym = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |  CAST(sum(CASE WHEN sym = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |  CAST(sum(CASE WHEN sym = 'c' THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
       |  CAST(sum(CASE WHEN sym = 'd' THEN 1 ELSE 0 END) AS BIGINT) AS n_d
       |FROM z GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------------
  // Perfect-order rate: the composite fulfilment KPI
  // ------------------------------------------------------------------

  /** Lead-time bound (days) a line must ship within for its order to
    * count as perfect. Literal RHS `final` per the init-cycle rule.
    */
  final val perfectLeadDays = 30L

  /** PERFECT-ORDER RATE per priority — the composite fulfilment KPI
    * operations teams actually report: an order is PERFECT iff EVERY
    * line shipped within [[perfectLeadDays]] days of the order date AND
    * no line came back returned ('R'). [[qOrderSlaCurve]] grades
    * line-level lead times against thresholds; this is the ORDER-grain
    * conjunction (one bad line spoils the order) with the failure
    * decomposition — late-only / return-only / both — that says which
    * lever to pull. Orders with no shipped lines (open orders) are out
    * of scope, as in the lead-time family.
    *
    * Exactness: flags are integer max-reductions per order; all counts
    * BIGINT; the rate is one guarded exact-to-double division.
    *
    * Scale (100 TB): one orderkey-keyed join+aggregate (the join
    * output feeds the order-grain agg on the SAME key, so AQE keeps
    * them in one exchange), then a 5-row priority rollup — map-side
    * combined both stages.
    */
  def qOrderPerfect(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val perOrder = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), $"l_orderkey" === $"o_orderkey")
      .select($"o_orderkey", $"o_orderpriority",
        when(datediff(to_date($"l_shipdate"),
          to_date($"o_orderdate".cast("timestamp"))) > perfectLeadDays, 1L)
          .otherwise(0L).as("late"),
        when($"l_returnflag" === "R", 1L).otherwise(0L).as("ret"))
      .groupBy($"o_orderkey", $"o_orderpriority")
      .agg(max($"late").as("has_late"), max($"ret").as("has_ret"))
    perOrder.groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(when($"has_late" === 0 && $"has_ret" === 0, 1L).otherwise(0L))
          .as("n_perfect"),
        sum(when($"has_late" === 1 && $"has_ret" === 0, 1L).otherwise(0L))
          .as("n_late_only"),
        sum(when($"has_late" === 0 && $"has_ret" === 1, 1L).otherwise(0L))
          .as("n_return_only"),
        sum(when($"has_late" === 1 && $"has_ret" === 1, 1L).otherwise(0L))
          .as("n_both"))
      .select($"o_orderpriority", $"n_orders", $"n_perfect",
        when($"n_orders" > 0, $"n_perfect".cast("double") / $"n_orders")
          .otherwise(lit(0.0)).as("perfect_rate"),
        $"n_late_only", $"n_return_only", $"n_both")
      .orderBy($"o_orderpriority")
  }

  val qOrderPerfectSql: String =
    s"""WITH per_order AS (
       |  SELECT o_orderkey, o_orderpriority,
       |    max(CASE WHEN CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE)
       |          > $perfectLeadDays THEN 1 ELSE 0 END) AS has_late,
       |    max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_ret
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  GROUP BY o_orderkey, o_orderpriority
       |)
       |SELECT o_orderpriority, count(*) AS n_orders,
       |  CAST(sum(CASE WHEN has_late = 0 AND has_ret = 0 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_perfect,
       |  CASE WHEN count(*) > 0
       |    THEN CAST(sum(CASE WHEN has_late = 0 AND has_ret = 0 THEN 1
       |      ELSE 0 END) AS DOUBLE) / count(*)
       |    ELSE CAST(0.0 AS DOUBLE) END AS perfect_rate,
       |  CAST(sum(CASE WHEN has_late = 1 AND has_ret = 0 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_late_only,
       |  CAST(sum(CASE WHEN has_late = 0 AND has_ret = 1 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_return_only,
       |  CAST(sum(CASE WHEN has_late = 1 AND has_ret = 1 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_both
       |FROM per_order
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  // ------------------------------------------------------------------
  // Two-sample Kolmogorov-Smirnov: exact nonparametric drift test
  // ------------------------------------------------------------------

  /** KS critical coefficient for α = 0.05 (the classical 1.358).
    * Literal RHS `final` per the init-cycle rule.
    */
  final val ksCrit05 = 1.358

  /** TWO-SAMPLE KOLMOGOROV-SMIRNOV drift test per event type — the
    * exact nonparametric companion to the binned PSI-style
    * [[qEventDrift]]: split each type's values at the midpoint of the
    * observed day span (reference = first half, current = second), and
    * compute D = sup|F̂₁ − F̂₂| over the pooled empirical CDFs. PSI
    * sees what its bins see; KS is binning-free and distribution-free,
    * the test a feature-monitoring system runs when the PSI alarm needs
    * a p-value. Emitted with the α=0.05 decision
    * D > [[ksCrit05]]·√((n₁+n₂)/(n₁·n₂)).
    *
    * Exactness: values enter as exact DECIMAL(18,4) ten-thousandths
    * (BIGINT); per distinct value the CDF gap cross-multiplies to
    * |c₁·n₂ − c₂·n₁| — pure BIGINTs, so the supremum and the argmax
    * are integer decisions (int64-safe to n ~ 3·10⁹ per arm; past that
    * pre-bin to a quantile sketch). D and the threshold are one
    * division and one sqrt of exact integers — identical doubles.
    *
    * Scale (100 TB): one (type, value) pre-aggregate collapses the
    * corpus to distinct values (map-side combined); the cumulative
    * window partitions by type over that reduced frame; the final
    * rollup is |types| rows.
    */
  def qEventKsDrift(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select($"event_type",
        datediff(to_date($"ts"), lit("1970-01-01")).cast("long").as("dn"),
        (dec($"value") * 10000).cast("long").as("v4"))
    val span = ev.agg(min($"dn").as("d0"), max($"dn").as("d1"))
      .select(($"d0" + expr("(d1 - d0 + 1) div 2")).as("d_mid"))
    val armed = ev.crossJoin(broadcast(span))
      .select($"event_type", $"v4",
        when($"dn" < $"d_mid", 1L).otherwise(0L).as("in_ref"))
    val perValue = armed.groupBy($"event_type", $"v4")
      .agg(sum($"in_ref").as("a1"), sum(lit(1L) - $"in_ref").as("a2"))
    val w = Window.partitionBy($"event_type").orderBy($"v4")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wTot = Window.partitionBy($"event_type")
    val gaps = perValue
      .select($"event_type",
        sum($"a1").over(w).as("c1"), sum($"a2").over(w).as("c2"),
        sum($"a1").over(wTot).as("n1"), sum($"a2").over(wTot).as("n2"))
      .select($"event_type", $"n1", $"n2",
        abs($"c1" * $"n2" - $"c2" * $"n1").as("gap"))
    gaps.groupBy($"event_type")
      .agg(max($"n1").as("n_ref"), max($"n2").as("n_cur"),
        max($"gap").as("d_num"))
      .filter($"n_ref" > 0 && $"n_cur" > 0)
      .select($"event_type", $"n_ref", $"n_cur", $"d_num",
        ($"d_num".cast("double") / ($"n_ref" * $"n_cur").cast("double"))
          .as("d_stat"),
        (lit(ksCrit05) * sqrt(($"n_ref" + $"n_cur").cast("double") /
          ($"n_ref" * $"n_cur").cast("double"))).as("ks_crit"),
        ($"d_num".cast("double") / ($"n_ref" * $"n_cur").cast("double") >
          lit(ksCrit05) * sqrt(($"n_ref" + $"n_cur").cast("double") /
            ($"n_ref" * $"n_cur").cast("double"))).as("drifted"))
      .orderBy($"event_type")
  }

  val qEventKsDriftSql: String =
    s"""WITH ev AS (
       |  SELECT event_type,
       |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dn,
       |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v4
       |  FROM events
       |),
       |span AS (SELECT min(dn) + (max(dn) - min(dn) + 1) // 2 AS d_mid FROM ev),
       |per_value AS (
       |  SELECT event_type, v4,
       |    CAST(sum(CASE WHEN dn < d_mid THEN 1 ELSE 0 END) AS BIGINT) AS a1,
       |    CAST(sum(CASE WHEN dn < d_mid THEN 0 ELSE 1 END) AS BIGINT) AS a2
       |  FROM ev CROSS JOIN span
       |  GROUP BY event_type, v4
       |),
       |gaps AS (
       |  SELECT event_type,
       |    sum(a1) OVER (PARTITION BY event_type) AS n1,
       |    sum(a2) OVER (PARTITION BY event_type) AS n2,
       |    abs(sum(a1) OVER (PARTITION BY event_type ORDER BY v4
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) *
       |        sum(a2) OVER (PARTITION BY event_type) -
       |        sum(a2) OVER (PARTITION BY event_type ORDER BY v4
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) *
       |        sum(a1) OVER (PARTITION BY event_type)) AS gap
       |  FROM per_value
       |)
       |SELECT event_type, CAST(max(n1) AS BIGINT) AS n_ref,
       |  CAST(max(n2) AS BIGINT) AS n_cur, CAST(max(gap) AS BIGINT) AS d_num,
       |  CAST(max(gap) AS DOUBLE) / CAST(max(n1) * max(n2) AS DOUBLE) AS d_stat,
       |  $ksCrit05 * sqrt(CAST(max(n1) + max(n2) AS DOUBLE) /
       |    CAST(max(n1) * max(n2) AS DOUBLE)) AS ks_crit,
       |  CAST(max(gap) AS DOUBLE) / CAST(max(n1) * max(n2) AS DOUBLE) >
       |    $ksCrit05 * sqrt(CAST(max(n1) + max(n2) AS DOUBLE) /
       |      CAST(max(n1) * max(n2) AS DOUBLE)) AS drifted
       |FROM gaps
       |GROUP BY event_type
       |HAVING max(n1) > 0 AND max(n2) > 0
       |ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------------
  // Record-count stationarity audit: observed records vs harmonic law
  // ------------------------------------------------------------------

  /** RECORD-COUNT STATIONARITY AUDIT per event type — a classical and
    * nearly-free drift diagnostic: in an exchangeable (trend-free)
    * series, the k-th observation is a new running MAXIMUM with
    * probability exactly 1/k, so the expected record count over n days
    * is the harmonic number H(n) ≈ ln n — for 90 days, ~5. A daily
    * series setting far more HIGH records than H(n) is trending up;
    * far more LOW records (running minima) is decaying. Both sides are
    * counted and ratioed against H(n) — the test costs two windowed
    * comparisons, needs no model, and its null expectation is
    * parameter-free.
    *
    * Exactness: daily totals are exact BIGINT cents; record decisions
    * are strict integer compares against the windowed running extreme
    * (first day counts as a record on both sides, the convention);
    * H(n) is a SEQUENTIAL left fold over k = 1..n of exact 1/k doubles
    * — identical in both engines (no partial-agg double sum).
    *
    * Scale (100 TB): the corpus collapses to |types|×|days| daily rows
    * in one partially-aggregated shuffle; the extremes windows and the
    * H(n) fold run on that metadata-sized frame.
    */
  def qEventRecords(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .groupBy($"event_type",
        datediff(to_date($"ts"), lit("1970-01-01")).cast("long").as("dn"))
      .agg(floor(sum(dec($"value")) * 100).cast("long").as("xc"))
    val wPrev = Window.partitionBy($"event_type").orderBy($"dn")
      .rowsBetween(Window.unboundedPreceding, -1)
    daily
      .select($"event_type", $"xc",
        max($"xc").over(wPrev).as("pmax"), min($"xc").over(wPrev).as("pmin"))
      .select($"event_type",
        when($"pmax".isNull || $"xc" > $"pmax", 1L).otherwise(0L).as("hi"),
        when($"pmin".isNull || $"xc" < $"pmin", 1L).otherwise(0L).as("lo"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"), sum($"hi").as("n_high_records"),
        sum($"lo").as("n_low_records"))
      .withColumn("expected_records",
        expr("aggregate(sequence(1L, n_days), 0.0D, (acc, k) -> acc + 1.0D / k)"))
      .select($"event_type", $"n_days", $"n_high_records", $"n_low_records",
        $"expected_records",
        ($"n_high_records".cast("double") / $"expected_records").as("high_ratio"),
        ($"n_low_records".cast("double") / $"expected_records").as("low_ratio"))
      .orderBy($"event_type")
  }

  val qEventRecordsSql: String =
    """WITH daily AS (
      |  SELECT event_type,
      |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dn,
      |    CAST(floor(sum(CAST(value AS DECIMAL(18,4))) * 100) AS BIGINT) AS xc
      |  FROM events GROUP BY event_type, dn
      |),
      |flagged AS (
      |  SELECT event_type,
      |    CASE WHEN pmax IS NULL OR xc > pmax THEN 1 ELSE 0 END AS hi,
      |    CASE WHEN pmin IS NULL OR xc < pmin THEN 1 ELSE 0 END AS lo
      |  FROM (
      |    SELECT event_type, xc,
      |      max(xc) OVER (PARTITION BY event_type ORDER BY dn
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax,
      |      min(xc) OVER (PARTITION BY event_type ORDER BY dn
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmin
      |    FROM daily)
      |),
      |agg AS (
      |  SELECT event_type, count(*) AS n_days,
      |    CAST(sum(hi) AS BIGINT) AS n_high_records,
      |    CAST(sum(lo) AS BIGINT) AS n_low_records
      |  FROM flagged GROUP BY event_type
      |)
      |SELECT event_type, n_days, n_high_records, n_low_records,
      |  list_reduce(
      |    list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(range(1, CAST(n_days + 1 AS BIGINT)),
      |        k -> 1.0 / k)),
      |    (acc, x) -> acc + x) AS expected_records,
      |  CAST(n_high_records AS DOUBLE) / list_reduce(
      |    list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(range(1, CAST(n_days + 1 AS BIGINT)),
      |        k -> 1.0 / k)),
      |    (acc, x) -> acc + x) AS high_ratio,
      |  CAST(n_low_records AS DOUBLE) / list_reduce(
      |    list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(range(1, CAST(n_days + 1 AS BIGINT)),
      |        k -> 1.0 / k)),
      |    (acc, x) -> acc + x) AS low_ratio
      |FROM agg
      |ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------------
  // Haar wavelet energy: which timescale carries the variance?
  // ------------------------------------------------------------------

  /** Decomposition depth: detail levels 1..5 (2-day up to 32-day
    * structure). Literal RHS `final` per the init-cycle rule.
    */
  final val haarLevels = 5

  /** HAAR WAVELET ENERGY SPECTRUM of each event type's daily value
    * series — the multi-resolution decomposition of the series'
    * variance: the level-ℓ detail coefficients are differences between
    * adjacent 2^(ℓ−1)-day block sums, and their summed squares say
    * WHICH TIMESCALE the variation lives at (level 1 ≈ day-to-day
    * noise, level 3 ≈ weekly structure, level 5 ≈ monthly drift).
    * [[qEventAcf]] asks "is there weekly correlation?"; the wavelet
    * energy profile localizes ALL the scales at once — the standard
    * series-characterization step before choosing a smoothing or
    * seasonality model. Missing days inside a block contribute zero
    * (sum semantics); the trailing partial block is kept (documented
    * half-open padding).
    *
    * Exactness: PURE INTEGERS end to end — daily cents, block sums by
    * integer day-index division, detail d = A − B, energy Σd² as
    * BIGINT cents² (int64-safe to ~10⁹-cent block sums; widen past
    * that). The per-level share is the single closing division.
    *
    * Scale (100 TB): the corpus collapses once to |types|×|days|; each
    * of the 5 levels is one more metadata-sized aggregate of that
    * frame (block key = dn div 2^ℓ, arm sign by bit ℓ−1), unioned —
    * no window, no self-join, all map-side combinable.
    */
  def qEventHaarEnergy(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .groupBy($"event_type",
        datediff(to_date($"ts"), lit("1970-01-01")).cast("long").as("dn"))
      .agg(floor(sum(dec($"value")) * 100).cast("long").as("xc"))
    val span = daily.agg(min($"dn").as("d0"))
    val idx = daily.crossJoin(broadcast(span))
      .select($"event_type", ($"dn" - $"d0").as("di"), $"xc")
    val levels = (1 to haarLevels).map { l =>
      val block = 1L << l
      val half = 1L << (l - 1)
      idx
        .groupBy($"event_type", expr(s"di div $block").as("blk"))
        .agg(sum(when(expr(s"(di div $half) % 2") === 0, $"xc")
          .otherwise(-$"xc")).as("d"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_blocks"), sum($"d" * $"d").as("energy"))
        .select($"event_type", lit(l).as("level"), $"n_blocks", $"energy")
    }.reduce(_ unionAll _)
    val wTot = Window.partitionBy($"event_type")
    levels
      .select($"event_type", $"level", $"n_blocks", $"energy",
        when(sum($"energy").over(wTot) > 0,
          $"energy".cast("double") / sum($"energy").over(wTot).cast("double"))
          .otherwise(lit(0.0)).as("energy_share"))
      .orderBy($"event_type", $"level")
  }

  val qEventHaarEnergySql: String = {
    val levelArms = (1 to haarLevels).map { l =>
      val block = 1L << l
      val half = 1L << (l - 1)
      s"""SELECT event_type, $l AS level, count(*) AS n_blocks,
         |  CAST(sum(d * d) AS BIGINT) AS energy
         |FROM (
         |  SELECT event_type, di // $block AS blk,
         |    CAST(sum(CASE WHEN (di // $half) % 2 = 0 THEN xc ELSE -xc END)
         |      AS BIGINT) AS d
         |  FROM idx GROUP BY event_type, blk)
         |GROUP BY event_type""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH daily AS (
       |  SELECT event_type,
       |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dn,
       |    CAST(floor(sum(CAST(value AS DECIMAL(18,4))) * 100) AS BIGINT) AS xc
       |  FROM events GROUP BY event_type, dn
       |),
       |span AS (SELECT min(dn) AS d0 FROM daily),
       |idx AS (
       |  SELECT event_type, dn - d0 AS di, xc FROM daily CROSS JOIN span
       |),
       |levels AS (
       |$levelArms
       |)
       |SELECT event_type, level, n_blocks, energy,
       |  CASE WHEN sum(energy) OVER (PARTITION BY event_type) > 0
       |    THEN CAST(energy AS DOUBLE) /
       |      CAST(sum(energy) OVER (PARTITION BY event_type) AS DOUBLE)
       |    ELSE CAST(0.0 AS DOUBLE) END AS energy_share
       |FROM levels
       |ORDER BY event_type, level""".stripMargin
  }

  // ------------------------------------------------------------------
  // Granger causality: does one series' past improve another's forecast?
  // ------------------------------------------------------------------

  /** F threshold for the one-extra-regressor Granger test (≈ the 5%
    * critical value of F(1, n−3) at the daily-series lengths here).
    * Literal RHS `final` per the init-cycle rule.
    */
  final val grangerF05 = 4.0

  /** PAIRWISE GRANGER CAUSALITY over daily value series — for every
    * ordered type pair (cause → effect), does ADDING the cause's
    * lag-1 value to the effect's own lag-1 autoregression reduce
    * residual variance? [[qEventCrossCorr]] measures raw lead-lag
    * correlation; Granger is the CONDITIONAL version — "does A's past
    * tell me anything A-independent of B's own past?" — the standard
    * screen before believing a lead-lag story. Reported as restricted
    * vs unrestricted R² and the F(1, n−3) statistic with the
    * [[grangerF05]] decision.
    *
    * Exactness: daily totals are exact BIGINT cents; all ten raw
    * moments accumulate as exact BIGINTs and the n-scaled centered
    * moments C_ab = n·Σab − Σa·Σb are exact BIGINTs (int64-safe to
    * ~10⁷-cent days × 10³ days; widen past that); the R²/F closing
    * formulas then evaluate ONE fixed-shape double expression over
    * those exact integers — identical IEEE results in both engines.
    * Pairs whose moment matrix is not positive definite (constant
    * series, collinear lags) are excluded rather than divided by zero.
    *
    * Scale (100 TB): the corpus collapses once to |types|×|days|; the
    * calendar alignment is two equi-joins on (type, day) and one
    * day-keyed cross over cause types — |days|·|types|² rows, metadata-
    * sized; the moment rollup is |types|² rows.
    */
  def qEventGranger(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .groupBy($"event_type",
        datediff(to_date($"ts"), lit("1970-01-01")).cast("long").as("dn"))
      .agg(floor(sum(dec($"value")) * 100).cast("long").as("xc"))
    val eff = daily.select($"event_type".as("eff"), $"dn", $"xc".as("y"))
    val effLag = daily.select($"event_type".as("eff"), ($"dn" + 1).as("dn"),
      $"xc".as("z"))
    val causeLag = daily.select($"event_type".as("cause"), ($"dn" + 1).as("dn"),
      $"xc".as("x"))
    val triples = eff
      .join(effLag, Seq("eff", "dn"))
      .join(causeLag, "dn")
      .filter($"cause" =!= $"eff")
    val m = triples.groupBy($"cause", $"eff")
      .agg(count(lit(1)).as("n"),
        sum($"y").as("sy"), sum($"x").as("sx"), sum($"z").as("sz"),
        sum($"y" * $"x").as("syx"), sum($"y" * $"z").as("syz"),
        sum($"x" * $"z").as("sxz"), sum($"y" * $"y").as("syy"),
        sum($"x" * $"x").as("sxx"), sum($"z" * $"z").as("szz"))
      .select($"cause", $"eff", $"n",
        ($"n" * $"syx" - $"sy" * $"sx").as("cyx"),
        ($"n" * $"syz" - $"sy" * $"sz").as("cyz"),
        ($"n" * $"sxz" - $"sx" * $"sz").as("cxz"),
        ($"n" * $"syy" - $"sy" * $"sy").as("cyy"),
        ($"n" * $"sxx" - $"sx" * $"sx").as("cxx"),
        ($"n" * $"szz" - $"sz" * $"sz").as("czz"))
      .filter($"n" >= 4 && $"cyy" > 0 && $"cxx" > 0 && $"czz" > 0 &&
        // positive-definite check in the SAME double algebra as the r²
        // denominator (a BIGINT product here would overflow ANSI int64 at
        // the n-scaled moment magnitudes; the double compare is identical
        // in both engines)
        ($"cxx".cast("double") * $"czz".cast("double")) -
          ($"cxz".cast("double") * $"cxz".cast("double")) > 0.0)
    val r2r = ($"cyz".cast("double") * $"cyz".cast("double")) /
      ($"cyy".cast("double") * $"czz".cast("double"))
    val r2u = (($"czz".cast("double") * ($"cyx".cast("double") * $"cyx".cast("double"))) -
      (lit(2.0) * ($"cxz".cast("double") * ($"cyx".cast("double") * $"cyz".cast("double")))) +
      ($"cxx".cast("double") * ($"cyz".cast("double") * $"cyz".cast("double")))) /
      ($"cyy".cast("double") *
        (($"cxx".cast("double") * $"czz".cast("double")) -
          ($"cxz".cast("double") * $"cxz".cast("double"))))
    m
      .select($"cause", $"eff", $"n", r2r.as("r2_restricted"), r2u.as("r2_unrestricted"))
      .filter($"r2_unrestricted" < 1.0)
      .select($"cause", $"eff", $"n", $"r2_restricted", $"r2_unrestricted",
        ((($"r2_unrestricted" - $"r2_restricted") / (lit(1.0) - $"r2_unrestricted")) *
          ($"n" - 3).cast("double")).as("f_stat"))
      .withColumn("granger", $"f_stat" > grangerF05)
      .orderBy($"cause", $"eff")
  }

  val qEventGrangerSql: String = {
    val r2r = "(CAST(cyz AS DOUBLE) * CAST(cyz AS DOUBLE)) / " +
      "(CAST(cyy AS DOUBLE) * CAST(czz AS DOUBLE))"
    val r2u =
      """((CAST(czz AS DOUBLE) * (CAST(cyx AS DOUBLE) * CAST(cyx AS DOUBLE))) -
        |    (2.0 * (CAST(cxz AS DOUBLE) * (CAST(cyx AS DOUBLE) * CAST(cyz AS DOUBLE)))) +
        |    (CAST(cxx AS DOUBLE) * (CAST(cyz AS DOUBLE) * CAST(cyz AS DOUBLE)))) /
        |   (CAST(cyy AS DOUBLE) *
        |     ((CAST(cxx AS DOUBLE) * CAST(czz AS DOUBLE)) -
        |       (CAST(cxz AS DOUBLE) * CAST(cxz AS DOUBLE))))""".stripMargin
    s"""WITH daily AS (
       |  SELECT event_type,
       |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dn,
       |    CAST(floor(sum(CAST(value AS DECIMAL(18,4))) * 100) AS BIGINT) AS xc
       |  FROM events GROUP BY event_type, dn
       |),
       |triples AS (
       |  SELECT c.event_type AS cause, e.event_type AS eff,
       |    e.xc AS y, c.xc AS x, z.xc AS z
       |  FROM daily e
       |  JOIN daily z ON z.event_type = e.event_type AND z.dn = e.dn - 1
       |  JOIN daily c ON c.dn = e.dn - 1 AND c.event_type <> e.event_type
       |),
       |m AS (
       |  SELECT cause, eff, count(*) AS n,
       |    CAST(count(*) * sum(y * x) - sum(y) * sum(x) AS BIGINT) AS cyx,
       |    CAST(count(*) * sum(y * z) - sum(y) * sum(z) AS BIGINT) AS cyz,
       |    CAST(count(*) * sum(x * z) - sum(x) * sum(z) AS BIGINT) AS cxz,
       |    CAST(count(*) * sum(y * y) - sum(y) * sum(y) AS BIGINT) AS cyy,
       |    CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT) AS cxx,
       |    CAST(count(*) * sum(z * z) - sum(z) * sum(z) AS BIGINT) AS czz
       |  FROM triples GROUP BY cause, eff
       |  HAVING count(*) >= 4 AND
       |    count(*) * sum(y * y) - sum(y) * sum(y) > 0 AND
       |    count(*) * sum(x * x) - sum(x) * sum(x) > 0 AND
       |    count(*) * sum(z * z) - sum(z) * sum(z) > 0
       |),
       |scored AS (
       |  SELECT cause, eff, n, $r2r AS r2_restricted, $r2u AS r2_unrestricted
       |  FROM m
       |  WHERE (CAST(cxx AS DOUBLE) * CAST(czz AS DOUBLE)) -
       |    (CAST(cxz AS DOUBLE) * CAST(cxz AS DOUBLE)) > 0.0
       |)
       |SELECT cause, eff, n, r2_restricted, r2_unrestricted,
       |  ((r2_unrestricted - r2_restricted) / (1.0 - r2_unrestricted)) *
       |    CAST(n - 3 AS DOUBLE) AS f_stat,
       |  ((r2_unrestricted - r2_restricted) / (1.0 - r2_unrestricted)) *
       |    CAST(n - 3 AS DOUBLE) > $grangerF05 AS granger
       |FROM scored
       |WHERE r2_unrestricted < 1.0
       |ORDER BY cause, eff""".stripMargin
  }

  // ------------------------------------------------------------------
  // Mann-Whitney U: rank-sum location-shift test (tie-corrected)
  // ------------------------------------------------------------------

  /** MANN-WHITNEY U rank-sum test per event type — the location-shift
    * companion to [[qEventKsDrift]]: over the same day-span midpoint
    * split, ranks the pooled values and asks whether one period's
    * values are SYSTEMATICALLY larger (KS reacts to any CDF difference;
    * U is the sharper test when the alternative is "the level moved").
    * Normal approximation with the FULL tie correction — event values
    * repeat heavily at 4 decimals, and the uncorrected variance
    * overstates σ and hides real shifts.
    *
    * Exactness: ranks never exist as fractions — DOUBLED midranks
    * 2·rank(v) = 2·(# strictly smaller) + (t_v + 1) are exact BIGINTs
    * off one cumulative window over the distinct-value frame; 2R₁ and
    * 2U₁ = 2n₁n₂ + n₁(n₁+1) − 2R₁ stay integers; the tie term
    * Σ(t³ − t) is an exact BIGINT aggregate (int64-safe to n ~ 2·10⁶
    * per type; past that widen the cubes). The closing
    * z = (U₁ − n₁n₂/2)/σ evaluates one fixed-shape double expression
    * over those exact integers.
    *
    * Scale (100 TB): identical shape to the KS scan — one (type, value)
    * pre-aggregate (map-side combined), one type-partitioned window
    * over distinct values, |types|-row rollup.
    */
  def qEventMannWhitney(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select($"event_type",
        datediff(to_date($"ts"), lit("1970-01-01")).cast("long").as("dn"),
        (dec($"value") * 10000).cast("long").as("v4"))
    val span = ev.agg(min($"dn").as("d0"), max($"dn").as("d1"))
      .select(($"d0" + expr("(d1 - d0 + 1) div 2")).as("d_mid"))
    val perValue = ev.crossJoin(broadcast(span))
      .groupBy($"event_type", $"v4")
      .agg(sum(when($"dn" < $"d_mid", 1L).otherwise(0L)).as("a1"),
        sum(when($"dn" < $"d_mid", 0L).otherwise(1L)).as("a2"))
      .withColumn("t", $"a1" + $"a2")
    val w = Window.partitionBy($"event_type").orderBy($"v4")
      .rowsBetween(Window.unboundedPreceding, 0)
    val ranked = perValue
      .select($"event_type", $"a1", $"a2", $"t",
        (lit(2L) * (sum($"t").over(w) - $"t") + ($"t" + 1L)).as("rank2"))
    val agg = ranked.groupBy($"event_type")
      .agg(sum($"a1").as("n1"), sum($"a2").as("n2"),
        sum($"a1" * $"rank2").as("r2sum"),
        sum($"t" * $"t" * $"t" - $"t").as("ties3"))
      .filter($"n1" > 0 && $"n2" > 0)
      .withColumn("n", $"n1" + $"n2")
      .withColumn("u2",
        lit(2L) * $"n1" * $"n2" + $"n1" * ($"n1" + 1L) - $"r2sum")
    val sigma = sqrt(
      (($"n1".cast("double") * $"n2".cast("double")) *
        ((($"n".cast("double") * $"n".cast("double") * $"n".cast("double")) -
          $"n".cast("double")) - $"ties3".cast("double"))) /
        (lit(12.0) * $"n".cast("double") * ($"n".cast("double") - 1.0)))
    val z = (($"u2".cast("double") - $"n1".cast("double") * $"n2".cast("double")) /
      2.0) / sigma
    agg
      .filter(sigma > 0.0)
      .select($"event_type", $"n1".as("n_ref"), $"n2".as("n_cur"),
        $"u2".as("u1_doubled"), $"ties3".as("tie_term"),
        z.as("z_stat"), (abs(z) > 1.96).as("shifted"))
      .orderBy($"event_type")
  }

  val qEventMannWhitneySql: String = {
    val sigma =
      """sqrt(((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) *
        |      (((CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) -
        |        CAST(n AS DOUBLE)) - CAST(ties3 AS DOUBLE))) /
        |     (12.0 * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))""".stripMargin
    val z = s"((CAST(u2 AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) / 2.0) / $sigma"
    s"""WITH ev AS (
       |  SELECT event_type,
       |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dn,
       |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v4
       |  FROM events
       |),
       |span AS (SELECT min(dn) + (max(dn) - min(dn) + 1) // 2 AS d_mid FROM ev),
       |per_value AS (
       |  SELECT event_type, v4,
       |    CAST(sum(CASE WHEN dn < d_mid THEN 1 ELSE 0 END) AS BIGINT) AS a1,
       |    CAST(sum(CASE WHEN dn < d_mid THEN 0 ELSE 1 END) AS BIGINT) AS a2,
       |    CAST(count(*) AS BIGINT) AS t
       |  FROM ev CROSS JOIN span
       |  GROUP BY event_type, v4
       |),
       |ranked AS (
       |  SELECT event_type, a1, a2, t,
       |    2 * (sum(t) OVER (PARTITION BY event_type ORDER BY v4
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t) +
       |      (t + 1) AS rank2
       |  FROM per_value
       |),
       |agg AS (
       |  SELECT event_type,
       |    CAST(sum(a1) AS BIGINT) AS n1, CAST(sum(a2) AS BIGINT) AS n2,
       |    CAST(sum(a1) + sum(a2) AS BIGINT) AS n,
       |    CAST(2 * sum(a1) * sum(a2) + sum(a1) * (sum(a1) + 1) -
       |      sum(a1 * rank2) AS BIGINT) AS u2,
       |    CAST(sum(t * t * t - t) AS BIGINT) AS ties3
       |  FROM ranked GROUP BY event_type
       |  HAVING sum(a1) > 0 AND sum(a2) > 0
       |)
       |SELECT event_type, n1 AS n_ref, n2 AS n_cur, u2 AS u1_doubled,
       |  ties3 AS tie_term, $z AS z_stat, abs($z) > 1.96 AS shifted
       |FROM agg
       |WHERE $sigma > 0.0
       |ORDER BY event_type""".stripMargin
  }

  // ------------------------------------------------------------------
  // CUSUM: the online sequential mean-shift detector
  // ------------------------------------------------------------------

  /** CUSUM slack as a fraction of the baseline mean (mean/20 = 5%) and
    * the alarm threshold as a multiple of the baseline mean (5×).
    * Literal RHS `final` per the init-cycle rule.
    */
  final val cusumSlackDiv = 20L
  final val cusumThreshMult = 5L

  /** ONE-SIDED CUSUM over daily event counts — the ONLINE sequential
    * detector that completes the monitoring triptych: [[qEventSpc]]
    * flags pointwise/runs violations, [[qEventChangepoint]] finds the
    * largest shift retrospectively; CUSUM accumulates small persistent
    * upward drift S_t = max(0, S_{t−1} + (x_t − μ − slack)) and alarms
    * the FIRST day the statistic crosses the threshold — the detector
    * with the shortest average run length to a real sustained shift,
    * which is why industrial monitoring runs it next to the Shewhart
    * chart. Baseline μ from the first 6/10 of the day span (the SPC
    * split); slack = μ/[[cusumSlackDiv]]; alarm at
    * S_t > [[cusumThreshMult]]·μ.
    *
    * Exactness: the recursion runs in nb·[[cusumSlackDiv]]-SCALED
    * INTEGERS — per-day increment d_t = 20·nb·x_t − 21·S (exact
    * BIGINTs; μ and the 5% slack never exist as doubles) — and the
    * recursive max(0, ·) fold is ELIMINATED via the classical
    * prefix-minimum identity S_t = P_t − min_{0≤j≤t} P_j (P = running
    * sum of d): two cumulative windows replace sequential state, every
    * value stays an exact BIGINT, and the alarm compare
    * S_t > 100·nb·μ_scaled ≡ S_t > 100·S is integer. Int64-safe to
    * ~10⁸ events/day/type over ~10³ monitor days; widen past that.
    *
    * Scale (100 TB): the corpus collapses to |types|×|days| once; the
    * prefix windows partition by type over that metadata-sized daily
    * frame — no per-key array state at all (the window form
    * distributes where a collect-and-fold would hold each key's whole
    * history in one row).
    */
  def qEventCusum(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .groupBy($"event_type",
        datediff(to_date($"ts"), lit("1970-01-01")).cast("long").as("dn"))
      .agg(count(lit(1)).as("x"))
    val span = daily.agg(min($"dn").as("d0"), max($"dn").as("d1"))
      .select(($"d0" + expr(
        s"((d1 - d0 + 1) * $spcBaseNum) div $spcBaseDen")).as("d_cut"))
    val cut = daily.crossJoin(broadcast(span))
    val base = cut.filter($"dn" < $"d_cut")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("nb"), sum($"x").as("s"))
      .filter($"nb" >= 1 && $"s" > 0)
    // d_t = 20·nb·x − 21·S  (x − μ − μ/20, scaled by 20·nb); threshold 100·S.
    // S_t = max(0, S_{t−1} + d_t) unrolls to P_t − min(0, min_{j≤t} P_j).
    val wCum = Window.partitionBy($"event_type").orderBy($"dn")
      .rowsBetween(Window.unboundedPreceding, 0)
    val st = cut.filter($"dn" >= $"d_cut")
      .join(broadcast(base), "event_type")
      .select($"event_type", $"dn", $"s",
        (lit(cusumSlackDiv) * $"nb" * $"x" -
          lit(cusumSlackDiv + 1) * $"s").as("d"))
      .select($"event_type", $"dn", $"s", sum($"d").over(wCum).as("p"))
      .select($"event_type", $"dn", $"s",
        ($"p" - least(lit(0L), min($"p").over(wCum))).as("s_t"))
    st.groupBy($"event_type")
      .agg(count(lit(1)).as("n_mon"), max($"s_t").as("peak_scaled"),
        coalesce(min(when($"s_t" > lit(cusumThreshMult * cusumSlackDiv) * $"s",
          $"dn")), lit(-1L)).as("alarm_day"))
      .select($"event_type", $"n_mon", $"peak_scaled", $"alarm_day",
        ($"alarm_day" >= 0).as("alarmed"))
      .orderBy($"event_type")
  }

  val qEventCusumSql: String =
    s"""WITH daily AS (
       |  SELECT event_type,
       |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dn,
       |    CAST(count(*) AS BIGINT) AS x
       |  FROM events GROUP BY event_type, dn
       |),
       |span AS (
       |  SELECT min(dn) + ((max(dn) - min(dn) + 1) * $spcBaseNum) // $spcBaseDen
       |    AS d_cut FROM daily
       |),
       |base AS (
       |  SELECT event_type, count(*) AS nb, CAST(sum(x) AS BIGINT) AS s
       |  FROM daily CROSS JOIN span WHERE dn < d_cut
       |  GROUP BY event_type HAVING count(*) >= 1 AND sum(x) > 0
       |),
       |mon AS (
       |  SELECT daily.event_type, dn, s,
       |    $cusumSlackDiv * nb * x - ${cusumSlackDiv + 1} * s AS d
       |  FROM daily CROSS JOIN span
       |  JOIN base ON base.event_type = daily.event_type
       |  WHERE dn >= d_cut
       |),
       |prefixed AS (
       |  SELECT event_type, dn, s,
       |    sum(d) OVER (PARTITION BY event_type ORDER BY dn
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
       |  FROM mon
       |),
       |st AS (
       |  SELECT event_type, dn, s,
       |    p - least(0, min(p) OVER (PARTITION BY event_type ORDER BY dn
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s_t
       |  FROM prefixed
       |)
       |SELECT event_type, count(*) AS n_mon,
       |  CAST(max(s_t) AS BIGINT) AS peak_scaled,
       |  CAST(coalesce(min(CASE WHEN s_t > ${cusumThreshMult * cusumSlackDiv} * s
       |    THEN dn END), -1) AS BIGINT) AS alarm_day,
       |  coalesce(min(CASE WHEN s_t > ${cusumThreshMult * cusumSlackDiv} * s
       |    THEN dn END), -1) >= 0 AS alarmed
       |FROM st
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------------
  // Hurst exponent: rescaled-range long-memory estimate
  // ------------------------------------------------------------------

  /** R/S window sizes (octaves 4..16 observed days — the smallest SF
    * ships 30 observed days per type, so 16 is the largest full block
    * everywhere). Kept as a Seq for
    * iteration; every use below interpolates the literal ints into plan
    * constants (the [[graft.ext.Similarity.sweepNprobes]] precedent —
    * never referenced from a top-level SQL val's initializer).
    */
  final val hurstNs: Seq[Int] = Seq(4, 8, 16)

  /** floor(ln 2 · 10⁶): the octave divisor of the quantized-log Hurst
    * slope. Literal RHS `final` per the init-cycle rule.
    */
  final val ln2Micro = 693147L

  /** HURST EXPONENT by rescaled-range analysis (Hurst/Mandelbrot) of
    * each event type's daily value series — the LONG-MEMORY diagnostic
    * the monitoring family still lacks: H ≈ 0.5 says increments are
    * memoryless (yesterday tells you nothing), H → 1 says persistent
    * trends (overshoots compound — smooth aggressively), H < 0.5 says
    * mean-reverting. Method: for window n ∈ 4,8,16 observed days,
    * split the series into full n-day blocks, compute the range of
    * cumulative deviations from the block mean over the block's own
    * standard deviation (R/S), average per window size, and estimate H
    * as the log₂-slope across the extreme octaves
    * (qlog(RS₁₆) − qlog(RS₄)) / (2·ln2).
    *
    * Exactness: the cumulative-deviation path is kept in n-SCALED
    * integers — W_t = n·P_t − t·S_b (P = in-block prefix sum, S_b =
    * block sum, anchor W₀ = 0) — so the range max W − min W (clamped
    * through 0) is an exact BIGINT; R/S = R_scaled/√(n·Q_b − S_b²) and
    * the per-(type, n) mean is a block-ordered sequential fold;
    * constant blocks are dropped (ANSI guard). The closing slope uses
    * [[graft.ext.TextOps.logScale]]-style micro-nat quantized logs of
    * the two mean R/S doubles over the exact [[ln2Micro]] divisor.
    *
    * Scale (100 TB): the corpus collapses once to |types|×|days|; each
    * window size is two windows + one block aggregate over that
    * metadata-sized frame, unioned across 4 sizes; the fold arrays are
    * blocks-per-type bounded.
    */
  def qEventHurst(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .groupBy($"event_type",
        datediff(to_date($"ts"), lit("1970-01-01")).cast("long").as("dn"))
      .agg(floor(sum(dec($"value")) * 100).cast("long").as("xc"))
      .withColumn("rn",
        row_number().over(Window.partitionBy($"event_type").orderBy($"dn")) - 1)
    val arms = hurstNs.map { n =>
      val wCumB = Window.partitionBy($"event_type", $"blk").orderBy($"dn")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wBlk = Window.partitionBy($"event_type", $"blk")
      val blocks = daily
        .withColumn("blk", expr(s"rn div $n"))
        .select($"event_type", $"blk", $"dn", $"xc",
          (($"rn" % n) + 1).as("t"))
        .select($"event_type", $"blk", $"dn", $"xc", $"t",
          sum($"xc").over(wCumB).as("p"),
          sum($"xc").over(wBlk).as("sb"),
          sum($"xc" * $"xc").over(wBlk).as("qb"),
          count(lit(1)).over(wBlk).as("cnt"))
        .filter($"cnt" === n)
        .select($"event_type", $"blk", $"sb", $"qb",
          (lit(n.toLong) * $"p" - $"t" * $"sb").as("w"))
        .groupBy($"event_type", $"blk")
        .agg(max($"w").as("wmax"), min($"w").as("wmin"),
          max($"sb").as("sb"), max($"qb").as("qb"))
        .filter(lit(n.toLong) * $"qb" - $"sb" * $"sb" > 0)
        .select($"event_type", $"blk",
          ((greatest(lit(0L), $"wmax") - least(lit(0L), $"wmin")).cast("double") /
            sqrt((lit(n.toLong) * $"qb" - $"sb" * $"sb").cast("double"))).as("rs"))
      blocks.groupBy($"event_type")
        .agg(count(lit(1)).as("n_blocks"),
          (expr("aggregate(array_sort(collect_list(struct(blk, rs)))," +
            " cast(0 as double), (acc, e) -> acc + e.rs)") / count(lit(1)))
            .as("mean_rs"))
        .select($"event_type", lit(n).as("n"), $"n_blocks", $"mean_rs")
    }.reduce(_ unionAll _)
    val wide = arms.groupBy($"event_type")
      .agg(count(lit(1)).as("n_sizes"),
        max(when($"n" === 4, $"mean_rs")).as("rs_4"),
        max(when($"n" === 8, $"mean_rs")).as("rs_8"),
        max(when($"n" === 16, $"mean_rs")).as("rs_16"))
      .filter($"n_sizes" === hurstNs.length)
    wide
      .select($"event_type", $"rs_4", $"rs_8", $"rs_16",
        ((floor(log($"rs_16") * 1000000L).cast("long") -
          floor(log($"rs_4") * 1000000L).cast("long")).cast("double") /
          lit(2L * ln2Micro).cast("double")).as("hurst"))
      .orderBy($"event_type")
  }

  val qEventHurstSql: String = {
    val arms = hurstNs.map { n =>
      s"""SELECT event_type, $n AS n, count(*) AS n_blocks,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(rs ORDER BY blk)),
         |    (a, b) -> a + b) / count(*) AS mean_rs
         |FROM (
         |  SELECT event_type, blk,
         |    CAST(greatest(0, max($n * p - t * sb)) -
         |         least(0, min($n * p - t * sb)) AS DOUBLE) /
         |      sqrt(CAST($n * max(qb) - max(sb) * max(sb) AS DOUBLE)) AS rs
         |  FROM (
         |    SELECT event_type, rn // $n AS blk, dn, xc, (rn % $n) + 1 AS t,
         |      sum(xc) OVER (PARTITION BY event_type, rn // $n ORDER BY dn
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
         |      sum(xc) OVER (PARTITION BY event_type, rn // $n) AS sb,
         |      sum(xc * xc) OVER (PARTITION BY event_type, rn // $n) AS qb,
         |      count(*) OVER (PARTITION BY event_type, rn // $n) AS cnt
         |    FROM daily) win
         |  WHERE cnt = $n
         |  GROUP BY event_type, blk
         |  HAVING $n * max(qb) - max(sb) * max(sb) > 0) blocks
         |GROUP BY event_type""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH daily AS (
       |  SELECT event_type, dn, xc,
       |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY dn) - 1
       |      AS BIGINT) AS rn
       |  FROM (
       |    SELECT event_type,
       |      CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dn,
       |      CAST(floor(sum(CAST(value AS DECIMAL(18,4))) * 100) AS BIGINT) AS xc
       |    FROM events GROUP BY event_type, dn)
       |),
       |arms AS (
       |$arms
       |),
       |wide AS (
       |  SELECT event_type, count(*) AS n_sizes,
       |    max(CASE WHEN n = 4 THEN mean_rs END) AS rs_4,
       |    max(CASE WHEN n = 8 THEN mean_rs END) AS rs_8,
       |    max(CASE WHEN n = 16 THEN mean_rs END) AS rs_16
       |  FROM arms GROUP BY event_type
       |  HAVING count(*) = ${hurstNs.length}
       |)
       |SELECT event_type, rs_4, rs_8, rs_16,
       |  CAST(CAST(floor(ln(rs_16) * 1000000) AS BIGINT) -
       |       CAST(floor(ln(rs_4) * 1000000) AS BIGINT) AS DOUBLE) /
       |    CAST(${2L * ln2Micro} AS DOUBLE) AS hurst
       |FROM wide
       |ORDER BY event_type""".stripMargin
  }

  // ------------------------------------------------------------------
  // Maximum drawdown: worst peak-to-trough slide of the running total
  // ------------------------------------------------------------------

  /** MAXIMUM DRAWDOWN of each event type's cumulative daily net value —
    * the risk statistic ported from finance that every capacity/revenue
    * dashboard eventually reinvents: over the running total P_t, the
    * drawdown at t is (max_{j≤t} P_j) − P_t, and the maximum drawdown
    * is the worst peak-to-trough slide the series ever took. Where
    * [[qEventCusum]] alarms on persistent UPWARD drift against a
    * baseline, drawdown quantifies the deepest sustained LOSS run —
    * "how far under its own high-water mark did this stream get, and
    * when" — with the trough day and the high-water mark emitted for
    * the post-mortem.
    *
    * Exactness: PURE BIGINT cents end to end — prefix sums, running
    * max, their difference, and the (drawdown DESC, day ASC) argmax via
    * one more window; the relative depth is the single closing
    * division.
    *
    * Scale (100 TB): the corpus collapses once to |types|×|days|; two
    * cumulative windows and one ranked pick over that metadata-sized
    * frame.
    */
  def qEventDrawdown(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .groupBy($"event_type",
        datediff(to_date($"ts"), lit("1970-01-01")).cast("long").as("dn"))
      .agg(floor(sum(dec($"value")) * 100).cast("long").as("xc"))
    val wCum = Window.partitionBy($"event_type").orderBy($"dn")
      .rowsBetween(Window.unboundedPreceding, 0)
    val dd = daily
      .select($"event_type", $"dn", sum($"xc").over(wCum).as("p"))
      .select($"event_type", $"dn", $"p", max($"p").over(wCum).as("hwm"))
      .select($"event_type", $"dn", $"p", $"hwm", ($"hwm" - $"p").as("dd"))
    val wPick = Window.partitionBy($"event_type")
      .orderBy($"dd".desc, $"dn")
    dd
      .withColumn("rk", row_number().over(wPick))
      .filter($"rk" === 1)
      .filter($"hwm" > 0)
      .select($"event_type", $"dn".as("trough_day"),
        $"hwm".as("high_water_cents"), $"p".as("trough_total_cents"),
        $"dd".as("max_drawdown_cents"),
        ($"dd".cast("double") / $"hwm".cast("double")).as("drawdown_frac"))
      .orderBy($"event_type")
  }

  val qEventDrawdownSql: String =
    """WITH daily AS (
      |  SELECT event_type,
      |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dn,
      |    CAST(floor(sum(CAST(value AS DECIMAL(18,4))) * 100) AS BIGINT) AS xc
      |  FROM events GROUP BY event_type, dn
      |),
      |cum AS (
      |  SELECT event_type, dn,
      |    sum(xc) OVER (PARTITION BY event_type ORDER BY dn
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
      |  FROM daily
      |),
      |dd AS (
      |  SELECT event_type, dn, p,
      |    max(p) OVER (PARTITION BY event_type ORDER BY dn
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hwm
      |  FROM cum
      |),
      |picked AS (
      |  SELECT event_type, dn, p, hwm, hwm - p AS dd,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY hwm - p DESC, dn) AS rk
      |  FROM dd
      |)
      |SELECT event_type, dn AS trough_day, CAST(hwm AS BIGINT) AS high_water_cents,
      |  CAST(p AS BIGINT) AS trough_total_cents,
      |  CAST(dd AS BIGINT) AS max_drawdown_cents,
      |  CAST(dd AS DOUBLE) / CAST(hwm AS DOUBLE) AS drawdown_frac
      |FROM picked
      |WHERE rk = 1 AND hwm > 0
      |ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------------
  // Jensen-Shannon distance between hour-of-day behavior profiles
  // ------------------------------------------------------------------

  /** JENSEN-SHANNON DIVERGENCE between event types' HOUR-OF-DAY
    * profiles — "which event types share a daily rhythm": each type's
    * 24-bin hour histogram is a behavioral fingerprint, and the
    * symmetric, bounded (≤ ln 2) JSD between fingerprints says whether
    * two streams are driven by the same population/scheduler. Near-zero
    * pairs are candidates for shared capacity planning and shared
    * anomaly baselines; the full pair matrix is emitted. The
    * distributional-distance sibling of the doc-side KL drift audit,
    * at type-pair grain.
    *
    * Exactness: with counts c₁ₕ, c₂ₕ and totals N₁, N₂ the log ratios
    * reduce to integer arguments — ln(pₕ/mₕ) =
    * qlog(2·c₁ₕ·N₂) − qlog(c₁ₕ·N₂ + c₂ₕ·N₁) — so each arm accumulates
    * Σₕ c₁ₕ·Δqlog as an EXACT BIGINT (24 bins; zero bins contribute
    * zero by CASE, the 0·ln0 = 0 convention); the two divisions by
    * N₁, N₂ and the /2 close the value. Int64-safe while c·N < 2⁶³
    * (~3·10⁹ events per side); past that widen the products.
    *
    * Scale (100 TB): the corpus collapses to |types|×24 rows in one
    * partially-aggregated shuffle; the pair matrix is |types|²/2 rows
    * of pure metadata arithmetic.
    */
  def qEventProfileJsd(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val prof = Tables.events(spark, sfDir)
      .groupBy($"event_type", hour($"ts").cast("long").as("h"))
      .agg(count(lit(1)).as("c"))
    val tot = prof.groupBy($"event_type").agg(sum($"c").as("n"))
    val a = prof.join(tot, "event_type")
      .select($"event_type".as("ta"), $"h", $"c".as("c1"), $"n".as("n1"))
    val b = prof.join(tot, "event_type")
      .select($"event_type".as("tb"), $"h".as("hb"), $"c".as("c2"), $"n".as("n2"))
    // FULL per-pair hour grid: a bin present in one profile and absent in
    // the other still contributes — outer-join the two hour sets per pair
    val pairsT = tot.select($"event_type".as("ta"), $"n".as("n1"))
      .join(tot.select($"event_type".as("tb"), $"n".as("n2")), $"ta" < $"tb")
    val hours = spark.range(0, 24).select($"id".as("h"))
    val grid = pairsT.crossJoin(broadcast(hours))
      .join(a, Seq("ta", "h", "n1"), "left")
      .join(b.withColumnRenamed("hb", "h"), Seq("tb", "h", "n2"), "left")
      .select($"ta", $"tb", $"n1", $"n2",
        coalesce($"c1", lit(0L)).as("c1"), coalesce($"c2", lit(0L)).as("c2"))
    def qlogDiff(num: Column, den: Column): Column =
      floor(log(num.cast("double")) * 1000000L).cast("long") -
        floor(log(den.cast("double")) * 1000000L).cast("long")
    val terms = grid
      .select($"ta", $"tb", $"n1", $"n2",
        when($"c1" > 0,
          $"c1" * qlogDiff(lit(2L) * $"c1" * $"n2", $"c1" * $"n2" + $"c2" * $"n1"))
          .otherwise(lit(0L)).as("t1"),
        when($"c2" > 0,
          $"c2" * qlogDiff(lit(2L) * $"c2" * $"n1", $"c1" * $"n2" + $"c2" * $"n1"))
          .otherwise(lit(0L)).as("t2"))
      .groupBy($"ta", $"tb")
      .agg(max($"n1").as("n1"), max($"n2").as("n2"),
        sum($"t1").as("s1"), sum($"t2").as("s2"))
    terms
      .select($"ta", $"tb", $"n1", $"n2",
        (($"s1".cast("double") / $"n1".cast("double") +
          $"s2".cast("double") / $"n2".cast("double")) / 2.0 / 1000000.0)
          .as("jsd_nats"))
      .orderBy($"ta", $"tb")
  }

  val qEventProfileJsdSql: String = {
    def qlogDiff(num: String, den: String): String =
      s"(CAST(floor(ln(CAST($num AS DOUBLE)) * 1000000) AS BIGINT) - " +
        s"CAST(floor(ln(CAST($den AS DOUBLE)) * 1000000) AS BIGINT))"
    s"""WITH prof AS (
       |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS h, count(*) AS c
       |  FROM events GROUP BY event_type, h
       |),
       |tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM prof GROUP BY event_type),
       |pairs AS (
       |  SELECT a.event_type AS ta, b.event_type AS tb, a.n AS n1, b.n AS n2
       |  FROM tot a JOIN tot b ON a.event_type < b.event_type
       |),
       |grid AS (
       |  SELECT ta, tb, n1, n2, hh.h AS h,
       |    coalesce(pa.c, 0) AS c1, coalesce(pb.c, 0) AS c2
       |  FROM pairs
       |  CROSS JOIN (SELECT unnest(range(24)) AS h) hh
       |  LEFT JOIN prof pa ON pa.event_type = ta AND pa.h = hh.h
       |  LEFT JOIN prof pb ON pb.event_type = tb AND pb.h = hh.h
       |),
       |terms AS (
       |  SELECT ta, tb, max(n1) AS n1, max(n2) AS n2,
       |    CAST(sum(CASE WHEN c1 > 0 THEN
       |      c1 * ${qlogDiff("2 * c1 * n2", "c1 * n2 + c2 * n1")}
       |      ELSE 0 END) AS BIGINT) AS s1,
       |    CAST(sum(CASE WHEN c2 > 0 THEN
       |      c2 * ${qlogDiff("2 * c2 * n1", "c1 * n2 + c2 * n1")}
       |      ELSE 0 END) AS BIGINT) AS s2
       |  FROM grid GROUP BY ta, tb
       |)
       |SELECT ta, tb, n1, n2,
       |  (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) +
       |   CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) / 2.0 / 1000000.0 AS jsd_nats
       |FROM terms
       |ORDER BY ta, tb""".stripMargin
  }

  // ------------------------------------------------------------------
  // Markov stationary distribution vs the empirical event mix
  // ------------------------------------------------------------------

  /** Scaled-integer unit for the stationary-distribution iteration
    * (1.0 ≡ 10¹² per type, the [[graft.ext.Graph.rankScale]]
    * discipline). Literal RHS `final` per the init-cycle rule.
    */
  final val markovScale = 1000000000000L

  /** STATIONARY DISTRIBUTION of the per-user event-type Markov chain,
    * against the EMPIRICAL type mix — the model-consistency check that
    * completes the Markov family ([[qEventTransitions]] estimates the
    * matrix, [[qEventMarkovEval]] scores next-event prediction,
    * [[qEventEntropyRate]] its information rate): if user behavior
    * really is first-order Markov and time-homogeneous, the chain's
    * long-run occupancy π must match the observed type frequencies;
    * a type whose π/empirical ratio is far from 1 is where the
    * first-order model breaks (burst entry, non-stationary campaign,
    * absorbing funnel). π via three power-iteration steps of the
    * row-normalized count matrix from the uniform start.
    *
    * Exactness: transition counts are exact BIGINTs and the iteration
    * runs in [[markovScale]]-scaled integers — each step's mass
    * transfer is (π_a·n_ab) div n_a·, an exact floor division (the
    * [[graft.ext.Graph.pageRank]] discipline; floor leakage < |types|
    * units/round) — so π is bit-identical at any parallelism; the
    * shares and ratio are closing divisions.
    *
    * Scale (100 TB): the corpus collapses to the |types|² transition
    * matrix in one partially-aggregated shuffle (after the per-user
    * lead window); every iteration is metadata-sized joins with
    * per-round lineage truncation.
    */
  def qEventMarkovStationary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val paired = Tables.events(spark, sfDir)
      .select($"event_type".as("a"),
        lead($"event_type", 1).over(w).as("b"))
      .filter($"b".isNotNull)
    val trans = paired.groupBy($"a", $"b").agg(count(lit(1)).as("n"))
    val rowsum = trans.groupBy($"a").agg(sum($"n").as("na"))
    val t = trans.join(rowsum, "a").localCheckpoint(true)
    val types = rowsum.select($"a".as("event_type"))
    var pi = types.select($"event_type", lit(markovScale).as("pi"))
    var it = 0
    while (it < 3) {
      val inbox = t.join(pi.withColumnRenamed("event_type", "a"), "a")
        .select($"b".as("event_type"), expr("(pi * n) div na").as("c"))
        .groupBy($"event_type").agg(sum($"c").as("s"))
      pi = types.join(inbox, Seq("event_type"), "left")
        .select($"event_type", coalesce($"s", lit(0L)).as("pi"))
        .localCheckpoint(true)
      it += 1
    }
    val emp = Tables.events(spark, sfDir)
      .groupBy($"event_type").agg(count(lit(1)).as("n_emp"))
    val wAll = Window.partitionBy()
    pi.join(emp, "event_type")
      .select($"event_type", $"pi".as("pi_scaled"), $"n_emp",
        ($"pi".cast("double") / sum($"pi").over(wAll).cast("double"))
          .as("stationary_share"),
        ($"n_emp".cast("double") / sum($"n_emp").over(wAll).cast("double"))
          .as("empirical_share"))
      .withColumn("ratio",
        when($"empirical_share" > 0.0, $"stationary_share" / $"empirical_share")
          .otherwise(lit(0.0)))
      .orderBy($"event_type")
  }

  /** Oracle: the same three unrolled scaled-integer steps. */
  val qEventMarkovStationarySql: String = {
    def step(prev: String, out: String): String =
      s"""$out AS (
         |  SELECT ty.event_type,
         |    CAST(coalesce(m.s, 0) AS BIGINT) AS pi
         |  FROM types ty LEFT JOIN (
         |    SELECT t.b AS event_type, SUM((p.pi * t.n) // t.na) AS s
         |    FROM t JOIN $prev p ON p.event_type = t.a
         |    GROUP BY t.b) m ON m.event_type = ty.event_type)""".stripMargin
    s"""WITH paired AS (
       |  SELECT event_type AS a,
       |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |      AS b
       |  FROM events
       |),
       |trans AS (
       |  SELECT a, b, count(*) AS n FROM paired WHERE b IS NOT NULL GROUP BY a, b
       |),
       |rowsum AS (SELECT a, CAST(sum(n) AS BIGINT) AS na FROM trans GROUP BY a),
       |t AS (SELECT trans.a, b, n, na FROM trans JOIN rowsum ON rowsum.a = trans.a),
       |types AS (SELECT a AS event_type FROM rowsum),
       |p0 AS (SELECT event_type, CAST($markovScale AS BIGINT) AS pi FROM types),
       |${step("p0", "p1")},
       |${step("p1", "p2")},
       |${step("p2", "p3")},
       |emp AS (SELECT event_type, count(*) AS n_emp FROM events GROUP BY event_type)
       |SELECT p3.event_type, pi AS pi_scaled, n_emp,
       |  CAST(pi AS DOUBLE) / CAST(sum(pi) OVER () AS DOUBLE) AS stationary_share,
       |  CAST(n_emp AS DOUBLE) / CAST(sum(n_emp) OVER () AS DOUBLE)
       |    AS empirical_share,
       |  CASE WHEN CAST(n_emp AS DOUBLE) / CAST(sum(n_emp) OVER () AS DOUBLE) > 0.0
       |    THEN (CAST(pi AS DOUBLE) / CAST(sum(pi) OVER () AS DOUBLE)) /
       |         (CAST(n_emp AS DOUBLE) / CAST(sum(n_emp) OVER () AS DOUBLE))
       |    ELSE CAST(0.0 AS DOUBLE) END AS ratio
       |FROM p3 JOIN emp ON emp.event_type = p3.event_type
       |ORDER BY p3.event_type""".stripMargin
  }

  // ------------------------------------------------------------------
  // ARCH effect: volatility clustering via rank autocorrelation
  // ------------------------------------------------------------------

  /** VOLATILITY-CLUSTERING (ARCH-effect) screen per event type — do
    * large daily swings follow large swings? The Engle insight that
    * variance itself is autocorrelated even when the level is not:
    * compute squared calendar-adjacent daily changes s_t = (x_t −
    * x_{t−1})², then the LAG-1 SPEARMAN autocorrelation of the s
    * series. Rank-based for two reasons: squared-cent fourth moments
    * (Σs²) overflow int64 at any realistic magnitude, while doubled
    * midranks stay small exact integers; and ranks are robust to the
    * heavy tails squared changes always have. ρ > 2/√n says turbulence
    * clusters — smoothing/alerting should widen its bands after a
    * shock instead of treating each day as independent.
    *
    * Exactness: diffs and squares are exact BIGINTs; ranks are DOUBLED
    * midranks off one cumulative window over distinct s values (the
    * Mann-Whitney discipline); the Pearson-on-ranks closing formula
    * uses n-scaled centered BIGINT moments and one fixed-shape double
    * expression ([[qEventGranger]]'s shape).
    *
    * Scale (100 TB): the corpus collapses to |types|×|days|; two
    * calendar self-joins, one distinct-value window, and a |types|-row
    * moment rollup — all metadata-sized.
    */
  def qEventArchEffect(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .groupBy($"event_type",
        datediff(to_date($"ts"), lit("1970-01-01")).cast("long").as("dn"))
      .agg(floor(sum(dec($"value")) * 100).cast("long").as("xc"))
    val prev = daily.select($"event_type", ($"dn" + 1).as("dn"), $"xc".as("xp"))
    val sq = daily.join(prev, Seq("event_type", "dn"))
      .select($"event_type", $"dn",
        (($"xc" - $"xp") * ($"xc" - $"xp")).as("s"))
    val wCum = Window.partitionBy($"event_type").orderBy($"s")
      .rowsBetween(Window.unboundedPreceding, 0)
    val rank2 = sq.groupBy($"event_type", $"s").agg(count(lit(1)).as("t"))
      .select($"event_type", $"s",
        (lit(2L) * (sum($"t").over(wCum) - $"t") + ($"t" + 1L)).as("r2"))
    val ranked = sq.join(rank2, Seq("event_type", "s"))
      .select($"event_type", $"dn", $"r2")
    val lagged = ranked.select($"event_type", ($"dn" + 1).as("dn"), $"r2".as("r2p"))
    val m = ranked.join(lagged, Seq("event_type", "dn"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"r2").as("sa"), sum($"r2p").as("sb"),
        sum($"r2" * $"r2p").as("sab"),
        sum($"r2" * $"r2").as("saa"), sum($"r2p" * $"r2p").as("sbb"))
      .filter($"n" >= 3)
      .select($"event_type", $"n",
        ($"n" * $"sab" - $"sa" * $"sb").as("cab"),
        ($"n" * $"saa" - $"sa" * $"sa").as("caa"),
        ($"n" * $"sbb" - $"sb" * $"sb").as("cbb"))
      .filter($"caa" > 0 && $"cbb" > 0)
    m.select($"event_type", $"n",
      ($"cab".cast("double") /
        (sqrt($"caa".cast("double")) * sqrt($"cbb".cast("double"))))
        .as("rho_sq_changes"))
      .withColumn("clustered",
        $"rho_sq_changes" > lit(2.0) / sqrt($"n".cast("double")))
      .orderBy($"event_type")
  }

  val qEventArchEffectSql: String =
    """WITH daily AS (
      |  SELECT event_type,
      |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dn,
      |    CAST(floor(sum(CAST(value AS DECIMAL(18,4))) * 100) AS BIGINT) AS xc
      |  FROM events GROUP BY event_type, dn
      |),
      |sq AS (
      |  SELECT a.event_type, a.dn, (a.xc - b.xc) * (a.xc - b.xc) AS s
      |  FROM daily a JOIN daily b
      |    ON b.event_type = a.event_type AND b.dn = a.dn - 1
      |),
      |rank2 AS (
      |  SELECT event_type, s,
      |    2 * (sum(t) OVER (PARTITION BY event_type ORDER BY s
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t) +
      |      (t + 1) AS r2
      |  FROM (SELECT event_type, s, count(*) AS t FROM sq GROUP BY event_type, s)
      |),
      |ranked AS (
      |  SELECT sq.event_type AS event_type, dn, r2
      |  FROM sq JOIN rank2 ON rank2.event_type = sq.event_type AND rank2.s = sq.s
      |),
      |m AS (
      |  SELECT a.event_type, count(*) AS n,
      |    CAST(count(*) * sum(a.r2 * b.r2) - sum(a.r2) * sum(b.r2) AS BIGINT) AS cab,
      |    CAST(count(*) * sum(a.r2 * a.r2) - sum(a.r2) * sum(a.r2) AS BIGINT) AS caa,
      |    CAST(count(*) * sum(b.r2 * b.r2) - sum(b.r2) * sum(b.r2) AS BIGINT) AS cbb
      |  FROM ranked a JOIN ranked b
      |    ON b.event_type = a.event_type AND b.dn = a.dn - 1
      |  GROUP BY a.event_type
      |  HAVING count(*) >= 3 AND
      |    count(*) * sum(a.r2 * a.r2) - sum(a.r2) * sum(a.r2) > 0 AND
      |    count(*) * sum(b.r2 * b.r2) - sum(b.r2) * sum(b.r2) > 0
      |)
      |SELECT event_type, n,
      |  CAST(cab AS DOUBLE) / (sqrt(CAST(caa AS DOUBLE)) * sqrt(CAST(cbb AS DOUBLE)))
      |    AS rho_sq_changes,
      |  CAST(cab AS DOUBLE) / (sqrt(CAST(caa AS DOUBLE)) * sqrt(CAST(cbb AS DOUBLE)))
      |    > 2.0 / sqrt(CAST(n AS DOUBLE)) AS clustered
      |FROM m
      |ORDER BY event_type""".stripMargin

  val registry: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "q_running_total" -> ((qRunningTotal _, qRunningTotalSql)),
    "q_event_moving_window" -> ((qEventMovingWindow _, qEventMovingWindowSql)),
    "q_part_size_setops" -> ((qPartSizeSetops _, qPartSizeSetopsSql)),
    "q1_pricing_summary" -> ((q1PricingSummary _, q1PricingSummarySql)),
    "q3_top_unshipped" -> ((q3TopUnshipped _, q3TopUnshippedSql)),
    "q5_nation_revenue" -> ((q5NationRevenue _, q5NationRevenueSql)),
    "q9_product_profit" -> ((q9ProductProfit _, q9ProductProfitSql)),
    "q14_promo_share" -> ((q14PromoShare _, q14PromoShareSql)),
    "q17_small_qty_revenue" -> ((q17SmallQtyRevenue _, q17SmallQtyRevenueSql)),
    "q19_discount_revenue" -> ((q19DiscountRevenue _, q19DiscountRevenueSql)),
    "q4_late_orders" -> ((q4LateOrders _, q4LateOrdersSql)),
    "q16_supplier_census" -> ((q16SupplierCensus _, q16SupplierCensusSql)),
    "q22_dormant_rich" -> ((q22DormantRich _, q22DormantRichSql)),
    "q15_top_supplier" -> ((q15TopSupplier _, q15TopSupplierSql)),
    "q18_large_orders" -> ((q18LargeOrders _, q18LargeOrdersSql)),
    "q7_nation_volume" -> ((q7NationVolume _, q7NationVolumeSql)),
    "q8_market_share" -> ((q8MarketShare _, q8MarketShareSql)),
    "q10_returned_customers" -> ((q10ReturnedCustomers _, q10ReturnedCustomersSql)),
    "q_event_winsorized" -> ((qEventWinsorized _, qEventWinsorizedSql)),
    "q_event_ohlc" -> ((qEventOhlc _, qEventOhlcSql)),
    "q_event_transitions" -> ((qEventTransitions _, qEventTransitionsSql)),
    "q_event_anomalies" -> ((qEventAnomalies _, qEventAnomaliesSql)),
    "q_value_equidepth" -> ((qValueEquidepth _, qValueEquidepthSql)),
    "q_event_global_running" -> ((qEventGlobalRunning _, qEventGlobalRunningSql)),
    "q_event_hop_window" -> ((qEventHopWindow _, qEventHopWindowSql)),
    "q_event_cooccur" -> ((qEventCooccur _, qEventCooccurSql)),
    "q_event_journeys" -> ((qEventJourneys _, qEventJourneysSql)),
    "q_event_ewma" -> ((qEventEwma _, qEventEwmaSql)),
    "q_event_acf" -> ((qEventAcf _, qEventAcfSql)),
    "q_event_trend" -> ((qEventTrend _, qEventTrendSql)),
    "q_event_seasonality" -> ((qEventSeasonality _, qEventSeasonalitySql)),
    "q_event_rolling_active" -> ((qEventRollingActive _, qEventRollingActiveSql)),
    "q_event_segments" -> ((qEventSegments _, qEventSegmentsSql)),
    "q_event_type_dow_chisq" -> ((qEventTypeDowChisq _, qEventTypeDowChisqSql)),
    "q_event_mi" -> ((qEventMi _, qEventMiSql)),
    "q_event_type_corr" -> ((qEventTypeCorr _, qEventTypeCorrSql)),
    "q_event_user_overlap" -> ((qEventUserOverlap _, qEventUserOverlapSql)),
    "q_event_markov_eval" -> ((qEventMarkovEval _, qEventMarkovEvalSql)),
    "q_basket_rules" -> ((qBasketRules _, qBasketRulesSql)),
    "q_event_lateness" -> ((qEventLateness _, qEventLatenessSql)),
    "q_event_dispersion" -> ((qEventDispersion _, qEventDispersionSql)),
    "q_event_ab_cuped" -> ((qEventAbCuped _, qEventAbCupedSql)),
    "q_event_survival" -> ((qEventSurvival _, qEventSurvivalSql)),
    "q_event_cross_corr" -> ((qEventCrossCorr _, qEventCrossCorrSql)),
    "q_event_entropy_rate" -> ((qEventEntropyRate _, qEventEntropyRateSql)),
    "q_order_lead_time" -> ((qOrderLeadTime _, qOrderLeadTimeSql)),
    "q_event_burstiness" -> ((qEventBurstiness _, qEventBurstinessSql)),
    "q_event_funnel_time" -> ((qEventFunnelTime _, qEventFunnelTimeSql)),
    "q_order_backlog" -> ((qOrderBacklog _, qOrderBacklogSql)),
    "q_littles_law" -> ((qLittlesLaw _, qLittlesLawSql)),
    "q_event_precedence" -> ((qEventPrecedence _, qEventPrecedenceSql)),
    "q_event_neyman" -> ((qEventNeyman _, qEventNeymanSql)),
    "q_event_quantile_bridge" -> ((qEventQuantileBridge _, qEventQuantileBridgeSql)),
    "q_littles_by_class" -> ((qLittlesByClass _, qLittlesByClassSql)),
    "q_event_fsm_audit" -> ((qEventFsmAudit _, qEventFsmAuditSql)),
    "q_order_sla_curve" -> ((qOrderSlaCurve _, qOrderSlaCurveSql)),
    "q_order_open_aging" -> ((qOrderOpenAging _, qOrderOpenAgingSql)),
    "q_value_mean_excess" -> ((qValueMeanExcess _, qValueMeanExcessSql)),
    "q_event_peak_concurrency" -> ((qEventPeakConcurrency _, qEventPeakConcurrencySql)),
    "q_event_coverage" -> ((qEventCoverage _, qEventCoverageSql)),
    "q_user_balance" -> ((qUserBalance _, qUserBalanceSql)),
    "q_event_changepoint" -> ((qEventChangepoint _, qEventChangepointSql)),
    "q_user_streaks" -> ((qUserStreaks _, qUserStreaksSql)),
    "q_event_debounce" -> ((qEventDebounce _, qEventDebounceSql)),
    "q_type_cosine" -> ((qTypeCosine _, qTypeCosineSql)),
    "q_event_theil_sen" -> ((qEventTheilSen _, qEventTheilSenSql)),
    "q_supplier_rank_family" -> ((qSupplierRankFamily _, qSupplierRankFamilySql)),
    "q_top_orders_per_priority" -> ((qTopOrdersPerPriority _, qTopOrdersPerPrioritySql)),
    "q_top_orders_native" -> ((qTopOrdersNative _, qTopOrdersNativeSql)),
    "q_customers_without_orders" -> ((qCustomersWithoutOrders _, qCustomersWithoutOrdersSql)),
    "q_customer_order_activity" -> ((qCustomerOrderActivity _, qCustomerOrderActivitySql)),
    "q_customer_order_counts" -> ((qCustomerOrderCounts _, qCustomerOrderCountsSql)),
    "q_order_rollup" -> ((qOrderRollup _, qOrderRollupSql)),
    "q_order_grouping_sets" -> ((qOrderGroupingSets _, qOrderGroupingSetsSql)),
    "q_event_type_pivot" -> ((qEventTypePivot _, qEventTypePivotSql)),
    "q_event_unpivot" -> ((qEventUnpivot _, qEventUnpivotSql)),
    "q_nation_cust_supp_full" -> ((qNationCustSuppFull _, qNationCustSuppFullSql)),
    "q_event_distinct_users" -> ((qEventDistinctUsers _, qEventDistinctUsersSql)),
    "q_event_gaps" -> ((qEventGaps _, qEventGapsSql)),
    "q_hourly_event_stats" -> ((qHourlyEventStats _, qHourlyEventStatsSql)),
    "q_event_sessions" -> ((qEventSessions _, qEventSessionsSql)),
    "q_event_attribution_asof" -> ((qEventAttributionAsof _, qEventAttributionAsofSql)),
    "q_event_attrib_multitouch" -> ((qEventAttribMultiTouch _, qEventAttribMultiTouchSql)),
    "q_event_latest_per_user" -> ((qEventLatestPerUser _, qEventLatestPerUserSql)),
    "q_event_cube" -> ((qEventCube _, qEventCubeSql)),
    "q_event_funnel" -> ((qEventFunnel _, qEventFunnelSql)),
    "q_event_cohort_retention" -> ((qEventCohortRetention _, qEventCohortRetentionSql)),
    "q_event_props_json" -> ((qEventPropsJson _, qEventPropsJsonSql)),
    "q_value_percentiles" -> ((qValuePercentiles _, qValuePercentilesSql)),
    "q_value_log_histogram" -> ((qValueLogHistogram _, qValueLogHistogramSql)),
    "q_event_value_stats" -> ((qEventValueStats _, qEventValueStatsSql)),
    "q_customer_spend_quartiles" -> ((qCustomerSpendQuartiles _, qCustomerSpendQuartilesSql)),
    "q_event_spc" -> ((qEventSpc _, qEventSpcSql)),
    "q_event_bootstrap" -> ((qEventBootstrap _, qEventBootstrapSql)),
    "q_event_ks_drift" -> ((qEventKsDrift _, qEventKsDriftSql)),
    "q_event_records" -> ((qEventRecords _, qEventRecordsSql)),
    "q_event_haar_energy" -> ((qEventHaarEnergy _, qEventHaarEnergySql)),
    "q_event_granger" -> ((qEventGranger _, qEventGrangerSql)),
    "q_event_mannwhitney" -> ((qEventMannWhitney _, qEventMannWhitneySql)),
    "q_event_cusum" -> ((qEventCusum _, qEventCusumSql)),
    "q_event_hurst" -> ((qEventHurst _, qEventHurstSql)),
    "q_event_drawdown" -> ((qEventDrawdown _, qEventDrawdownSql)),
    "q_event_profile_jsd" -> ((qEventProfileJsd _, qEventProfileJsdSql)),
    "q_event_markov_stationary" -> ((qEventMarkovStationary _, qEventMarkovStationarySql)),
    "q_event_arch_effect" -> ((qEventArchEffect _, qEventArchEffectSql)),
    "q_event_sax" -> ((qEventSax _, qEventSaxSql)),
    "q_order_perfect" -> ((qOrderPerfect _, qOrderPerfectSql))
  )
}
