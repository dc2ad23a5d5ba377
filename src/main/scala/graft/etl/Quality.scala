package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Data-quality operators (Deequ-shaped): a generic single-pass column
  * profiler and a declarative constraint-validation pass. These are the
  * checks a production pipeline runs BEFORE publishing a batch — the
  * reference's ETL filters rows it considers bad ([[Cleanse]]) but never
  * measures what it accepted; this module closes that gap, complementing
  * [[StarSchema.transformObserved]]'s zero-extra-pass pipeline metrics
  * with standalone, any-table validation.
  *
  * Both are ordinary aggregations — Catalyst plans one scan per call —
  * and both are oracle-checked row-for-row against DuckDB.
  */
object Quality {

  // ------------------------------------------------------------------
  // Generic column profiler
  // ------------------------------------------------------------------

  /** One-pass column profile: for each requested column, row count, null
    * count, exact distinct count, and (numeric columns only) min/max as
    * DOUBLE. String min/max is deliberately NOT emitted — engines render
    * non-ASCII/date/float boundaries differently, and a profile exists to
    * be compared across runs, so every emitted cell must be
    * engine-stable.
    *
    * Mechanics: ONE `agg` computes the full metric grid (the scan is read
    * once); the per-column rows are then an `explode` over a constant
    * array of structs — no second pass, no union of per-column scans (a
    * UNION-ALL formulation scans the table once PER COLUMN — at 100 TB
    * with 26 columns that is 25 extra full-table reads).
    *
    * Scale: exact `countDistinct` over c columns plans one Expand (c+1
    * row multiplication) feeding partial aggregates — the exact grid in
    * one shuffle. At extreme width/cardinality swap
    * `approx_count_distinct` in for the distinct column (single pass, no
    * Expand, ±2% HLL error) — kept exact here because the profile is
    * oracle-compared cell-for-cell.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val numeric = df.schema.fields
      .filter(f => Set("long", "integer", "double", "float", "decimal")
        .exists(f.dataType.typeName.startsWith))
      .map(_.name).toSet
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__rows_$c"),
        count(col(c)).as(s"__nonnull_$c"),
        countDistinct(col(c)).as(s"__distinct_$c"),
        (if (numeric(c)) min(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"__min_$c"),
        (if (numeric(c)) max(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"__max_$c"))
    }
    val grid = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(cols.map { c =>
      struct(
        lit(c).as("column_name"),
        col(s"__rows_$c").as("n_rows"),
        (col(s"__rows_$c") - col(s"__nonnull_$c")).as("n_nulls"),
        col(s"__distinct_$c").as("n_distinct"),
        col(s"__min_$c").as("min_num"),
        col(s"__max_$c").as("max_num"))
    }: _*)
    grid.select(explode(rows).as("p"))
      .select(col("p.*"))
      .orderBy(col("column_name"))
  }

  /** Profile of the `orders` table (driver-facing entry). */
  def qProfileOrders(spark: SparkSession, sfDir: String): DataFrame =
    profile(Tables.orders(spark, sfDir),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"))

  val qProfileOrdersSql: String = {
    def arm(c: String, numeric: Boolean): String = {
      val mn = if (numeric) s"CAST(min($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val mx = if (numeric) s"CAST(max($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct, $mn AS min_num, $mx AS max_num
         |FROM orders""".stripMargin
    }
    Seq(
      arm("o_orderkey", numeric = true), arm("o_custkey", numeric = true),
      arm("o_orderstatus", numeric = false), arm("o_totalprice", numeric = true),
      arm("o_orderpriority", numeric = false))
      .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  // ------------------------------------------------------------------
  // Declarative constraint validation
  // ------------------------------------------------------------------

  /** Constraint-validation pass over `orders` (+ referential integrity
    * against `customer`): one row per check with the measured violation
    * metric and its pass verdict — the gate a batch must clear before
    * [[Publish]] ships it. Checks:
    *
    *   - `orderkey_unique`: primary-key uniqueness (dup rows = 0)
    *   - `custkey_complete`: FK column has no NULLs
    *   - `status_domain`: o_orderstatus within its declared domain
    *   - `totalprice_nonneg`: no negative money
    *   - `customer_ri`: every o_custkey resolves in `customer`
    *     (left-anti count = 0)
    *
    * Scale: the four column checks are ONE aggregation over one scan
    * (conditional counts — no per-check passes). RI is the one join: a
    * left-anti against the customer keyset, shuffle-keyed on custkey
    * — the exact shape [[Publish.missingDims]] uses catalog-side. The
    * final assembly unions five 1-row frames — driver-trivial.
    */
  def qCheckOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val grid = o.agg(
      count(lit(1)).as("n"),
      countDistinct(col("o_orderkey")).as("nd"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_ck"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
        .as("bad_status"),
      sum(when(col("o_totalprice") < 0, 1L).otherwise(0L)).as("neg_price"))
    val riViolations = o.join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("m"))
    def check(name: String, metric: Column): Column =
      struct(lit(name).as("check_name"), metric.cast("long").as("violations"),
        (metric === 0).as("passed"))
    grid.select(explode(array(
        check("orderkey_unique", col("n") - col("nd")),
        check("custkey_complete", col("null_ck")),
        check("status_domain", col("bad_status")),
        check("totalprice_nonneg", col("neg_price")))).as("c"))
      .select(col("c.*"))
      .unionAll(riViolations.select(lit("customer_ri").as("check_name"),
        col("m").cast("long").as("violations"), (col("m") === 0).as("passed")))
      .orderBy(col("check_name"))
  }

  val qCheckOrdersSql: String =
    """WITH grid AS (
      |  SELECT count(*) AS n, count(DISTINCT o_orderkey) AS nd,
      |    sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_ck,
      |    sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS bad_status,
      |    sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS neg_price
      |  FROM orders
      |),
      |ri AS (
      |  SELECT count(*) AS m FROM orders
      |  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
      |)
      |SELECT check_name, CAST(violations AS BIGINT) AS violations, violations = 0 AS passed
      |FROM (
      |  SELECT 'orderkey_unique' AS check_name, n - nd AS violations FROM grid
      |  UNION ALL SELECT 'custkey_complete', null_ck FROM grid
      |  UNION ALL SELECT 'status_domain', bad_status FROM grid
      |  UNION ALL SELECT 'totalprice_nonneg', neg_price FROM grid
      |  UNION ALL SELECT 'customer_ri', m FROM ri)
      |ORDER BY check_name""".stripMargin

  val registry: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "q_profile_orders" -> ((qProfileOrders _, qProfileOrdersSql)),
    "q_check_orders" -> ((qCheckOrders _, qCheckOrdersSql))
  )
}
