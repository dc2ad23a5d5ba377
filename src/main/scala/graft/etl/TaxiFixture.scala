package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Deterministic taxi-shaped raw input derived from the driver's `events`
  * table (FIXTURES.md §1/§4 mapping). The reference pipeline reads a monthly
  * TLC parquet drop (etl-glue-nyc-yellow-data-model.py:232); the harness has
  * no taxi data, so we derive an equivalent raw frame — same column names,
  * same raw types (VendorID long, RatecodeID/passenger_count nullable double,
  * money doubles, flag Y/N/null string) — from `events` with pure arithmetic
  * that DuckDB reproduces exactly (see [[rawSql]]).
  *
  * The value ranges are chosen so every quality filter and the duration
  * cutoff actually drop rows (FIXTURES.md: passenger_count ∈ {null,0..8},
  * trip_distance straddles [5,500], fare_amount straddles 0, durations
  * straddle 1440 min), and ~10% of rows are injected as exact duplicates so
  * the full-row dedup (ny:271) is observable.
  *
  * Scale note: this is a narrow projection of the events scan — no shuffle,
  * no driver-side data. At 100 TB the fixture is irrelevant (real data
  * replaces it); the pipeline under test is what must scale.
  */
object TaxiFixture {

  /** Raw taxi frame. Column set/types per FIXTURES.md §1. */
  def raw(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.events(spark, sfDir).select(
      col("event_id"),
      (col("event_id") % 4 + 1).as("VendorID"),
      col("ts").as("tpep_pickup_datetime"),
      timestamp_micros(unix_micros(col("ts")) + (col("event_id") % 1500) * lit(60000000L))
        .as("tpep_dropoff_datetime"),
      when(col("event_id") % 13 === 0, lit(null))
        .otherwise((col("event_id") % 9).cast("double")).as("passenger_count"),
      (col("value") * 1.2).as("trip_distance"),
      when(col("event_id") % 17 === 0, lit(null))
        .otherwise((col("event_id") % 7 + 1).cast("double")).as("RatecodeID"),
      when(col("event_id") % 3 === 0, "Y").when(col("event_id") % 3 === 1, "N")
        .otherwise(lit(null)).as("store_and_fwd_flag"),
      (col("user_id") % 265 + 1).as("PULocationID"),
      ((col("user_id") + col("event_id")) % 265 + 1).as("DOLocationID"),
      (col("event_id") % 7).as("payment_type"),
      (col("value") - 2.0).as("fare_amount"),
      (col("value") * 0.1).as("extra"),
      lit(0.5).as("mta_tax"),
      (col("value") * 0.2).as("tip_amount"),
      when(col("event_id") % 5 === 0, 6.55).otherwise(0.0).as("tolls_amount"),
      lit(0.3).as("improvement_surcharge"),
      when(col("user_id") % 2 === 0, 2.5).otherwise(lit(null).cast("double"))
        .as("congestion_surcharge"),
      when(col("event_id") % 4 === 0, 1.25).otherwise(lit(null).cast("double"))
        .as("airport_fee"))
      // Sum of 2-decimal-digit terms ONLY (events.value is exactly 2dp, so
      // fare/mta/tolls/improvement all are): the binary sum sits within
      // ~1e-12 of a 2dp decimal, never near an .xx5 rounding tie, so the
      // downstream cast to DECIMAL(10,2) (ny:265) rounds identically in
      // Spark (exact BigDecimal HALF_UP) and DuckDB (double-space rounding).
      // Including extra/tip (3dp) produced genuine .xx5 ties where the two
      // engines' rounding regimes diverge — a fixture choice, not a pipeline
      // semantic.
      .withColumn("total_amount",
        col("fare_amount") + col("mta_tax") + col("tolls_amount") +
          col("improvement_surcharge"))
    // ~10% exact duplicates so dropDuplicates (ny:271) has work to do.
    // Injected by exploding a per-row copy count instead of a self-union:
    // same multiset, but ONE events scan instead of two (the union shape
    // doubled every downstream pass — a real cost once peakBand's build
    // side re-executed the pipeline; see Derive.peakBand scale note).
    base
      .withColumn("n_copies", when(col("event_id") % 10 === 0, 2).otherwise(1))
      .withColumn("copy", explode(sequence(lit(1), col("n_copies"))))
      .drop("event_id", "n_copies", "copy")
  }

  /** DuckDB CTEs producing the identical raw frame from events.parquet.
    * `ev` casts ts to TIMESTAMP — a truncation on a TIMESTAMP_NS-era footer
    * (matching Tables.events' nanos div 1000 branch) and a no-op on the
    * current TIMESTAMP_US footer, so both engines agree in either era.
    */
  val rawSql: String =
    """ev AS (
      |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value FROM events
      |),
      |raw0 AS (
      |  SELECT
      |    event_id,
      |    event_id % 4 + 1 AS VendorID,
      |    ts AS tpep_pickup_datetime,
      |    make_timestamp(epoch_us(ts) + (event_id % 1500) * 60000000) AS tpep_dropoff_datetime,
      |    CASE WHEN event_id % 13 = 0 THEN NULL ELSE CAST(event_id % 9 AS DOUBLE) END AS passenger_count,
      |    value * CAST(1.2 AS DOUBLE) AS trip_distance,
      |    CASE WHEN event_id % 17 = 0 THEN NULL ELSE CAST(event_id % 7 + 1 AS DOUBLE) END AS RatecodeID,
      |    CASE WHEN event_id % 3 = 0 THEN 'Y' WHEN event_id % 3 = 1 THEN 'N' ELSE NULL END AS store_and_fwd_flag,
      |    user_id % 265 + 1 AS PULocationID,
      |    (user_id + event_id) % 265 + 1 AS DOLocationID,
      |    event_id % 7 AS payment_type,
      |    value - CAST(2.0 AS DOUBLE) AS fare_amount,
      |    value * CAST(0.1 AS DOUBLE) AS extra,
      |    CAST(0.5 AS DOUBLE) AS mta_tax,
      |    value * CAST(0.2 AS DOUBLE) AS tip_amount,
      |    CASE WHEN event_id % 5 = 0 THEN CAST(6.55 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS tolls_amount,
      |    CAST(0.3 AS DOUBLE) AS improvement_surcharge,
      |    CASE WHEN user_id % 2 = 0 THEN CAST(2.5 AS DOUBLE) ELSE NULL END AS congestion_surcharge,
      |    CASE WHEN event_id % 4 = 0 THEN CAST(1.25 AS DOUBLE) ELSE NULL END AS airport_fee
      |  FROM ev
      |),
      |raw1 AS (
      |  SELECT *,
      |    fare_amount + mta_tax + tolls_amount + improvement_surcharge AS total_amount
      |  FROM raw0
      |),
      |raw AS (
      |  SELECT * EXCLUDE (event_id) FROM raw1
      |  UNION ALL
      |  SELECT * EXCLUDE (event_id) FROM raw1 WHERE event_id % 10 = 0
      |)""".stripMargin
}
