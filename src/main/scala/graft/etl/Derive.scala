package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derivation stages of the Job-1 pipeline: surrogate keys (P3/P4/X1),
  * trip duration (X6/X7/F4), peak-band classification + join (F6-F8/J1).
  *
  * Citations into /root/reference/glue_job_scripts/etl-glue-nyc-yellow-data-model.py:
  *   - `trip_id` ny:279 is `uuid()` — nondeterministic per run (SURVEY §1.4
  *     B5). We substitute a deterministic content hash of the natural key
  *     (sha2-256 over pickup/dropoff strings + int FKs) so runs are
  *     reproducible and oracle-checkable; a [[nondeterministicTripId]]
  *     variant keeps the reference's literal behavior for parity demos.
  *   - date/time surrogate FKs ny:281-288: `date_format` 'yyyyMMdd'/'HHmmss'
  *     over the *string* timestamp columns (implicit string→timestamp cast).
  *   - duration ny:290-301: `floor((unix_timestamp(dropoff) -
  *     unix_timestamp(pickup)) / 60)` on the re-stringified timestamps, then
  *     the `< 1440` cutoff.
  *   - peak band ny:303-319: distinct pickup hours (≤24 rows) classified by
  *     `between` + `|` over the *string* hour (numeric coercion, F8), joined
  *     back on Hour equality. The build side is ≤24 rows — explicitly
  *     `broadcast()` so the join is map-side at any scale (the reference
  *     relies on auto-broadcast; at 100 TB the hint removes the planner's
  *     size-estimation risk entirely). A derived-column `CASE` would fuse
  *     into the scan and avoid the join outright, but we keep the reference's
  *     distinct+join shape because it *is* the operator under test (J1/A2).
  */
object Derive {

  /** Deterministic surrogate for ny:279's `uuid()` (SURVEY §7.4): sha2 over
    * the natural key. Only string/int columns participate — float formatting
    * differs across engines, ints and our fixed-format strings do not.
    */
  def tripId(df: DataFrame): DataFrame =
    df.withColumn("trip_id",
      sha2(concat_ws("|",
        col("tpep_pickup_datetime"), col("tpep_dropoff_datetime"),
        col("vendor_id"), col("pickup_location_id"),
        col("drop_off_location_id"), col("payment_type")), 256))

  /** Reference-literal trip id (ny:279) — nondeterministic, excluded from
    * oracle checks; exists to demonstrate X15 parity.
    */
  def nondeterministicTripId(df: DataFrame): DataFrame =
    df.withColumn("trip_id", expr("uuid()"))

  /** P4 — ny:281-288 */
  def dateTimeKeys(df: DataFrame): DataFrame =
    df.withColumns(Map(
      "tpep_pickup_date_id" -> date_format(col("tpep_pickup_datetime"), "yyyyMMdd"),
      "tpep_pickup_time_id" -> date_format(col("tpep_pickup_datetime"), "HHmmss"),
      "tpep_dropoff_date_id" -> date_format(col("tpep_dropoff_datetime"), "yyyyMMdd"),
      "tpep_dropoff_time_id" -> date_format(col("tpep_dropoff_datetime"), "HHmmss")))

  /** P3/X6/X7/F4 — ny:290-301 */
  def duration(df: DataFrame): DataFrame =
    df.withColumn("trip_duration_minutes",
        floor((unix_timestamp(col("tpep_dropoff_datetime")) -
          unix_timestamp(col("tpep_pickup_datetime"))) / 60))
      .filter(col("trip_duration_minutes") < 1440)

  /** F6-F8/J1/A2 — ny:303-319: hour extraction, ≤24-row distinct band lookup,
    * broadcast equi-join, star-select to keep only the band id from the
    * build side.
    */
  def peakBand(df: DataFrame): DataFrame = {
    val withHour = df.withColumn("Hour", date_format(col("tpep_pickup_datetime"), "HH"))
    // The reference derives the lookup by re-running the whole pipeline for a
    // distinct() over pickup hours (ny:305-307) — at scale that is a second
    // full pass over the fact data just to recover ≤24 statically-knowable
    // rows. The 3-arm CASE is total over hours, so a range(0,24)-derived
    // lookup is semantically identical; we keep the distinct+broadcast-join
    // operator shape (A2/J1) but the build side is now a 24-row local
    // relation with zero upstream work. Inner join is lossless: every data
    // Hour ("00".."23") appears in the lookup.
    val bands = df.sparkSession.range(0, 24)
      .select(format_string("%02d", col("id")).as("Hour"))
      .distinct()
      .select(
        col("Hour"),
        when(col("Hour").between(0, 5) || col("Hour").between(20, 23), "101")
          .when(col("Hour").between(6, 9) || col("Hour").between(16, 19), "102")
          .otherwise("103")
          .as("trip_peak_band_id"))
    withHour.join(broadcast(bands), bands("Hour") === withHour("Hour"))
      .select(withHour.col("*"), bands("trip_peak_band_id"))
  }

  def apply(df: DataFrame): DataFrame =
    peakBand(duration(dateTimeKeys(tripId(df))))

  /** DuckDB CTEs mirroring the derivations over `filtered`
    * ([[Cleanse.cleanseSql]]). The band join collapses to the equivalent
    * per-row CASE (the reference's distinct+join is an implementation shape,
    * not a semantic difference). Duration uses exact integer epoch seconds.
    */
  val deriveSql: String =
    """derived AS (
      |  SELECT *,
      |    sha256(concat_ws('|', tpep_pickup_datetime, tpep_dropoff_datetime,
      |                     vendor_id, pickup_location_id, drop_off_location_id, payment_type)) AS trip_id,
      |    strftime(pickup_ts, '%Y%m%d') AS tpep_pickup_date_id,
      |    strftime(pickup_ts, '%H%M%S') AS tpep_pickup_time_id,
      |    strftime(dropoff_ts, '%Y%m%d') AS tpep_dropoff_date_id,
      |    strftime(dropoff_ts, '%H%M%S') AS tpep_dropoff_time_id,
      |    CAST(floor((epoch_us(dropoff_ts) / 1000000 - epoch_us(pickup_ts) / 1000000) / 60) AS BIGINT) AS trip_duration_minutes
      |  FROM filtered
      |),
      |duration_filtered AS (
      |  SELECT * FROM derived WHERE trip_duration_minutes < 1440
      |),
      |banded AS (
      |  SELECT *,
      |    CASE WHEN CAST(strftime(pickup_ts, '%H') AS INTEGER) BETWEEN 0 AND 5
      |           OR CAST(strftime(pickup_ts, '%H') AS INTEGER) BETWEEN 20 AND 23 THEN '101'
      |         WHEN CAST(strftime(pickup_ts, '%H') AS INTEGER) BETWEEN 6 AND 9
      |           OR CAST(strftime(pickup_ts, '%H') AS INTEGER) BETWEEN 16 AND 19 THEN '102'
      |         ELSE '103' END AS trip_peak_band_id
      |  FROM duration_filtered
      |)""".stripMargin
}
