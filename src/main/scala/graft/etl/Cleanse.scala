package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, FloatType, IntegerType, StringType}

/** Cleansing stages of the Job-1 pipeline: bulk rename (P1), 18-column cast
  * map (P2), full-row dedup (A1), data-quality filters (F1-F4/F9).
  *
  * Semantics mirror the reference exactly (citations into
  * /root/reference/glue_job_scripts/etl-glue-nyc-yellow-data-model.py):
  *   - rename map ny:234-241 via `withColumnsRenamed`;
  *   - cast map ny:243-269 via `withColumns` — note the timestamps are
  *     *re-formatted to strings* 'yyyy-MM-dd HH:mm:ss' (ny:245-249), the
  *     Y/N/null flag collapses to 1/0 (ny:254-256, null → 0), `airport_fee`
  *     is null-defaulted (ny:267; `coalesce(float, lit(0.0))` widens to
  *     DOUBLE — a reference quirk we reproduce), `tolls_amount` is never
  *     cast (SURVEY §1.4 B3, stays raw double), `total_amount` is the lone
  *     DECIMAL(10,2) (ny:265);
  *   - dedup ny:271 *before* the filters, over all columns;
  *   - filters ny:273-277: passenger_count ∈ [1,6], trip_distance ∈
  *     [5.0,500.0], SQL-string filter "fare_amount > 0 " (F3 — kept as a
  *     string-parsed predicate for surface parity).
  *
  * Scale notes (100 TB): rename/cast/filter are narrow (no shuffle) and stay
  * inside one WholeStageCodegen span; the filters sit directly over the scan
  * so Catalyst pushes them into the parquet reader where the source columns
  * allow. The dedup is the pipeline's one shuffle — a hash exchange over all
  * 19 columns with map-side partial aggregation; at scale, AQE coalesces its
  * partitions and a pre-partitioned/bucketed source would avoid re-shuffling
  * downstream.
  */
object Cleanse {

  /** P1 — ny:234-241 */
  val renameMap: Map[String, String] = Map(
    "VendorID" -> "vendor_id",
    "RatecodeID" -> "rate_code_id",
    "PULocationID" -> "pickup_location_id",
    "DOLocationID" -> "drop_off_location_id")

  def rename(df: DataFrame): DataFrame = df.withColumnsRenamed(renameMap)

  /** P2 — ny:243-269 */
  val castMap: Map[String, Column] = Map(
    "vendor_id" -> col("vendor_id").cast(IntegerType),
    "tpep_pickup_datetime" -> date_format(col("tpep_pickup_datetime"), "yyyy-MM-dd HH:mm:ss"),
    "tpep_dropoff_datetime" -> date_format(col("tpep_dropoff_datetime"), "yyyy-MM-dd HH:mm:ss"),
    "passenger_count" -> col("passenger_count").cast(IntegerType),
    "trip_distance" -> col("trip_distance").cast(FloatType),
    "rate_code_id" -> col("rate_code_id").cast(IntegerType),
    "store_and_fwd_flag" -> when(col("store_and_fwd_flag").cast(StringType) === "Y", 1).otherwise(0),
    "pickup_location_id" -> col("pickup_location_id").cast(IntegerType),
    "drop_off_location_id" -> col("drop_off_location_id").cast(IntegerType),
    "payment_type" -> col("payment_type").cast(IntegerType),
    "fare_amount" -> col("fare_amount").cast(FloatType),
    "extra" -> col("extra").cast(FloatType),
    "mta_tax" -> col("mta_tax").cast(FloatType),
    "tip_amount" -> col("tip_amount").cast(FloatType),
    "improvement_surcharge" -> col("improvement_surcharge").cast(FloatType),
    "total_amount" -> col("total_amount").cast(DecimalType(10, 2)),
    "congestion_surcharge" -> col("congestion_surcharge").cast(FloatType),
    "airport_fee" -> coalesce(col("airport_fee").cast(FloatType), lit(0.0)))

  def cast(df: DataFrame): DataFrame = df.withColumns(castMap)

  /** A1 — ny:271, full-row distinct (the pipeline's only shuffle) */
  def dedup(df: DataFrame): DataFrame = df.dropDuplicates()

  /** F1-F3 — ny:273-277 (F3 deliberately a SQL-string predicate) */
  def qualityFilters(df: DataFrame): DataFrame =
    df.filter(col("passenger_count") >= 1).filter(col("passenger_count") <= 6)
      .filter(col("trip_distance") >= 5.0).filter(col("trip_distance") <= 500.0)
      .filter("fare_amount > 0 ")

  def apply(raw: DataFrame): DataFrame =
    qualityFilters(dedup(cast(rename(raw))))

  /** DuckDB CTEs mirroring rename+cast+dedup+filters over the `raw` CTE
    * ([[TaxiFixture.rawSql]]). `pickup_ts`/`dropoff_ts` carry the
    * second-truncated timestamps the re-formatted strings encode (they are
    * functionally dependent on those strings, so DISTINCT cardinality is
    * unchanged); later stages derive date/time keys from them.
    */
  val cleanseSql: String =
    """casted AS (
      |  SELECT
      |    CAST(VendorID AS INTEGER) AS vendor_id,
      |    strftime(tpep_pickup_datetime, '%Y-%m-%d %H:%M:%S') AS tpep_pickup_datetime,
      |    strftime(tpep_dropoff_datetime, '%Y-%m-%d %H:%M:%S') AS tpep_dropoff_datetime,
      |    date_trunc('second', tpep_pickup_datetime) AS pickup_ts,
      |    date_trunc('second', tpep_dropoff_datetime) AS dropoff_ts,
      |    CAST(passenger_count AS INTEGER) AS passenger_count,
      |    CAST(trip_distance AS REAL) AS trip_distance,
      |    CAST(RatecodeID AS INTEGER) AS rate_code_id,
      |    CASE WHEN store_and_fwd_flag = 'Y' THEN 1 ELSE 0 END AS store_and_fwd_flag,
      |    CAST(PULocationID AS INTEGER) AS pickup_location_id,
      |    CAST(DOLocationID AS INTEGER) AS drop_off_location_id,
      |    CAST(payment_type AS INTEGER) AS payment_type,
      |    CAST(fare_amount AS REAL) AS fare_amount,
      |    CAST(extra AS REAL) AS extra,
      |    CAST(mta_tax AS REAL) AS mta_tax,
      |    CAST(tip_amount AS REAL) AS tip_amount,
      |    tolls_amount,
      |    CAST(improvement_surcharge AS REAL) AS improvement_surcharge,
      |    CAST(total_amount AS DECIMAL(10,2)) AS total_amount,
      |    CAST(congestion_surcharge AS REAL) AS congestion_surcharge,
      |    COALESCE(CAST(CAST(airport_fee AS REAL) AS DOUBLE), CAST(0.0 AS DOUBLE)) AS airport_fee
      |  FROM raw
      |),
      |dedup AS (SELECT DISTINCT * FROM casted),
      |filtered AS (
      |  SELECT * FROM dedup
      |  WHERE passenger_count >= 1 AND passenger_count <= 6
      |    AND trip_distance >= CAST(5.0 AS DOUBLE) AND trip_distance <= CAST(500.0 AS DOUBLE)
      |    AND fare_amount > 0
      |)""".stripMargin
}
