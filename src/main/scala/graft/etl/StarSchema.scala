package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end Job-1 pipeline (E1 in SURVEY §3): raw taxi frame → cleansed →
  * derived → 26-column fact projection → partitioned parquet sink.
  *
  * Final projection per ny:321-356: drop the raw timestamp strings and the
  * transient Hour, stamp the processing partition (`processed_year`/
  * `processed_month` job args, ny:323-327), select the 26 fact columns in
  * the reference's exact order.
  */
object StarSchema {

  /** Fact column order, ny:329-356. */
  val factColumns: Seq[String] = Seq(
    "trip_id", "vendor_id", "passenger_count",
    "tpep_pickup_date_id", "tpep_pickup_time_id",
    "tpep_dropoff_date_id", "tpep_dropoff_time_id",
    "trip_duration_minutes", "trip_peak_band_id", "trip_distance",
    "rate_code_id", "store_and_fwd_flag",
    "pickup_location_id", "drop_off_location_id", "payment_type",
    "fare_amount", "extra", "mta_tax", "tip_amount", "tolls_amount",
    "improvement_surcharge", "congestion_surcharge", "airport_fee",
    "total_amount", "processed_year", "processed_month")

  /** Full pipeline over an arbitrary raw taxi frame. */
  def transform(raw: DataFrame, processedYear: String, processedMonth: String): DataFrame =
    Derive(Cleanse(raw))
      .drop("tpep_pickup_datetime", "tpep_dropoff_datetime", "Hour") // P5, ny:321
      .withColumn("processed_year", lit(processedYear))
      .withColumn("processed_month", lit(processedMonth))
      .select(factColumns.map(col): _*) // P6, ny:329-356

  /** Pipeline over the events-derived fixture (the harness's "monthly file"). */
  def factTrips(spark: SparkSession, sfDir: String): DataFrame =
    transform(TaxiFixture.raw(spark, sfDir), "2024", "1")

  /** [[transform]] instrumented with in-flight data-quality metrics via
    * the `Observation` API — the intake/output counters a production ETL
    * job emits (rows read, rows shipped, per-filter drop candidates)
    * WITHOUT a second pass: `observe` attaches aggregates to the running
    * job itself, so the QC numbers cost zero extra scans — at 100 TB a
    * "count it again" QC pass is a second full read of the table. Metrics
    * resolve after the first action on the returned frame.
    */
  def transformObserved(raw: DataFrame, processedYear: String, processedMonth: String)
      : (DataFrame, org.apache.spark.sql.Observation, org.apache.spark.sql.Observation) = {
    val intake = org.apache.spark.sql.Observation("raw_intake")
    val output = org.apache.spark.sql.Observation("fact_output")
    val observedRaw = raw.observe(intake,
      count(lit(1)).as("n_rows"),
      count(when(col("fare_amount") <= 0, 1)).as("n_nonpositive_fare"),
      count(when(col("passenger_count") < 1 || col("passenger_count") > 6, 1))
        .as("n_bad_passenger"),
      count(when(col("trip_distance") < 5.0 || col("trip_distance") > 500.0, 1))
        .as("n_bad_distance"))
    val fact = transform(observedRaw, processedYear, processedMonth)
      .observe(output, count(lit(1)).as("n_rows"))
    (fact, intake, output)
  }

  /** K1 — partitioned snappy parquet + catalog sink (ny:358-371). Partition
    * columns are the processing year/month, so month-granular readbacks
    * (Job-2's F5 filter) prune to one directory — the access pattern that
    * keeps a 100 TB fact table usable. Append mode matches the reference's
    * month-at-a-time accumulation.
    */
  def writeFact(df: DataFrame, table: String): Unit = {
    Publish.ensureDatabaseOf(df.sparkSession, table) // ny:37-57 guard
    df.write.mode(SaveMode.Append)
      .partitionBy("processed_year", "processed_month")
      .option("compression", "snappy")
      .format("parquet")
      .saveAsTable(table)
  }

  /** DuckDB oracle for the full fact output (WITH-chain assembled from the
    * stage CTEs so each Scala stage has a literally mirrored SQL stage).
    */
  private def withChain: String =
    s"WITH ${TaxiFixture.rawSql},\n${Cleanse.cleanseSql},\n${Derive.deriveSql}"

  /** REAL columns widened to DOUBLE at the oracle boundary (exact widening;
    * see [[EtlQueries]] scaladoc). ORDER BY carries the same measure
    * tiebreaks as the Spark wrapper.
    */
  val factSql: String =
    s"""$withChain
       |SELECT trip_id, vendor_id, passenger_count,
       |  tpep_pickup_date_id, tpep_pickup_time_id,
       |  tpep_dropoff_date_id, tpep_dropoff_time_id,
       |  trip_duration_minutes, trip_peak_band_id,
       |  CAST(trip_distance AS DOUBLE) AS trip_distance,
       |  rate_code_id, store_and_fwd_flag,
       |  pickup_location_id, drop_off_location_id, payment_type,
       |  CAST(fare_amount AS DOUBLE) AS fare_amount,
       |  CAST(extra AS DOUBLE) AS extra,
       |  CAST(mta_tax AS DOUBLE) AS mta_tax,
       |  CAST(tip_amount AS DOUBLE) AS tip_amount,
       |  tolls_amount,
       |  CAST(improvement_surcharge AS DOUBLE) AS improvement_surcharge,
       |  CAST(congestion_surcharge AS DOUBLE) AS congestion_surcharge,
       |  airport_fee,
       |  CAST(total_amount AS DOUBLE) AS total_amount,
       |  '2024' AS processed_year, '1' AS processed_month
       |FROM banded
       |ORDER BY trip_id, CAST(trip_distance AS DOUBLE), CAST(fare_amount AS DOUBLE)""".stripMargin

  /** Analytical roll-up over the fact output (the star schema's purpose):
    * trips/revenue by peak band. Exercises agg-over-pipeline composition.
    */
  def bandSummary(spark: SparkSession, sfDir: String): DataFrame =
    factTrips(spark, sfDir)
      .groupBy(col("trip_peak_band_id"))
      .agg(
        count(lit(1)).as("n_trips"),
        sum(col("total_amount")).cast("double").as("total_revenue"),
        // explicit exact-sum/count instead of avg(): the long sum is exact,
        // so the single double division is bit-identical in both engines
        (sum(col("trip_duration_minutes")).cast("double") /
          count(lit(1)).cast("double")).as("avg_duration_min"))
      .orderBy(col("trip_peak_band_id"))

  val bandSummarySql: String =
    s"""$withChain
       |SELECT trip_peak_band_id, count(*) AS n_trips,
       |  CAST(sum(total_amount) AS DOUBLE) AS total_revenue,
       |  CAST(sum(trip_duration_minutes) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_duration_min
       |FROM banded
       |GROUP BY trip_peak_band_id
       |ORDER BY trip_peak_band_id""".stripMargin
}
