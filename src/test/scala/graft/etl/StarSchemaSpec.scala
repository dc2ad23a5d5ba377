package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.SparkSuite

/** Semantics tests for the Job-1 pipeline edge cases (SURVEY §5.2): peak-band
  * boundary hours, Y/N/null flag mapping, the 1440-minute cutoff, quality
  * filter bounds, full-row dedup, and the airport_fee coalesce default.
  */
class StarSchemaSpec extends SparkSuite {

  /** Minimal raw taxi frame builder: one row per (pickup, dropoff) with
    * passable defaults for every other column.
    */
  private def rawFrame(rows: Seq[(String, String, java.lang.Double, Double, Double, String, java.lang.Double)]): DataFrame = {
    // (pickup, dropoff, passenger_count, trip_distance, fare, flag, airport_fee)
    val schema = StructType(Seq(
      StructField("VendorID", LongType),
      StructField("tpep_pickup_datetime", TimestampType),
      StructField("tpep_dropoff_datetime", TimestampType),
      StructField("passenger_count", DoubleType),
      StructField("trip_distance", DoubleType),
      StructField("RatecodeID", DoubleType),
      StructField("store_and_fwd_flag", StringType),
      StructField("PULocationID", LongType),
      StructField("DOLocationID", LongType),
      StructField("payment_type", LongType),
      StructField("fare_amount", DoubleType),
      StructField("extra", DoubleType),
      StructField("mta_tax", DoubleType),
      StructField("tip_amount", DoubleType),
      StructField("tolls_amount", DoubleType),
      StructField("improvement_surcharge", DoubleType),
      StructField("congestion_surcharge", DoubleType),
      StructField("airport_fee", DoubleType),
      StructField("total_amount", DoubleType)))
    val data = rows.map { case (pu, doff, pc, dist, fare, flag, af) =>
      Row(1L, Timestamp.valueOf(pu), Timestamp.valueOf(doff), pc, dist, 1.0.asInstanceOf[java.lang.Double],
        flag, 10L, 20L, 1L, fare, 0.0, 0.5, 0.0, 0.0, 0.3, null, af, fare + 0.8)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data), schema)
  }

  private def ok(pu: String, doff: String): (String, String, java.lang.Double, Double, Double, String, java.lang.Double) =
    (pu, doff, 2.0, 10.0, 20.0, "N", null)

  test("peak band boundaries: hours map to 101/102/103 per ny:310-313") {
    val rows = (0 to 23).map(h => ok(f"2024-03-04 $h%02d:15:00", f"2024-03-04 $h%02d:45:00"))
    val out = StarSchema.transform(rawFrame(rows), "2024", "3")
      .select("tpep_pickup_time_id", "trip_peak_band_id").collect()
      .map(r => (r.getString(0).take(2).toInt, r.getString(1))).toMap
    assert(out.size === 24)
    (0 to 5).foreach(h => assert(out(h) === "101", s"hour $h"))
    (20 to 23).foreach(h => assert(out(h) === "101", s"hour $h"))
    (6 to 9).foreach(h => assert(out(h) === "102", s"hour $h"))
    (16 to 19).foreach(h => assert(out(h) === "102", s"hour $h"))
    (10 to 15).foreach(h => assert(out(h) === "103", s"hour $h"))
  }

  test("store_and_fwd_flag maps Y→1, N→0, null→0 (ny:254-256)") {
    val base = ok("2024-03-04 12:00:00", "2024-03-04 12:30:00")
    val rows = Seq(base.copy(_6 = "Y"), base.copy(_2 = "2024-03-04 12:31:00", _6 = "N"),
      base.copy(_2 = "2024-03-04 12:32:00", _6 = null))
    val flags = StarSchema.transform(rawFrame(rows), "2024", "3")
      .select("store_and_fwd_flag").collect().map(_.getInt(0)).sorted
    assert(flags.toSeq === Seq(0, 0, 1))
  }

  test("trip_duration_minutes floors and the 1440 cutoff applies (ny:290-301)") {
    val rows = Seq(
      ok("2024-03-04 00:00:00", "2024-03-04 00:59:59"),  // 59.98 min → 59
      ok("2024-03-04 01:00:00", "2024-03-05 00:59:00"),  // 1439 → kept
      ok("2024-03-04 02:00:00", "2024-03-05 02:00:00"))  // 1440 → dropped
    val out = StarSchema.transform(rawFrame(rows), "2024", "3")
      .select("trip_duration_minutes").collect().map(_.getLong(0)).sorted
    assert(out.toSeq === Seq(59L, 1439L))
  }

  test("quality filters: passenger 1..6, distance 5..500, fare > 0 (ny:273-277)") {
    val base = ok("2024-03-04 12:00:00", "2024-03-04 12:30:00")
    val rows = Seq(
      base,                                                   // kept
      base.copy(_2 = "2024-03-04 12:01:00", _3 = java.lang.Double.valueOf(0.0)),        // passenger 0
      base.copy(_2 = "2024-03-04 12:02:00", _3 = java.lang.Double.valueOf(7.0)),        // passenger 7
      base.copy(_2 = "2024-03-04 12:03:00", _3 = null.asInstanceOf[java.lang.Double]), // passenger null
      base.copy(_2 = "2024-03-04 12:04:00", _4 = 4.99),       // short trip
      base.copy(_2 = "2024-03-04 12:05:00", _4 = 500.01),     // long trip
      base.copy(_2 = "2024-03-04 12:06:00", _5 = 0.0),        // zero fare
      base.copy(_2 = "2024-03-04 12:07:00", _5 = -5.0),       // negative fare
      base.copy(_2 = "2024-03-04 12:08:00", _4 = 5.0),        // boundary kept
      base.copy(_2 = "2024-03-04 12:09:00", _4 = 500.0))      // boundary kept
    val out = StarSchema.transform(rawFrame(rows), "2024", "3")
    assert(out.count() === 3)
  }

  test("exact duplicate rows collapse (ny:271) and trip_id is deterministic") {
    val r = ok("2024-03-04 12:00:00", "2024-03-04 12:30:00")
    val out = StarSchema.transform(rawFrame(Seq(r, r, r)), "2024", "3")
    assert(out.count() === 1)
    val id1 = out.select("trip_id").head().getString(0)
    val id2 = StarSchema.transform(rawFrame(Seq(r)), "2024", "3")
      .select("trip_id").head().getString(0)
    assert(id1 === id2 && id1.length === 64)
  }

  test("airport_fee coalesces null to 0.0 and widens to double (ny:267)") {
    val rows = Seq(
      ok("2024-03-04 12:00:00", "2024-03-04 12:30:00"),
      ok("2024-03-04 13:00:00", "2024-03-04 13:30:00").copy(_7 = java.lang.Double.valueOf(1.25)))
    val out = StarSchema.transform(rawFrame(rows), "2024", "3")
    assert(out.schema("airport_fee").dataType === DoubleType)
    val fees = out.select("airport_fee").collect().map(_.getDouble(0)).sorted
    assert(fees.toSeq === Seq(0.0, 1.25))
  }

  test("observed pipeline: QC metrics resolve from the SAME job and match direct counts") {
    val raw = TaxiFixture.raw(spark, sf)
    val (fact, intake, output) = StarSchema.transformObserved(raw, "2024", "1")
    val shipped = fact.count() // one action resolves every observation
    val in = intake.get
    val out = output.get
    assert(in("n_rows") === raw.count())
    assert(out("n_rows") === shipped)
    assert(shipped === StarSchema.factTrips(spark, sf).count())
    // the intake-side drop-candidate counters match direct recomputation
    import org.apache.spark.sql.functions.col
    assert(in("n_nonpositive_fare") ===
      raw.filter(col("fare_amount") <= 0).count())
    assert(in("n_bad_passenger") ===
      raw.filter(col("passenger_count") < 1 || col("passenger_count") > 6).count())
    assert(in("n_bad_distance") ===
      raw.filter(col("trip_distance") < 5.0 || col("trip_distance") > 500.0).count())
    // the funnel is consistent: output can never exceed intake
    assert(out("n_rows").asInstanceOf[Long] <= in("n_rows").asInstanceOf[Long])
  }

  test("fact output has the 26 reference columns in order (ny:329-356)") {
    val out = StarSchema.factTrips(spark, sf)
    assert(out.columns.toSeq === StarSchema.factColumns)
    assert(out.count() > 0)
    // fixture sanity: every band appears
    val bands = StarSchema.bandSummary(spark, sf).collect().map(_.getString(0)).toSet
    assert(bands === Set("101", "102", "103"))
  }
}
