package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Driver-facing registry for the Job-1 ETL surface (oracle-checked).
  *
  * Oracle-boundary note (round-2 lesson, mirror of round-1's decimal one):
  * the pipeline keeps the reference's FloatType for the money/distance
  * columns (ny:250-267), but parquet float32 and DuckDB's widened-double
  * fetch serialize the same value differently through the driver's hash
  * (e.g. 5.4f → "5.4" vs "5.400000095367432"). The q_taxi_fact WRAPPER
  * therefore widens the 7 REAL columns to DOUBLE — float→double widening
  * is exact and identical in both engines — while the pipeline itself
  * stays float for reference parity. [[StarSchema.factSql]] applies the
  * same CAST(... AS DOUBLE) on the oracle side.
  */
object EtlQueries {

  /** The 7 FloatType fact columns (Cleanse.castMap) widened at the boundary. */
  val realCols: Seq[String] = Seq(
    "trip_distance", "fare_amount", "extra", "mta_tax", "tip_amount",
    "improvement_surcharge", "congestion_surcharge")

  private def taxiFact(s: SparkSession, dir: String): DataFrame =
    StarSchema.factTrips(s, dir)
      .withColumns(realCols.map(c => c -> col(c).cast("double")).toMap)
      // total-order output: trip_id is a content hash of the natural key;
      // the measure tiebreaks make the order deterministic even if two
      // distinct rows ever shared a natural key (ADVICE r2).
      .orderBy("trip_id", "trip_distance", "fare_amount")

  val registry: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "q_taxi_fact" -> ((taxiFact _, StarSchema.factSql)),
    "q_taxi_band_summary" -> ((StarSchema.bandSummary _, StarSchema.bandSummarySql))
  )
}
