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

  /** The 7 FloatType fact columns (Cleanse.castMap) widened at the boundary,
    * plus total_amount — the registry's only DECIMAL(10,2) output column,
    * the same driver-serialization class as REAL (ADVICE r3): DECIMAL(10,2)
    * → DOUBLE is exact for |v| < 2^51, and both engines round the same
    * decimal to the same nearest double.
    */
  val realCols: Seq[String] = Seq(
    "trip_distance", "fare_amount", "extra", "mta_tax", "tip_amount",
    "improvement_surcharge", "congestion_surcharge", "total_amount")

  private def taxiFact(s: SparkSession, dir: String): DataFrame =
    StarSchema.factTrips(s, dir)
      .withColumns(realCols.map(c => c -> col(c).cast("double")).toMap)
      // trip_id (content hash of the natural key) + measure tiebreaks: the
      // order is deterministic unless two rows collide on natural key AND
      // both measures while differing elsewhere — dedup (A1) plus the
      // 256-bit hash makes that practically impossible, but it is not a
      // proven total order (ADVICE r3).
      .orderBy("trip_id", "trip_distance", "fare_amount")

  val registry: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "q_taxi_fact" -> ((taxiFact _, StarSchema.factSql)),
    "q_taxi_band_summary" -> ((StarSchema.bandSummary _, StarSchema.bandSummarySql))
  )
}
