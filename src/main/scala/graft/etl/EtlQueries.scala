package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-facing registry for the Job-1 ETL surface (oracle-checked). */
object EtlQueries {
  val registry: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q_taxi_fact" -> ((
      (s: SparkSession, dir: String) =>
        StarSchema.factTrips(s, dir).orderBy("trip_id"),
      StarSchema.factSql)),
    "q_taxi_band_summary" -> ((StarSchema.bandSummary _, StarSchema.bandSummarySql))
  )
}
