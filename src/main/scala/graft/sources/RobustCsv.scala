package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Robust file ingest: schema-enforced CSV reading that QUARANTINES
  * malformed records instead of silently dropping or crashing on them —
  * the ingest-edge discipline the reference's `spark.read` of raw
  * monthly drops (ny:232) leaves to luck. A 100 TB backfill WILL contain
  * truncated lines, type garbage, and column drift; the contract a
  * production pipeline needs is "every input row is either parsed or
  * explained", which is exactly what PERMISSIVE mode + a corrupt-record
  * column provides at zero extra passes (the parser tags rows as it
  * reads; no validation re-scan).
  *
  * Scale: parsing is per-partition narrow work; the good/bad split is
  * two filters over one cached parse (the cache is REQUIRED — Spark
  * refuses a query whose only referenced column is the internal
  * corrupt-record column, and without it the two branches would re-parse
  * the file). Quarantined raw lines go to a dead-letter sink for replay
  * after the schema fix — never back into the good path.
  */
object RobustCsv {

  val corruptCol = "_corrupt_record"

  /** Parse `path` against `schema`; returns (good rows — fully typed,
    * corrupt column dropped; quarantine — the raw text of every
    * malformed line). A row is malformed if it fails type conversion or
    * its token count deviates from the schema in EITHER direction (both
    * short and long rows quarantine — the parsed side still carries the
    * null-padded partial parse, but the raw line is preserved for
    * replay).
    */
  def readWithQuarantine(spark: SparkSession, path: String,
      schema: StructType, header: Boolean = true): (DataFrame, DataFrame) = {
    val raw = spark.read
      .schema(schema.add(corruptCol, StringType))
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path)
      .cache()
    val good = raw.filter(col(corruptCol).isNull).drop(corruptCol)
    val quarantine = raw.filter(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("raw_line"))
    (good, quarantine)
  }
}
