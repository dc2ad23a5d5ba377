package graft.etl

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lower}

/** Job-2 analog (SURVEY §3 E3, pg:22-92): publish the star schema from the
  * session catalog to an external JDBC warehouse.
  *
  *   - Per dim (pg:60-74): probe the target for the table (S7 — the probe
  *     SELECT executes INSIDE the target database via the
  *     subquery-as-table idiom), create it only if absent (K2). The
  *     reference does the existence check row-at-a-time in driver code;
  *     [[missingDims]] also exposes the SET-wise version — a left-anti
  *     join of the dim list against the target's table listing — which is
  *     the Spark-native shape of the same logic (SURVEY §2.5).
  *   - Fact (pg:77-89): read back from the catalog (S6), filter to ONE
  *     (year, month) partition (F5 — a partition-column filter, so the
  *     scan prunes to a single directory: the month-granular access
  *     pattern that keeps a 100 TB fact publishable), append (K3).
  *
  * The probe SQL is pluggable because system-catalog names differ per
  * target (`pg_catalog.pg_tables` on Postgres, `SYS.SYSTABLES` on the
  * Derby used in tests); credentials/config arrive via `Properties`, the
  * local stand-in for the reference's Secrets Manager lookup (pg:22-36 —
  * intentionally not emulated, SURVEY §7.4).
  *
  * Scale notes: dims are constant-size (single-digit MB) — their publish
  * is negligible; the fact append is one pruned partition streamed over
  * parallel JDBC connections (one per Spark partition) — `numPartitions`
  * in `props` caps target-side connection fan-in.
  */
object Publish {

  /** Dim tables of the schema, publish order per pg:44-59. */
  val dimTables: Seq[String] = Seq(
    "dim_vendors", "dim_ratecode", "dim_store_and_fwd_flag",
    "dim_payment_type", "dim_trip_peak_band", "dim_date", "dim_time",
    "dim_taxi_zone_lookup")

  /** Catalog database guard (ny:37-57 `check_db_exists` /
    * `create_db_if_not_exists`): probe the session catalog for `db`,
    * create it only if absent. Returns true iff it created — the same
    * probe-then-create contract as [[publishDimIfAbsent]], at database
    * granularity. The reference does this against the Glue Data Catalog;
    * `spark.catalog` is the session-catalog equivalent (Glue IS a Spark
    * catalog implementation on EMR/Glue, so the call is the same there).
    */
  def ensureDatabase(spark: SparkSession, db: String): Boolean = {
    val exists = spark.catalog.databaseExists(db)
    if (!exists) spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    !exists
  }

  /** Ensure the database of a possibly qualified table name exists, so
    * catalog sinks ([[StarSchema.writeFact]], [[Bucketing.writeBucketed]])
    * can target `db.table` (or `catalog.db.table`) without a manual
    * CREATE DATABASE step. The database is the second-to-last name part,
    * resolved with the session's SQL parser so backtick quoting is honored
    * — a naive split('.') would carve a quoted identifier like
    * {{{`my.db`.tbl}}} at the wrong dot and guard a spurious database.
    * Unqualified names target the current database — nothing to guard.
    */
  def ensureDatabaseOf(spark: SparkSession, table: String): Unit = {
    val parts = org.apache.spark.sql.graft.Bridge.parseMultipartIdentifier(spark, table)
    if (parts.length >= 2) {
      val db = parts(parts.length - 2)
      if (db.nonEmpty) ensureDatabase(spark, db)
    }
  }

  /** S7 existence probe: returns true iff `table` exists target-side.
    * `probeSql(table)` must be a subquery returning ≥1 row iff present.
    */
  def tableExists(spark: SparkSession, url: String, props: Properties,
      probeSql: String => String): String => Boolean =
    table => spark.read.jdbc(url, probeSql(table), props).count() > 0

  /** Set-wise version of the reference's per-dim loop: which dims are NOT
    * yet in the target listing (left-anti join, SURVEY §2.5). Compared
    * case-insensitively: SQL targets case-fold unquoted identifiers
    * (Derby upper-cases, Postgres lower-cases), so the catalog listing
    * never matches our lowercase names literally.
    */
  def missingDims(spark: SparkSession, targetTables: DataFrame): DataFrame = {
    import spark.implicits._
    val target = targetTables.toDF("t_name")
      .select(lower(col("t_name")).as("table_name_ci"))
    dimTables.toDF("table_name")
      .join(target, lower(col("table_name")) === col("table_name_ci"), "left_anti")
  }

  /** Publish one dim if absent (pg:60-74): probe → create. Returns true if
    * it wrote.
    */
  def publishDimIfAbsent(spark: SparkSession, name: String, dim: => DataFrame,
      url: String, props: Properties, probeSql: String => String): Boolean = {
    val exists = tableExists(spark, url, props, probeSql)(name)
    if (!exists) dim.write.jdbc(url, name, props) // K2
    !exists
  }

  /** Publish one (year, month) fact partition (pg:77-89): catalog read →
    * partition-pruned filter → JDBC append.
    */
  def publishFactMonth(spark: SparkSession, catalogTable: String,
      year: String, month: String, url: String, targetTable: String,
      props: Properties): Long = {
    val part = spark.table(catalogTable) // S6
      .filter(col("processed_year") === year && col("processed_month") === month) // F5
    // persist so count + write share ONE pruned scan — and so the reported
    // row count is exactly what was appended even if the catalog partition
    // gains rows concurrently (imperative method, so unpersist is possible
    // here unlike in the lazy query registry)
    part.persist()
    try {
      val n = part.count()
      part.write.mode(SaveMode.Append).jdbc(url, targetTable, props) // K3
      n
    } finally part.unpersist()
  }
}
