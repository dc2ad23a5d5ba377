package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (see /root/repo/TESTDATA.md).
  *
  * All loaders take the scale-factor directory so the same query code runs at
  * sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench). Parquet scans keep the
  * plan declarative so Catalyst pushes filters/column pruning into the scan —
  * at 100 TB the difference between a pruned and an unpruned scan is the whole
  * job.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** `events.ts` has shipped with two different parquet footers across
    * testdata generations: TIMESTAMP(MICROS) (current — loads natively as
    * TimestampType) and TIMESTAMP(NANOS) (older — Spark's reader rejects it
    * unless `spark.sql.legacy.parquet.nanosAsLong=true`, in which case it
    * loads as LongType nanos). Branch on the LOADED type rather than
    * hard-coding either generation: TimestampType passes through; LongType
    * is truncated to microseconds with integer division — exactly what
    * DuckDB does for TIMESTAMP_NS → TIMESTAMP, so both engines see
    * identical values either way.
    *
    * If the footer is NANOS and the session lacks the legacy conf, the
    * initial footer read throws; we then set the runtime-settable conf and
    * retry (the driver contract passes arbitrary sessions, so the loader
    * must self-heal rather than require() — ADVICE r2). Spark wraps
    * footer errors unpredictably (AnalysisException directly, or a
    * SparkException with the Illegal-Parquet-type text buried in the
    * cause chain), so rather than string-match messages at every level
    * the retry fires on ANY initial failure — the conf is runtime-
    * settable and harmless to micros-era files, and if NANOS wasn't the
    * problem the retry rethrows the ORIGINAL error (retry error attached
    * as suppressed) so the real cause isn't masked (ADVICE r7).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw =
      try load(spark, sfDir, "events")
      catch {
        case e: Exception =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          try load(spark, sfDir, "events")
          catch { case e2: Exception => e.addSuppressed(e2); throw e }
      }
    val tsCol = raw.schema("ts").dataType match {
      case LongType        => expr("timestamp_micros(ts div 1000)") // nanos-as-long era
      case TimestampType   => col("ts")                             // micros, UTC-adjusted
      // micros, no-UTC-flag footer: reinterpret the naive datetime in the
      // session zone so downstream instant functions (unix_micros,
      // windows, watermarks) keep working and the values match DuckDB's
      // naive read micro-for-micro. Sound ONLY in a UTC session — the
      // driver contract allows externally-built sessions, and a non-UTC
      // zone would silently shift every instant vs the oracle, so fail
      // loudly instead (ADVICE r7). All in-repo sessions pin UTC.
      case TimestampNTZType =>
        val tz = spark.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"events.ts is TIMESTAMP_NTZ: reinterpreting it requires " +
            s"spark.sql.session.timeZone=UTC, got '$tz' — set the session " +
            "zone to UTC (all graft mains do) before loading events")
        col("ts").cast(TimestampType)
      case other =>
        throw new IllegalStateException(
          s"events.ts loaded as unexpected type $other (expected long nanos or a timestamp type)")
    }
    raw.withColumn("ts", tsCol)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
