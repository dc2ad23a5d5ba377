package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed catalog sinks for co-located joins — the write-time half of
  * the 100 TB shuffle story. A shuffle join moves BOTH sides over the
  * network every time it runs; bucketing pays that cost ONCE at write
  * time (`bucketBy` hashes rows into a fixed bucket count, `sortBy`
  * pre-sorts within buckets), after which every join/aggregation keyed on
  * the bucket column plans with ZERO Exchange — each task reads matching
  * bucket files from both sides. At fact-table scale this turns the
  * recurring dominant cost of fact×fact joins into a one-time load cost.
  *
  * The reference has no bucketing (Glue catalog writes are
  * partition-only, ny:358-371); this is north-star surface alongside the
  * partitioned sink (K1, [[StarSchema.writeFact]]). Both compose:
  * `partitionBy` prunes which data is read, `bucketBy` removes the
  * shuffle on what remains.
  *
  * Constraints worth knowing at scale: both join sides need the SAME
  * bucket count (or a divisor, with `spark.sql.bucketing.coalesceBucketsInJoin`),
  * and bucket counts should be sized so one bucket ≈ one healthy task
  * (`rows / nBuckets` fitting executor memory).
  */
object Bucketing {

  /** Write `df` into the session catalog bucketed (and sorted) by `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit = {
    Publish.ensureDatabaseOf(df.sparkSession, table) // ny:37-57 guard
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Equi-join two catalog tables on `leftKey = rightKey`. When both were
    * written with [[writeBucketed]] on those keys with equal bucket
    * counts, the plan contains no shuffle on either side.
    */
  def coLocatedJoin(
      spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
