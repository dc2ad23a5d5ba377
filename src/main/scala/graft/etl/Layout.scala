package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Multi-dimensional data layout: Z-order (Morton) interleaving, the
  * write-time clustering that makes parquet min/max stats prune on TWO
  * dimensions at once. A table range-partitioned and sorted by one
  * column prunes scans filtered on that column only; laying files out
  * along the Z-curve keeps BOTH coordinates of each file's rows inside a
  * small bounding box, so a filter on either dimension (or both) skips
  * most files. This is the standard layout trick behind Delta/Iceberg
  * `ZORDER BY` — here as a plain column expression + `repartitionByRange`
  * so it composes with [[StarSchema.writeFact]]/[[Bucketing]] sinks.
  *
  * The interleave is pure closed-form bit arithmetic (shift/mask magic
  * spreading) — a narrow, codegen-friendly projection, no UDF, and
  * bit-identical in DuckDB (the SQL mirror emits the same shifts), so
  * layouts computed by different engines agree file-for-file.
  *
  * Scale (100 TB): `repartitionByRange` on the z-value is ONE range
  * exchange (sampled boundaries) at write time; reads then prune by
  * footer stats with zero runtime cost. The alternative — two separate
  * sorted copies of the table — doubles storage and write amplification.
  */
object Layout {

  /** Spread the low 8 bits of `c` to the even bit positions 0,2,…,14. */
  private def spread8(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(255L))
    val x1 = x0.bitwiseOR(shiftleft(x0, 4)).bitwiseAND(lit(0x0F0FL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 2)).bitwiseAND(lit(0x3333L))
    x2.bitwiseOR(shiftleft(x2, 1)).bitwiseAND(lit(0x5555L))
  }

  /** 16-bit Z-value interleaving the low 8 bits of two non-negative
    * dimensions: bit i of `a` lands at position 2i, bit i of `b` at
    * 2i+1. Callers bucket/mask wider domains down to 8 bits first —
    * the curve needs only enough resolution to separate files, not rows.
    */
  def zValue8(a: Column, b: Column): Column =
    spread8(a).bitwiseOR(shiftleft(spread8(b), 1))

  /** SQL mirror of [[spread8]]/[[zValue8]] (same shifts and masks, for
    * oracle parity and for engines consuming the layout contract as SQL).
    */
  private def spread8Sql(e: String): String = {
    val x0 = s"($e & 255)"
    val x1 = s"(($x0 | ($x0 << 4)) & 3855)"
    val x2 = s"(($x1 | ($x1 << 2)) & 13107)"
    s"(($x2 | ($x2 << 1)) & 21845)"
  }

  def zValue8Sql(a: String, b: String): String =
    s"(${spread8Sql(a)} | (${spread8Sql(b)} << 1))"

  /** Z-curve layout audit of the event stream along (user bucket,
    * day-of-month): each event's z-value, rolled up into 64 equal-width
    * curve segments with each segment's row count and its bounding box
    * in BOTH dimensions. Small boxes = the locality that makes file
    * skipping work; LayoutSpec quantifies it against the global extent
    * and asserts the range-partitioned write path plans a single range
    * exchange.
    */
  def qEventZorder(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(pmod(col("user_id"), lit(256L)).as("d1"),
        dayofmonth(col("ts")).cast("long").as("d2"))
      .select(col("d1"), col("d2"), zValue8(col("d1"), col("d2")).as("z"))
    ev.groupBy(shiftright(col("z"), 10).cast("int").as("z_segment"))
      .agg(count(lit(1)).as("n"),
        min(col("d1")).as("d1_lo"), max(col("d1")).as("d1_hi"),
        min(col("d2")).as("d2_lo"), max(col("d2")).as("d2_hi"))
      .orderBy(col("z_segment"))
  }

  val qEventZorderSql: String = {
    val z = zValue8Sql("(user_id % 256)", "CAST(date_part('day', ts) AS BIGINT)")
    s"""WITH ev AS (
       |  SELECT (user_id % 256) AS d1,
       |    CAST(date_part('day', ts) AS BIGINT) AS d2,
       |    $z AS z
       |  FROM events
       |)
       |SELECT CAST(z // 1024 AS INTEGER) AS z_segment, count(*) AS n,
       |  min(d1) AS d1_lo, max(d1) AS d1_hi,
       |  min(d2) AS d2_lo, max(d2) AS d2_hi
       |FROM ev GROUP BY z_segment ORDER BY z_segment""".stripMargin
  }

  val registry: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "q_event_zorder" -> ((qEventZorder _, qEventZorderSql))
  )
}
