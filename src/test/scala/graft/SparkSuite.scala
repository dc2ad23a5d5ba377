package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session; suites run
  * in one forked JVM so getOrCreate dedupes).
  */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSuite.session
  val sf: String = "/root/testdata/sf0.001"
}

object SparkSuite {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true") // tolerate either events.ts footer era; Tables.events branches on loaded type
    .config("spark.sql.warehouse.dir", "target/spark-warehouse") // keep saveAsTable out of the repo root
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
