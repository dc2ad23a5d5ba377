package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The V2 source's whole contract: values parity with the engine-native
  * generator, range pushdown visible in the planned scan (bounds tightened
  * BEFORE row generation), column pruning down to the probed subset,
  * residual predicates left to Spark, and the slice count = scan
  * parallelism.
  */
class SeqSourceSpec extends SparkSuite {

  private def scanOf(df: org.apache.spark.sql.DataFrame): SeqScan =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.asInstanceOf[SeqScan]
    }.head

  test("values equal spark.range; both columns faithful") {
    val out = SeqSource.read(spark, 5L, 1000L, 4)
    val expected = spark.range(5L, 1000L)
      .select(col("id").as("n"))
    assert(out.select("n").except(expected).isEmpty)
    assert(expected.except(out.select("n")).isEmpty)
    assert(out.count() === 995L)
    out.limit(3).collect().foreach { r =>
      assert(r.getAs[String]("n_str") === SeqSource.nStr(r.getAs[Long]("n")))
    }
  }

  test("range predicates tighten the scan bounds; residuals stay with Spark") {
    val df = SeqSource.read(spark, 0L, 100000L, 8)
      .filter(col("n") >= 20000L && col("n") < 60000L && col("n") % 2 === 0)
      .select("n")
    val scan = scanOf(df)
    // bounds reached the source: the scan description carries [20000, 60000)
    assert(scan.description().contains("[20000, 60000)"), scan.description())
    // parity residual did NOT get consumed: the scan emits odd n too,
    // Spark filters them — total scanned = 40000, surviving = 20000
    assert(df.count() === 20000L)
    val noResidual = SeqSource.read(spark, 0L, 100000L, 8)
      .filter(col("n") >= 20000L && col("n") < 60000L).select("n")
    assert(noResidual.count() === 40000L)
    // an impossible range collapses to an empty scan, zero partitions read
    val empty = SeqSource.read(spark, 0L, 100000L, 8)
      .filter(col("n") >= 70000L && col("n") < 60000L).select("n")
    assert(empty.count() === 0L)
  }

  test("column pruning reaches the reader; equality pushdown; slice parallelism") {
    val df = SeqSource.read(spark, 0L, 10000L, 6).select("n")
    assert(scanOf(df).readSchema().fieldNames.toSeq === Seq("n"))
    assert(df.rdd.getNumPartitions === 6)
    val eq = SeqSource.read(spark, 0L, 10000L, 6).filter(col("n") === 4321L)
    assert(scanOf(eq.select("n")).description().contains("[4321, 4322)"))
    assert(eq.collect().map(_.getAs[Long]("n")).toSeq === Seq(4321L))
    // fewer rows than slices: partition count degrades gracefully
    val tiny = SeqSource.read(spark, 0L, 3L, 8).select("n")
    assert(tiny.rdd.getNumPartitions === 3)
    assert(tiny.collect().map(_.getLong(0)).sorted.toSeq === Seq(0L, 1L, 2L))
  }
}
