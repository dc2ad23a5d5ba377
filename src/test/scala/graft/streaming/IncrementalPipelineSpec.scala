package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSuite
import graft.etl.{StarSchema, TaxiFixture}

/** The streaming wrapper must produce exactly the batch pipeline's output
  * when draining a directory of dropped files (SURVEY §2.9). The two drops
  * are DISJOINT slices (dedup is per micro-batch, as in the reference's
  * per-file job runs — cross-file duplicates are an operational re-drop
  * concern there too), so per-batch counts sum to the global batch count
  * however the source groups files into micro-batches.
  */
class IncrementalPipelineSpec extends SparkSuite {

  test("AvailableNow drain over dropped files matches the batch transform") {
    val inDir = Files.createTempDirectory("graft_stream_in").toString
    val ckDir = Files.createTempDirectory("graft_stream_ck").toString

    val raw = TaxiFixture.raw(spark, sf)
    // land each drop as a single FILE directly in the watched directory
    // (the source lists files, not nested dataset directories) — the same
    // shape as the reference's monthly S3 object drops
    def drop(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_drop").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      Files.move(part, java.nio.file.Paths.get(inDir, name))
    }
    drop(raw.filter(col("VendorID") <= 2), "yellow_tripdata_2024-01a.parquet")
    drop(raw.filter(col("VendorID") >= 3), "yellow_tripdata_2024-01b.parquet")
    val dropped = spark.read.parquet(s"$inDir/*.parquet")
    val expected = StarSchema.transform(dropped, "2024", "1").count()
    assert(expected > 0)

    var total = 0L
    var batches = 0
    IncrementalPipeline.runAvailableNow(
      spark, inDir, raw.schema, "2024", "1", ckDir) { fact =>
      total += fact.count()
      batches += 1
    }
    assert(batches >= 1)
    assert(total === expected)
  }

  test("streaming publish: foreachBatch appends each micro-batch to the JDBC warehouse") {
    // the stream-to-warehouse production pattern (reference: Job-2 publish,
    // pg:77-89, but fed continuously): each micro-batch of the incremental
    // pipeline appends to the target over JDBC; the checkpointed file log
    // makes a re-run a no-op, so the warehouse is not double-loaded
    val inDir = Files.createTempDirectory("graft_pub_in").toString
    val ckDir = Files.createTempDirectory("graft_pub_ck").toString
    val url = "jdbc:derby:memory:graftstreampub;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")

    val raw = TaxiFixture.raw(spark, sf)
    def drop(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_drop").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      Files.move(part, java.nio.file.Paths.get(inDir, name))
    }
    drop(raw.filter(col("VendorID") <= 2), "yellow_tripdata_2024-02a.parquet")
    val expected = StarSchema.transform(
      spark.read.parquet(s"$inDir/*.parquet"), "2024", "2").count()

    def publishRun(): Unit = IncrementalPipeline.runAvailableNow(
      spark, inDir, raw.schema, "2024", "2", ckDir) { fact =>
      // the fact frame publishes as-is: one JDBC connection per partition
      fact.write.mode(org.apache.spark.sql.SaveMode.Append)
        .jdbc(url, "fact_trips_stream", props)
    }
    publishRun()
    val inWarehouse = spark.read.jdbc(url, "fact_trips_stream", props).count()
    assert(inWarehouse === expected && expected > 0)
    // re-running against the same checkpoint reprocesses nothing
    publishRun()
    assert(spark.read.jdbc(url, "fact_trips_stream", props).count() === expected)
  }
}
