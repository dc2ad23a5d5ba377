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
}
