package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.WriterCommitMessage
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSuite

/** STREAMING writes through the store's DSv2 committer
  * (`TableCapability.STREAMING_WRITE`): epoch-id-keyed commits must be
  * idempotent — Spark's micro-batch engine re-commits the last committed
  * epoch after a restart by documented contract — and an epoch whose
  * data files were written but never committed must stay invisible until
  * its retry commits exactly once. This is the committer-protocol form
  * of the exactly-once laws the engine's `foreachBatch` appenders get
  * from the StreamState marker (IncrementalPipelineSpec E58).
  */
class StoreStreamSpec extends SparkSuite {

  private val spark0 = SparkSuite.session
  import spark0.implicits._

  private def freshDir(pfx: String): String =
    Files.createTempDirectory(pfx).toString + "/t"

  private val schema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true)))

  private def drop(inDir: String, name: String, rows: Seq[(Long, String)]): Unit = {
    val tmp = Files.createTempDirectory("graft_drop").toString
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get.toPath
    Files.move(part, java.nio.file.Paths.get(inDir, name))
  }

  private def ids(dir: String): Seq[Long] =
    StoreSource.read(spark, dir).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSeq.sorted

  test("writeStream through the committer: drains append exactly once; a forced epoch replay is a no-op") {
    val inDir = freshDir("graft_ssw_in").stripSuffix("/t")
    val ckDir = freshDir("graft_ssw_ck").stripSuffix("/t")
    val store = freshDir("graft_ssw_store")

    def drain(): Unit = {
      val q = spark.readStream.schema(schema).parquet(inDir)
        .withColumn("text", upper(col("text")))
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckDir)
        .option("path", store)
        .option("streamId", "s1")
        .format(classOf[StoreTableProvider].getName)
        .start()
      q.awaitTermination()
    }

    drop(inDir, "a.parquet", Seq(1L -> "alpha", 2L -> "beta"))
    drain()
    assert(ids(store) === Seq(1L, 2L))
    assert(StoreSource.read(spark, store).filter(col("text") === "ALPHA").count() === 1L,
      "the stream transform must apply before the sink")

    drop(inDir, "b.parquet", Seq(3L -> "gamma"))
    drain()
    assert(ids(store) === Seq(1L, 2L, 3L))

    // re-drain with no new input: checkpoint no-op
    drain()
    assert(ids(store) === Seq(1L, 2L, 3L))

    // CRASH SIMULATION: delete the newest commit-log entry, so the next
    // run believes the last epoch never committed and RE-RUNS it against
    // the same source offsets — the re-delivered epoch commit must be
    // recognized by its epoch key and publish no duplicate rows
    val commits = new java.io.File(s"$ckDir/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.nonEmpty)
    // delete the marker AND its checksum sibling — local FS keeps a
    // .N.crc whose leftover would block the replay's own commit rename
    val crc = new java.io.File(commits.last.getParentFile,
      s".${commits.last.getName}.crc")
    if (crc.exists()) crc.delete()
    assert(commits.last.delete())
    drain()
    assert(ids(store) === Seq(1L, 2L, 3L),
      "a replayed epoch must not double-publish")
    // and the replay's duplicate attempt files must not linger past sweep
    val leftovers = new java.io.File(s"$store/data").listFiles()
      .map(_.getName).filterNot(n => n.startsWith(".") || n.startsWith("_"))
    assert(leftovers.toSet ===
      StoreSource.latestManifest(store).entries.map(_.name).toSet,
      "every surviving data file is manifest-referenced")
  }

  test("StreamingWrite epochs: re-commit is a no-op; an uncommitted epoch is invisible until its retry commits once") {
    val store = freshDir("graft_ssw_direct")
    val sw = new StoreWriteBuilder(store, schema, "wq", Some("sX"), None)
      .build().toStreaming

    def writeEpochRows(epoch: Long, attempt: Long,
        rows: Seq[(Long, String)]): WriterCommitMessage = {
      val w = sw.createStreamingWriterFactory(null).createWriter(0, attempt, epoch)
      rows.foreach { case (id, t) =>
        w.write(InternalRow.fromSeq(Seq(id, UTF8String.fromString(t))))
      }
      w.commit()
    }

    // epoch 0 commits
    sw.commit(0L, Array(writeEpochRows(0L, 1L, Seq(10L -> "a", 11L -> "b"))))
    assert(ids(store) === Seq(10L, 11L))

    // epoch 1's data is WRITTEN but the job dies before commit: invisible
    val orphanMsg = writeEpochRows(1L, 2L, Seq(12L -> "c"))
    assert(orphanMsg != null)
    assert(ids(store) === Seq(10L, 11L), "an uncommitted epoch must stay invisible")

    // retry of epoch 1 (new attempt) commits exactly once
    sw.commit(1L, Array(writeEpochRows(1L, 3L, Seq(12L -> "c"))))
    assert(ids(store) === Seq(10L, 11L, 12L))

    // re-delivered commit of epoch 1 (restart replay, yet another attempt)
    sw.commit(1L, Array(writeEpochRows(1L, 4L, Seq(12L -> "c"))))
    assert(ids(store) === Seq(10L, 11L, 12L),
      "a re-committed epoch must not double-publish")

    // the replayed attempt's file was dropped, not published
    val referenced = StoreSource.latestManifest(store).entries.map(_.name).toSet
    val onDisk = new java.io.File(s"$store/data").listFiles()
      .map(_.getName).filterNot(n => n.startsWith(".") || n.startsWith("_")).toSet
    assert((onDisk -- referenced).forall(_.contains("-e1-")),
      s"only epoch-1 orphans may remain for vacuum: ${onDisk -- referenced}")
  }

  test("writeEpoch (foreachBatch form): same (streamId, epoch) twice publishes once; epochs are independent per stream id") {
    val store = freshDir("graft_ssw_fb")
    val b0 = Seq(1L -> "x", 2L -> "y").toDF("doc_id", "text")
    StoreSource.writeEpoch(b0, store, "door", 0L)
    StoreSource.writeEpoch(b0, store, "door", 0L) // batch retry after crash
    assert(ids(store) === Seq(1L, 2L), "a retried micro-batch must be a no-op")

    StoreSource.writeEpoch(Seq(3L -> "z").toDF("doc_id", "text"), store, "door", 1L)
    assert(ids(store) === Seq(1L, 2L, 3L))

    // a DIFFERENT stream id owns its own epoch counter
    StoreSource.writeEpoch(Seq(4L -> "w").toDF("doc_id", "text"), store, "other", 0L)
    assert(ids(store) === Seq(1L, 2L, 3L, 4L))
  }
}
