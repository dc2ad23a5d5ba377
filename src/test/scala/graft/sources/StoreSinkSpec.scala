package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.WriterCommitMessage
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSuite

/** The DSv2 WRITE path must give exactly-once through Spark's committer
  * interface: uncommitted attempt files are invisible (the manifest
  * alone gates visibility — there is no rename pass), aborts at either
  * level leave the table byte-identical, a re-delivered `commit`
  * publishes no duplicate rows, and the manifest's recorded statistics
  * make a small read-back plan as the broadcast side.
  */
class StoreSinkSpec extends SparkSuite {

  private def freshDir(): String =
    Files.createTempDirectory("graft_store").toString + "/t"

  private def rows(dir: String): Set[(Long, Option[String], Double)] =
    StoreSource.read(spark, dir).collect().map { r =>
      (r.getLong(0), Option(r.getString(1)), r.getDouble(2))
    }.toSet

  private def dataFiles(dir: String): Seq[String] = {
    val d = new java.io.File(s"$dir/data")
    if (!d.exists()) Seq.empty
    else d.listFiles().map(_.getName).filterNot(n =>
      n.startsWith(".") || n.startsWith("_")).toSeq
  }

  private val spark0 = SparkSuite.session
  import spark0.implicits._

  // the "\u0000N" payload is the regression for the r14 advice: the old
  // TSV codec used exactly that byte sequence as its NULL sentinel, so a
  // user string equal to it silently round-tripped as NULL; the parquet
  // codec has native nulls and no sentinel to collide with
  private def fixture = Seq(
    (1L, Some("plain"), 1.5),
    (2L, Some("tab\tand\nnewline and back\\slash"), -0.25),
    (3L, None, 0.0),
    (4L, Some("\u0000N"), 4.0)).toDF("k", "s", "x")

  test("append through the committer roundtrips typed rows; second append accumulates") {
    val dir = freshDir()
    StoreSource.write(fixture, dir)
    assert(rows(dir) === Set(
      (1L, Some("plain"), 1.5),
      (2L, Some("tab\tand\nnewline and back\\slash"), -0.25),
      (3L, None, 0.0),
      (4L, Some("\u0000N"), 4.0)))
    StoreSource.write(Seq((5L, Some("more"), 9.0)).toDF("k", "s", "x"), dir)
    assert(rows(dir).map(_._1) === Set(1L, 2L, 3L, 4L, 5L))
    // column pruning reaches the scan
    val pruned = StoreSource.read(spark, dir).select(col("k"))
    pruned.collect()
    val desc = pruned.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.description()
    }.mkString
    assert(desc.contains("cols=k") && !desc.contains("s,"),
      s"reader must prune to the projected column: $desc")
  }

  test("uncommitted attempt files are invisible; job abort publishes nothing and sweeps them") {
    val dir = freshDir()
    StoreSource.write(fixture, dir)
    val before = rows(dir)

    val schema = StoreSource.read(spark, dir).schema
    val bw = new StoreWriteBuilder(dir, schema, "qabort").build().toBatch
    val w = bw.createBatchWriterFactory(null).createWriter(0, 7L)
    w.write(InternalRow.fromSeq(Seq(99L, UTF8String.fromString("ghost"), 1.0)))
    val msg = w.commit()
    // task committed, job NOT: the file sits in data/ but no manifest
    // names it — invisible without any staging indirection
    assert(dataFiles(dir).exists(_.startsWith("qabort-")),
      "the attempt file is written directly under data/")
    assert(rows(dir) === before, "unmanifested rows must be invisible")
    bw.abort(Array(msg))
    assert(rows(dir) === before, "job abort must publish nothing")
    assert(!dataFiles(dir).exists(_.startsWith("qabort-")),
      "job abort must sweep the query's attempt files")
  }

  test("job commit is atomic and a re-delivered commit is idempotent") {
    val dir = freshDir()
    StoreSource.write(fixture, dir)
    val before = rows(dir)

    val schema = StoreSource.read(spark, dir).schema
    val bw = new StoreWriteBuilder(dir, schema, "qtwice").build().toBatch
    val w = bw.createBatchWriterFactory(null).createWriter(0, 11L)
    w.write(InternalRow.fromSeq(Seq(50L, UTF8String.fromString("once"), 2.0)))
    val msg = w.commit()
    bw.commit(Array[WriterCommitMessage](msg))
    val after = rows(dir)
    assert(after === before + ((50L, Some("once"), 2.0)))
    // a re-delivered job commit (driver retry after a commit-ack loss)
    bw.commit(Array[WriterCommitMessage](msg))
    assert(rows(dir) === after, "re-commit must not duplicate rows")
    val all = StoreSource.read(spark, dir).collect()
    assert(all.length === all.map(_.getLong(0)).distinct.length)
  }

  test("task abort deletes its attempt file; speculative losing attempt never publishes") {
    val dir = freshDir()
    StoreSource.write(fixture, dir)
    val before = rows(dir)
    val schema = StoreSource.read(spark, dir).schema

    // task-level abort
    val bwA = new StoreWriteBuilder(dir, schema, "qtask").build().toBatch
    val wA = bwA.createBatchWriterFactory(null).createWriter(0, 3L)
    wA.write(InternalRow.fromSeq(Seq(77L, UTF8String.fromString("dead"), 0.5)))
    wA.abort()
    assert(rows(dir) === before)
    assert(!dataFiles(dir).exists(_.startsWith("qtask-")))

    // speculation: two attempts of partition 0; only the winner's message
    // reaches job commit; the loser's attempt file dies with the sweep
    val bw = new StoreWriteBuilder(dir, schema, "qspec").build().toBatch
    val fac = bw.createBatchWriterFactory(null)
    val w1 = fac.createWriter(0, 100L)
    val w2 = fac.createWriter(0, 101L)
    val row = InternalRow.fromSeq(Seq(60L, UTF8String.fromString("winner"), 3.0))
    w1.write(row); w2.write(row)
    val winner = w1.commit()
    val loser = w2.commit() // closes its file; message never reaches commit
    assert(loser != null)
    bw.commit(Array[WriterCommitMessage](winner))
    assert(rows(dir) === before + ((60L, Some("winner"), 3.0)),
      "exactly one copy of the speculated partition must publish")
    assert(dataFiles(dir).count(_.startsWith("qspec-")) === 1,
      "the losing attempt's file must be swept at job commit")
  }

  test("two independent job commits both publish; the later manifest carries the earlier files") {
    val dir = freshDir()
    StoreSource.write(fixture, dir)
    val before = rows(dir)
    val schema = StoreSource.read(spark, dir).schema
    val bw1 = new StoreWriteBuilder(dir, schema, "qc1").build().toBatch
    val bw2 = new StoreWriteBuilder(dir, schema, "qc2").build().toBatch
    val w1 = bw1.createBatchWriterFactory(null).createWriter(0, 1L)
    val w2 = bw2.createBatchWriterFactory(null).createWriter(0, 2L)
    w1.write(InternalRow.fromSeq(Seq(201L, UTF8String.fromString("a"), 1.0)))
    w2.write(InternalRow.fromSeq(Seq(202L, UTF8String.fromString("b"), 2.0)))
    val (m1, m2) = (w1.commit(), w2.commit())
    bw1.commit(Array[WriterCommitMessage](m1))
    bw2.commit(Array[WriterCommitMessage](m2))
    assert(rows(dir) ===
      before + ((201L, Some("a"), 1.0)) + ((202L, Some("b"), 2.0)),
      "the second job's manifest must merge, not shadow, the first's")
  }

  test("vacuum retains the newest manifests and collects aged stranded files; in-flight files survive") {
    val dir = freshDir()
    StoreSource.write(fixture, dir)
    StoreSource.write(Seq((10L, Some("x"), 1.0)).toDF("k", "s", "x"), dir)
    StoreSource.write(Seq((11L, Some("y"), 2.0)).toDF("k", "s", "x"), dir)
    val before = rows(dir)
    def manifests() = new java.io.File(s"$dir/manifest").listFiles()
      .count(_.getName.startsWith("v="))
    assert(manifests() === 3)
    // strand a data file no manifest references (a lost publish race),
    // AGED past the live manifest — collection is age-gated, so only a
    // file older than every retained manifest is a collectible orphan
    val orphan = new java.io.File(s"$dir/data/stranded.parquet")
    val w = new java.io.PrintWriter(orphan); w.println("x"); w.close()
    assert(orphan.setLastModified(System.currentTimeMillis() - 3600000L))
    // an IN-FLIGHT commit's file (newer than the live manifest, not yet
    // manifested) must SURVIVE vacuum — deleting it would leave the
    // about-to-publish manifest pointing at nothing (the r14 advice race)
    val inflight = new java.io.File(s"$dir/data/qlive-p0-a9.parquet")
    val w2 = new java.io.PrintWriter(inflight); w2.println("y"); w2.close()
    assert(inflight.setLastModified(System.currentTimeMillis() + 60000L))

    val (droppedManifests, collected) = StoreSource.vacuum(dir, keep = 1)
    assert(droppedManifests === 2 && collected === 1)
    assert(!orphan.exists())
    assert(inflight.exists(), "vacuum must spare files newer than the live manifest")
    assert(manifests() === 1)
    assert(rows(dir) === before, "vacuum must not change what readers see")
    // the store keeps working after maintenance
    StoreSource.write(Seq((12L, Some("z"), 3.0)).toDF("k", "s", "x"), dir)
    assert(rows(dir) === before + ((12L, Some("z"), 3.0)))
    inflight.delete()
  }

  test("schema is pinned at first commit; a mismatched append is rejected") {
    val dir = freshDir()
    StoreSource.write(fixture, dir)
    val bad = Seq((1L, 2L)).toDF("k", "wrong")
    intercept[Exception] { StoreSource.write(bad, dir) }
    assert(rows(dir).size === 4, "the rejected write must not publish")
  }

  test("manifest zone maps prune whole files at plan time; residual filters keep correctness") {
    val dir = freshDir()
    // four commits, each a contiguous key range -> tight per-file stats
    (0 until 4).foreach { i =>
      StoreSource.write(
        spark.range(i * 1000L, (i + 1) * 1000L)
          .select(col("id").as("k"),
            concat(lit("s"), col("id")).as("s"),
            (col("id") * 0.5).as("x")), dir)
    }
    val m = StoreSource.latestManifest(dir)
    assert(m.entries.nonEmpty && m.entries.forall(_.stats.contains("k")),
      "every committed file must carry its integral zone map")
    val total = m.entries.length

    def scanDesc(df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case b: BatchScanExec => b.scan.description()
      }.mkString
    }
    // ground truth from the manifest itself
    val expectSurvivors = m.entries.count { e =>
      val (lo, hi) = e.stats("k"); hi >= 2500L && lo <= 3499L
    }
    assert(expectSurvivors < total, "fixture must make pruning possible")
    val filtered = StoreSource.read(spark, dir)
      .filter(col("k") >= 2500L && col("k") < 3500L)
    assert(filtered.count() === 1000L, "pruning must never change results")
    assert(scanDesc(filtered).contains(s"files=$expectSurvivors/$total"),
      s"the scan must plan exactly the zone-map survivors: ${scanDesc(filtered)}")
    // red control: the unfiltered read plans every file
    val all = StoreSource.read(spark, dir)
    assert(scanDesc(all).contains(s"files=$total/$total"))
    // a proven-empty predicate plans zero files and returns zero rows
    val none = StoreSource.read(spark, dir).filter(col("k") > 100000L)
    assert(none.count() === 0L)
    assert(scanDesc(none).contains(s"files=0/$total"))
    // non-integral predicates prune nothing but still filter correctly
    val str = StoreSource.read(spark, dir).filter(col("s") === "s42")
    assert(str.count() === 1L)
    assert(scanDesc(str).contains(s"files=$total/$total"))
  }

  test("manifest statistics make a small store read-back the broadcast side of a join") {
    val dir = freshDir()
    StoreSource.write(fixture, dir)
    // exact stats from the manifest
    val m = StoreSource.latestManifest(dir)
    assert(m.entries.map(_.rows).sum === 4L)
    assert(m.entries.forall(_.bytes > 0L))
    // a few-KB committed table joined against a larger frame: the stats
    // report a sub-threshold size, so the planner must choose broadcast
    // with the STORE as the build side — the rung that makes a custom
    // connector plan like a stats-bearing parquet table
    val big = spark.range(0L, 50000L).withColumnRenamed("id", "k")
    val joined = big.join(StoreSource.read(spark, dir), "k")
    assert(joined.count() === 4L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"store side must broadcast from manifest stats:\n$plan")
  }
}
