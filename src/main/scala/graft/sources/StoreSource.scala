package graft.sources

import java.util
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 WRITE path — the sink half of the connector
  * ladder the read rungs (E144, [[SeqSource]]) left open: a
  * manifest-committed append-only store driven through Spark's OWN
  * committer interface (`SupportsWrite` → `WriteBuilder` → `Write` →
  * `BatchWrite` → `DataWriterFactory` → `DataWriter`), so exactly-once
  * comes from the engine's commit protocol rather than from the
  * path-convention marker the streaming appenders use.
  *
  * Commit protocol (StoreSinkSpec proves each leg):
  *   - every task writer streams its rows to a STAGING file
  *     (`_staging/<queryId>/…`, invisible to every reader) and its
  *     task-level `commit()` returns the staged path + the
  *     DETERMINISTIC final name derived from (queryId, partition,
  *     attempt-independent) — Spark's commit coordinator guarantees at
  *     most one committed message per partition, so speculative
  *     duplicates die in staging;
  *   - job-level `commit(messages)` moves each staged file into
  *     `data/` (a move that already happened is skipped — that is what
  *     makes RE-commit idempotent) and then publishes a NEW MANIFEST
  *     VERSION (`manifest/v=<n>`, temp-file + atomic rename) listing
  *     every visible data file. Readers resolve the highest manifest —
  *     a batch becomes visible in one rename, never row by row;
  *   - job-level `abort(messages)` deletes the query's staging dir and
  *     publishes nothing: the previous manifest keeps serving exactly
  *     the pre-job rows.
  *
  * Scale (100 TB): one data file per task, one manifest line per file —
  * the commit is metadata-scale however large the rows; reads plan one
  * partition per file with column pruning at the parse
  * (`SupportsPushDownRequiredColumns`). Row encoding is a typed,
  * escaped TSV (long/int/double/boolean/string) — the format is the
  * demonstration vehicle; the committer protocol is the point.
  */
object StoreSource {

  def write(df: DataFrame, dir: String): Unit =
    df.write.format(classOf[StoreTableProvider].getName)
      .option("path", dir).mode("append").save()

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.format(classOf[StoreTableProvider].getName)
      .option("path", dir).load()

  /** Registry query: a full write-through-committer → read-back
    * roundtrip. The sequence source generates [0, 20000), the rows pass
    * through the DSv2 commit protocol into a fresh store, and the
    * read-back aggregates into 5 residue buckets — so the oracle
    * cross-checks everything the committer made visible. A fresh store
    * dir per invocation keeps the append-only table single-batch under
    * Bench's repeated passes. */
  def qStoreRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = System.getProperty("java.io.tmpdir") +
      s"/graft_store_${UUID.randomUUID().toString.take(12)}"
    write(SeqSource.read(spark, 0L, 20000L, 8)
      .select(col("n"), col("n_str")), dir)
    read(spark, dir)
      .groupBy((col("n") % 5).as("bucket"))
      .agg(count(lit(1)).as("n_rows"), sum(col("n")).as("sum_n"),
        min(col("n_str")).as("min_str"))
      .orderBy(col("bucket"))
  }

  val qStoreRoundtripSql: String =
    """SELECT n % 5 AS bucket, count(*) AS n_rows,
      |  CAST(sum(n) AS BIGINT) AS sum_n,
      |  min('seq-' || n || '-' || format('{:x}', n)) AS min_str
      |FROM range(0, 20000) t(n)
      |GROUP BY bucket ORDER BY bucket""".stripMargin

  val registry: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "q_store_roundtrip" -> ((qStoreRoundtrip _, qStoreRoundtripSql)))

  /** Table maintenance: retain the newest `keep` manifest versions and
    * delete data files no retained manifest references (files stranded
    * by a lost publish race — never files a live reader can see: the
    * store is append-only, so every retained manifest's file set is a
    * superset of every older one's). One metadata listing + bounded
    * deletes; never touches staging (in-flight writers own that). */
  def vacuum(dir: String, keep: Int = 2): (Int, Int) = {
    require(keep >= 1, "must retain at least the live manifest")
    val f = fs(dir)
    val md = new Path(manifestDir(dir))
    if (!f.exists(md)) return (0, 0)
    val versions = f.listStatus(md).toSeq
      .map(_.getPath.getName).filter(_.startsWith("v="))
      .map(_.stripPrefix("v=")).filter(n => n.nonEmpty && n.forall(_.isDigit))
      .map(_.toLong).sorted
    val retained = versions.takeRight(keep).toSet
    val dropped = versions.filterNot(retained)
    dropped.foreach(v => f.delete(new Path(md, s"v=$v"), false))
    val referenced = retained.flatMap { v =>
      val in = f.open(new Path(md, s"v=$v"))
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      txt.split("\n").filter(_.nonEmpty)
    }
    val dataDir = new Path(s"$dir/data")
    val orphans =
      if (!f.exists(dataDir)) Seq.empty
      else f.listStatus(dataDir).toSeq.map(_.getPath)
        // hidden siblings (checksum files etc.) are the FS's bookkeeping
        .filterNot(p => p.getName.startsWith(".") || p.getName.startsWith("_"))
        .filterNot(p => referenced.contains(p.getName))
    orphans.foreach(p => f.delete(p, true))
    (dropped.size, orphans.size)
  }

  // ---------------- shared path/format helpers ----------------

  private[sources] def fs(dir: String): FileSystem =
    new Path(dir).getFileSystem(new Configuration())

  private[sources] def manifestDir(dir: String) = s"$dir/manifest"

  /** (version, visible data file names) of the highest manifest. */
  private[sources] def latestManifest(dir: String): (Long, Seq[String]) = {
    val f = fs(dir)
    val md = new Path(manifestDir(dir))
    if (!f.exists(md)) return (-1L, Seq.empty)
    val vs = f.listStatus(md).toSeq
      .map(_.getPath.getName).filter(_.startsWith("v="))
      .map(_.stripPrefix("v=")).filter(n => n.nonEmpty && n.forall(_.isDigit))
      .map(_.toLong)
    if (vs.isEmpty) (-1L, Seq.empty)
    else {
      val v = vs.max
      val in = f.open(new Path(md, s"v=$v"))
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      (v, txt.split("\n").toSeq.filter(_.nonEmpty))
    }
  }

  private[sources] def readSchema(dir: String): Option[StructType] = {
    val f = fs(dir)
    val p = new Path(s"$dir/schema.json")
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      Some(DataType.fromJson(txt).asInstanceOf[StructType])
    }
  }

  private[sources] def writeAtomic(dir: String, rel: String, body: String): Unit = {
    val f = fs(dir)
    val tmp = new Path(s"$dir/.tmp-${UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val dst = new Path(s"$dir/$rel")
    f.mkdirs(dst.getParent)
    if (!f.rename(tmp, dst)) {
      f.delete(tmp, false)
      if (!f.exists(dst)) // concurrent identical publish already landed
        throw new java.io.IOException(s"cannot publish $dst")
    }
  }

  private[sources] def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")

  private[sources] def unesc(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => b.append('\\'); i += 2
          case 't' => b.append('\t'); i += 2
          case 'n' => b.append('\n'); i += 2
          case o => b.append(o); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  private val NullTok = "\u0000N"

  private[sources] def encodeCell(dt: DataType, row: InternalRow, i: Int): String =
    if (row.isNullAt(i)) NullTok
    else dt match {
      case LongType => row.getLong(i).toString
      case IntegerType => row.getInt(i).toString
      case DoubleType => java.lang.Double.toString(row.getDouble(i))
      case BooleanType => row.getBoolean(i).toString
      case StringType => esc(row.getString(i))
      case o => throw new IllegalArgumentException(s"store: unsupported type $o")
    }

  private[sources] def decodeCell(dt: DataType, cell: String): Any =
    if (cell == NullTok) null
    else dt match {
      case LongType => cell.toLong
      case IntegerType => cell.toInt
      case DoubleType => java.lang.Double.parseDouble(cell)
      case BooleanType => cell.toBoolean
      case StringType => UTF8String.fromString(unesc(cell))
      case o => throw new IllegalArgumentException(s"store: unsupported type $o")
    }
}

class StoreTableProvider extends TableProvider {
  // writes hand the DataFrame schema straight to getTable (a first write
  // has nothing to infer from); reads without a user schema infer below
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StoreSource.readSchema(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        s"store at ${options.get("path")} has no schema yet — write first"))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new StoreTable(properties.get("path"), schema)
}

class StoreTable(dir: String, tschema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"store($dir)"
  override def schema(): StructType = tschema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new StoreScanBuilder(dir, tschema)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    StoreSource.readSchema(dir).foreach { existing =>
      require(existing == info.schema(),
        s"store schema mismatch: table has $existing, write has ${info.schema()}")
    }
    new StoreWriteBuilder(dir, info.schema(), info.queryId())
  }
}

// ---------------------------- write path ----------------------------

class StoreWriteBuilder(dir: String, schema: StructType, queryId: String)
    extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new StoreBatchWrite(dir, schema, queryId)
  }
}

/** One job-level committer instance. `commit` is the ONLY operation that
  * changes what readers see, and it does so with one manifest rename. */
class StoreBatchWrite(dir: String, schema: StructType, queryId: String)
    extends BatchWrite {
  import StoreSource._

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    StoreWriterFactory(dir, schema.json, queryId)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val f = fs(dir)
    val finals = messages.map { case m: StoreCommitMsg =>
      val staged = new Path(m.stagedPath)
      val dst = new Path(s"$dir/data/${m.finalName}")
      f.mkdirs(dst.getParent)
      if (f.exists(staged)) {
        if (f.exists(dst)) f.delete(staged, false) // re-commit: already moved
        else if (!f.rename(staged, dst))
          throw new java.io.IOException(s"store commit: cannot move $staged")
      } else require(f.exists(dst),
        s"store commit: neither staged nor final exists for ${m.finalName}")
      m.finalName
    }
    if (readSchema(dir).isEmpty)
      writeAtomic(dir, "schema.json", schema.json)
    // publish-and-verify loop: local-FS rename REPLACES an existing
    // target, so a concurrent committer racing to the same version could
    // silently shadow this commit's manifest — re-read after publishing
    // and retry at the next version (merging the other commit's files)
    // until OUR files are in the live manifest. Versions strictly
    // increase, so the loop terminates; single-commit jobs run it once.
    var published = false
    while (!published) {
      val (v, current) = latestManifest(dir)
      val all = (current ++ finals).distinct // idempotent re-commit
      writeAtomic(dir, s"manifest/v=${v + 1}", all.mkString("\n"))
      val (_, now) = latestManifest(dir)
      published = finals.forall(now.contains)
    }
    // sweep the query's staging dir (speculative attempts never commit)
    f.delete(new Path(s"$dir/_staging/$queryId"), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    fs(dir).delete(new Path(s"$dir/_staging/$queryId"), true)
}

case class StoreCommitMsg(stagedPath: String, finalName: String, rows: Long)
  extends WriterCommitMessage

case class StoreWriterFactory(dir: String, schemaJson: String, queryId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new StoreDataWriter(dir,
      DataType.fromJson(schemaJson).asInstanceOf[StructType], queryId,
      partitionId, taskId)
}

/** Task-level writer: rows stream to an attempt-unique staging file; the
  * returned final name is attempt-INdependent, so whichever attempt the
  * coordinator lets commit lands on the same target. */
class StoreDataWriter(dir: String, schema: StructType, queryId: String,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {
  import StoreSource._

  private val stagedPath = s"$dir/_staging/$queryId/p$partitionId-t$taskId.tsv"
  private val finalName = s"$queryId-p$partitionId.tsv"
  private lazy val out = {
    val f = fs(dir)
    val p = new Path(stagedPath)
    f.mkdirs(p.getParent)
    f.create(p, true)
  }
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    val line = schema.fields.zipWithIndex.map { case (fd, i) =>
      encodeCell(fd.dataType, row, i)
    }.mkString("", "\t", "\n")
    out.write(line.getBytes("UTF-8"))
    rows += 1
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    StoreCommitMsg(stagedPath, finalName, rows)
  }
  override def abort(): Unit = {
    try out.close() catch { case _: Exception => }
    fs(dir).delete(new Path(stagedPath), false)
  }
  override def close(): Unit = ()
}

// ---------------------------- read path -----------------------------

class StoreScanBuilder(dir: String, schema: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new StoreScan(dir, schema, required)
}

class StoreScan(dir: String, full: StructType, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"StoreScan($dir) cols=${required.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] = {
    val (_, files) = StoreSource.latestManifest(dir)
    files.map(n => StoreFilePartition(s"$dir/data/$n"): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    StoreReaderFactory(full.json, required.fieldNames)
}

case class StoreFilePartition(path: String) extends InputPartition

case class StoreReaderFactory(fullJson: String, cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    import StoreSource._
    val full = DataType.fromJson(fullJson).asInstanceOf[StructType]
    val idx = cols.map(c => full.fieldIndex(c))
    val p = partition.asInstanceOf[StoreFilePartition]
    val in = fs(p.path).open(new Path(p.path))
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
    new PartitionReader[InternalRow] {
      private var cur: String = _
      override def next(): Boolean = {
        if (lines.hasNext) { cur = lines.next(); true } else false
      }
      override def get(): InternalRow = {
        val cells = cur.split("\t", -1)
        new GenericInternalRow(idx.map[Any] { i =>
          decodeCell(full.fields(i).dataType, cells(i))
        })
      }
      override def close(): Unit = in.close()
    }
  }
}
