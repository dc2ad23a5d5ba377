package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 table provider — the SOURCE side of the Catalyst
  * extension ladder (Expression → Aggregator → LogicalPlan/Strategy →
  * optimizer Rule → `TableProvider`): a synthetic monotone sequence table
  * `[start, end)` with a cheap key column `n` and a deliberately wide
  * derived column `n_str`, read through the full V2 scan protocol.
  *
  * What the implementation demonstrates, each load-bearing at 100 TB:
  *   - `SupportsPushDownRequiredColumns`: the reader materializes ONLY the
  *     columns the query needs — `n_str` is never built unless projected
  *     (the ReadSchema discipline parquet gets for free, implemented by
  *     hand the way any custom source — a REST pager, a KV snapshot, a
  *     tensor store — must).
  *   - `SupportsPushDownFilters`: range predicates on `n` (`=`, `<`, `<=`,
  *     `>`, `>=`) tighten the generation bounds BEFORE any row exists —
  *     scan-eliminated, not scan-then-filtered. Non-range residuals (e.g.
  *     `n % 2 = 0`) are returned to Spark and evaluated post-scan, the
  *     contract split every pushdown source follows.
  *   - `planInputPartitions`: the surviving range splits into `slices`
  *     contiguous sub-ranges, each an independent `PartitionReader` —
  *     the parallel-read geometry (one task per partition, no driver
  *     materialization, no shuffle to redistribute).
  *
  * Registered by class name (`format(classOf[SeqTableProvider].getName)`)
  * — the no-services-file registration route.
  */
object SeqSource {

  val schema: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("n_str", StringType, nullable = false)))

  /** The key-grouped variant's schema: the partition key `g = n mod
    * buckets` is a REAL column, so the reported
    * `KeyGroupedPartitioning(identity(g))` resolves against the scan
    * output with no function-catalog dependency, and a join that lists
    * `g` among its keys satisfies the clustering-⊆-join-keys rule. */
  val bucketedSchema: StructType = StructType(Seq(
    StructField("g", org.apache.spark.sql.types.IntegerType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("n_str", StringType, nullable = false)))

  /** Derived wide column (stands in for an expensive fetch/decode). */
  def nStr(n: Long): String = s"seq-$n-${java.lang.Long.toHexString(n)}"

  def read(spark: SparkSession, start: Long, end: Long, slices: Int): DataFrame =
    spark.read.format(classOf[SeqTableProvider].getName)
      .option("start", start).option("end", end).option("slices", slices)
      .load()

  /** Registry query: aggregate a pushed-down slice of the sequence into
    * 7 residue buckets. The `between` bounds reach the source as
    * generation bounds (no row outside them is ever created); the parity
    * predicate stays a residual Spark filter; `n_str` is pruned at the
    * reader. Oracle = DuckDB `range()` — the engine-native generator, so
    * the V2 protocol's whole visible behavior (bounds, residual, values)
    * is cross-checked.
    */
  def qSeqSource(spark: SparkSession, sfDir: String): DataFrame = {
    read(spark, 0L, 100000L, 8)
      .filter(col("n") >= 20000L && col("n") < 60000L && col("n") % 2 === 0)
      .groupBy((col("n") % 7).as("bucket"))
      .agg(count(lit(1)).as("n_rows"), sum(col("n")).as("sum_n"),
        min(col("n")).as("min_n"), max(col("n")).as("max_n"))
      .orderBy(col("bucket"))
  }

  val qSeqSourceSql: String =
    """SELECT n % 7 AS bucket, count(*) AS n_rows,
      |  CAST(sum(n) AS BIGINT) AS sum_n, min(n) AS min_n, max(n) AS max_n
      |FROM range(0, 100000) t(n)
      |WHERE n >= 20000 AND n < 60000 AND n % 2 = 0
      |GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Registry query for the aggregate-pushdown rung: count/min/max over
    * a filtered range answer from the scan's CLOSED FORMS — the plan
    * contains a [[SeqAggScan]] and generates zero sequence rows
    * (plan-asserted in SeqSourceSpec; values oracle-checked here). */
  def qSeqAggPushdown(spark: SparkSession, sfDir: String): DataFrame =
    read(spark, 0L, 1000000L, 8)
      .filter(col("n") >= 12345L && col("n") < 987654L)
      .agg(count(lit(1)).as("n_rows"), min(col("n")).as("min_n"),
        max(col("n")).as("max_n"))

  val qSeqAggPushdownSql: String =
    """SELECT count(*) AS n_rows, min(n) AS min_n, max(n) AS max_n
      |FROM range(0, 1000000) t(n)
      |WHERE n >= 12345 AND n < 987654""".stripMargin

  /** The KEY-GROUPED form of the source ([[SupportsReportPartitioning]],
    * the last read-side connector rung): the table exposes its partition
    * key as a real column `g = n mod buckets`, plans one partition per
    * residue class, and DECLARES that layout to the planner as a
    * `KeyGroupedPartitioning(identity(g))` — so a join between two such
    * scans that includes `g` in its keys plans with NO shuffle exchange
    * on either side (storage-partitioned join), the co-located-join
    * geometry a bucketed warehouse table gets, implemented for a custom
    * connector. */
  def readBucketed(spark: SparkSession, start: Long, end: Long,
      buckets: Int): DataFrame =
    spark.read.format(classOf[SeqTableProvider].getName)
      .option("start", start).option("end", end)
      .option("buckets", buckets).load()

  /** Registry query for the storage-partitioned-join rung: two
    * key-grouped sequence scans (1.5M and 1.2M rows — both sides above
    * the broadcast threshold, so without SPJ this is a two-sided
    * shuffle join) join on (g, n); `g = n mod 8` is functionally
    * determined by `n`, so including it in the join keys changes no
    * result row while matching the declared partitioning — the planner
    * aligns the two scans' reported partition values and drops BOTH
    * exchanges (plan-asserted in SeqSourceSpec with the
    * bucketing-disabled form as the red control; values oracle-checked
    * here against DuckDB's own range join). */
  def qSeqSpj(spark: SparkSession, sfDir: String): DataFrame = {
    // the two planner confs SPJ needs — v2 bucketing on, and subset
    // co-partitioning allowed (the partition key [g] is a strict subset
    // of the join keys [g, n]) — are scoped to THIS query: the 7-row
    // aggregate materializes eagerly under them and the previous values
    // restore before returning, so no other registry query ever plans
    // under a relaxed co-partition requirement
    val keys = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.requireAllClusterKeysForCoPartition")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k,
      if (k.endsWith("enabled")) "true" else "false"))
    try {
      val a = readBucketed(spark, 0L, 1500000L, 8).select(col("g"), col("n"))
      val b = readBucketed(spark, 300000L, 1500000L, 8)
        .select(col("g"), col("n"), col("n_str"))
      a.join(b, Seq("g", "n"))
        .groupBy((col("n") % 7).as("bucket"))
        .agg(count(lit(1)).as("n_rows"), sum(col("n")).as("sum_n"),
          // BIGINT on both sides: DuckDB length() is BIGINT, Spark's INT
          max(length(col("n_str")).cast("long")).as("max_len"))
        .orderBy(col("bucket"))
        .localCheckpoint(true) // eager: the SPJ plan runs under the confs
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  val qSeqSpjSql: String =
    """SELECT a.n % 7 AS bucket, count(*) AS n_rows,
      |  CAST(sum(a.n) AS BIGINT) AS sum_n,
      |  max(length('seq-' || b.n || '-' || format('{:x}', b.n))) AS max_len
      |FROM range(0, 1500000) a(n) JOIN range(300000, 1500000) b(n)
      |  ON a.n % 8 = b.n % 8 AND a.n = b.n
      |GROUP BY bucket ORDER BY bucket""".stripMargin

  val registry: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "q_seq_source" -> ((qSeqSource _, qSeqSourceSql)),
    "q_seq_agg_pushdown" -> ((qSeqAggPushdown _, qSeqAggPushdownSql)),
    "q_seq_spj" -> ((qSeqSpj _, qSeqSpjSql)))
}

class SeqTableProvider extends TableProvider {
  private def bucketsOf(o: CaseInsensitiveStringMap): Option[Int] =
    Option(o.get("buckets")).map(_.toInt)
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (bucketsOf(options).isDefined) SeqSource.bucketedSchema else SeqSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SeqTable(
      properties.getOrDefault("start", "0").toLong,
      properties.getOrDefault("end", "0").toLong,
      properties.getOrDefault("slices", "1").toInt,
      Option(properties.get("buckets")).map(_.toInt))
}

class SeqTable(start: Long, end: Long, slices: Int,
    buckets: Option[Int] = None) extends Table with SupportsRead {
  override def name(): String = s"seq($start, $end)"
  override def schema(): StructType =
    if (buckets.isDefined) SeqSource.bucketedSchema else SeqSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(start, end, slices, buckets)
}

/** Mutable per-scan state: bound tightening from pushed filters + column
  * pruning. Only conjunctive top-level range shapes on `n` are consumed;
  * everything else is handed back as a residual.
  */
class SeqScanBuilder(start: Long, end: Long, slices: Int,
    buckets: Option[Int] = None)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit
    with org.apache.spark.sql.connector.read.SupportsPushDownOffset
    with org.apache.spark.sql.connector.read.SupportsPushDownTopN {
  private var lo: Long = start
  private var hi: Long = end // exclusive
  private var accepted: Array[Filter] = Array.empty
  private var residualHeld = false
  private var required: StructType =
    if (buckets.isDefined) SeqSource.bucketedSchema else SeqSource.schema
  private var pushedAggs: Option[Array[String]] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition {
      case EqualTo("n", _: java.lang.Long) => true
      case GreaterThan("n", _: java.lang.Long) => true
      case GreaterThanOrEqual("n", _: java.lang.Long) => true
      case LessThan("n", _: java.lang.Long) => true
      case LessThanOrEqual("n", _: java.lang.Long) => true
      case _ => false
    }
    ours.foreach {
      case EqualTo(_, v: java.lang.Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case GreaterThan(_, v: java.lang.Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual(_, v: java.lang.Long) => lo = math.max(lo, v)
      case LessThan(_, v: java.lang.Long) => hi = math.min(hi, v)
      case LessThanOrEqual(_, v: java.lang.Long) => hi = math.min(hi, v + 1)
      case _ =>
    }
    accepted = ours
    residualHeld = residual.nonEmpty
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // ---- aggregate pushdown (the last read-side rung): count/min/max
  // over the range have CLOSED FORMS, so a pushed aggregate generates
  // NO rows at all — the scan answers from its bounds. COMPLETE
  // pushdown only (Spark adds no partial agg), and only when every
  // filter was consumed into the bounds (a residual would make the
  // closed forms wrong — the redundant guard behind Spark's own rule,
  // which only pushes aggregates when no post-scan filter remains).
  private def isN(e: org.apache.spark.sql.connector.expressions.Expression) =
    e match {
      case r: NamedReference => r.fieldNames.sameElements(Array("n"))
      case _ => false
    }
  private def encode(agg: Aggregation): Option[Array[String]] =
    if (residualHeld || agg.groupByExpressions.nonEmpty ||
      agg.aggregateExpressions.isEmpty) None
    else {
      val enc = agg.aggregateExpressions.map {
        case _: CountStar => "count"
        case c: Count if !c.isDistinct && isN(c.column) => "count"
        case m: Min if isN(m.column) => "min"
        case m: Max if isN(m.column) => "max"
        case _ => return None
      }
      Some(enc)
    }
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    encode(agg).isDefined
  override def pushAggregation(agg: Aggregation): Boolean = {
    encode(agg) match {
      case Some(enc) => pushedAggs = Some(enc); true
      case None => false
    }
  }

  // ---- paginate pushdown: limit/offset/top-n(n) have closed forms on
  // a monotone generated range — limit keeps the bounds' head, offset
  // drops it, and an ORDER BY n top-n keeps the head (ASC) or tail
  // (DESC). The row SETS are exact, but `isPartiallyPushed` is ONE
  // method shared by the Limit and TopN interfaces, and a fully-pushed
  // TopN would let Spark drop its Sort — which the DESC case cannot
  // honor (the reader emits ascending). So everything reports partial:
  // Spark keeps its (now trivial, ≤n-row) Limit/Sort and the scan just
  // stops generating rows that cannot survive them. Refused after an
  // aggregate push — the bounds then mean something else.
  override def pushLimit(limit: Int): Boolean =
    if (pushedAggs.isDefined) false
    else { hi = math.min(hi, lo + limit); true }
  override def pushOffset(offset: Int): Boolean =
    if (pushedAggs.isDefined) false
    else { lo = math.min(hi, lo + offset); true }
  override def isPartiallyPushed(): Boolean = true
  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      limit: Int): Boolean = {
    if (pushedAggs.isDefined || orders.length != 1) return false
    val o = orders(0)
    if (!isN(o.expression)) return false
    o.direction match {
      case org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING =>
        hi = math.min(hi, lo + limit); true
      case org.apache.spark.sql.connector.expressions.SortDirection.DESCENDING =>
        lo = math.max(lo, hi - limit); true
      case _ => false
    }
  }

  override def build(): Scan = pushedAggs match {
    case Some(aggs) => new SeqAggScan(lo, hi, aggs)
    case None => new SeqScan(lo, hi, slices, required, buckets)
  }
}

/** The scan a pushed aggregate builds: ONE partition, ONE row, every
  * value computed in closed form over the pushed bounds — `count = hi −
  * lo`, `min = lo`, `max = hi − 1` (NULL min/max on the empty range, the
  * engine's empty-aggregate semantics). No sequence row is ever
  * generated. */
class SeqAggScan(lo: Long, hi: Long, aggs: Array[String])
    extends Scan with Batch {
  override def readSchema(): StructType = StructType(aggs.zipWithIndex.map {
    case (a, i) => StructField(s"agg_$i", LongType, nullable = a != "count")
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"SeqAggScan[$lo, $hi) PushedAggregates=[${aggs.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(SeqAggPartition(lo, hi, aggs))
  override def createReaderFactory(): PartitionReaderFactory = SeqAggReaderFactory()
}

case class SeqAggPartition(lo: Long, hi: Long, aggs: Array[String])
  extends InputPartition

case class SeqAggReaderFactory() extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SeqAggPartition]
    val n = math.max(0L, p.hi - p.lo)
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val go = !emitted; emitted = true; go }
      override def get(): InternalRow =
        new GenericInternalRow(p.aggs.map[Any] {
          case "count" => n
          case "min" => if (n > 0) p.lo else null
          case "max" => if (n > 0) p.hi - 1 else null
        })
      override def close(): Unit = ()
    }
  }
}

class SeqScan(lo: Long, hi: Long, slices: Int, required: StructType,
    buckets: Option[Int] = None)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsReportOrdering {
  // Every reader emits n ASCENDING within its partition (ranges, runs,
  // and residue classes all stride upward), and in key-grouped mode g is
  // constant per partition — so the scan DECLARES [g, n] / [n] as its
  // per-partition output ordering (`SupportsReportOrdering`) and a
  // sort-merge join over two such scans drops its Sort nodes too: with
  // E353's dropped exchanges, the SPJ plan is scan → merge-join, nothing
  // else (plan-asserted).
  override def outputOrdering():
      Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}
    val asc = (c: String) => Expressions.sort(
      Expressions.column(c), SortDirection.ASCENDING)
    val cols = required.fieldNames
    if (buckets.isDefined && cols.contains("g") && cols.contains("n"))
      Array(asc("g"), asc("n"))
    else if (cols.contains("n")) Array(asc("n"))
    else Array.empty
  }
  // KEY-GROUPED mode (`SupportsReportPartitioning`, SPJ): one partition
  // per residue class of n mod buckets, each declaring its g value via
  // HasPartitionKey — the planner aligns two such scans' partition
  // values and a join whose keys include g needs NO exchange on either
  // side (EnsureRequirements' storage-partitioned-join path, enabled by
  // spark.sql.sources.v2.bucketing.enabled). This is the declared twin
  // of what a bucketed warehouse table provides.
  override def outputPartitioning():
      org.apache.spark.sql.connector.read.partitioning.Partitioning =
    buckets match {
      case Some(k) =>
        new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
          Array(org.apache.spark.sql.connector.expressions.Expressions
            .identity("g")), k)
      case None =>
        new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(
          slices)
    }
  // CLOSED-FORM statistics (`SupportsReportStatistics`): without them a
  // V2 relation defaults to "unknown = infinite" and the planner can
  // never auto-broadcast a small generated side — a join against a tiny
  // pushed range would shuffle both sides. Row count is exact (the
  // pushed bounds), bytes = rows × the average encoded width of the
  // PRUNED columns (8 for n; n_str averages ~20 chars over the range).
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      private val rows = math.max(0L, hi - lo)
      private val width = required.fieldNames.map {
        case "n" => 8L
        case "n_str" => 20L
        case "g" => 4L
      }.sum.max(1L)
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows * width)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows)
    }
  // RUNTIME filtering (SPARK-35779, the DPP analog for custom sources):
  // when this scan joins a broadcast-able side on `n` behind a selective
  // predicate, Spark hands the build side's actual key set to `filter`
  // AT EXECUTION TIME and the scan re-plans — generation collapses from
  // the static range to exactly the joined keys' runs, the row-group/
  // partition pruning a parquet fact table gets from DPP, implemented
  // for a generated source.
  @volatile private var allowed: Option[Array[Long]] = None
  @volatile private[sources] var runtimeNarrowed = false

  override def filterAttributes(): Array[NamedReference] =
    // key-grouped scans refuse runtime filtering: a post-planning
    // re-plan to key runs would break the partition-value contract the
    // SPJ planner already committed to
    if (buckets.isDefined) Array.empty
    else Array(org.apache.spark.sql.connector.expressions.Expressions.column("n"))
  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case org.apache.spark.sql.sources.In("n", vs)
        // consume ONLY when every delivered value is the expected boxed
        // Long — a partial collect would silently DROP rows (wrong join
        // results); an unexpected boxing/type instead falls through to
        // the static bounds, which is merely conservative (r14 advice)
        if vs.forall(_.isInstanceOf[java.lang.Long]) =>
      val keep = vs.map(_.asInstanceOf[java.lang.Long].longValue)
        .filter(v => v >= lo && v < hi).sorted
      allowed = Some(keep)
      runtimeNarrowed = true
    case _ => // unconsumed runtime shapes: scan stays at static bounds
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SeqScan[$lo, $hi) slices=$slices cols=${required.fieldNames.mkString(",")}" +
      " runtimeFilters=n"
  override def planInputPartitions(): Array[InputPartition] = buckets match {
    case Some(k) =>
      // one partition per residue class — every row of partition r has
      // g == r, which is what HasPartitionKey promises the SPJ planner
      Array.tabulate[InputPartition](k)(r => SeqResidue(lo, hi, k, r))
    case None => allowed match {
      case Some(vs) =>
        // contiguous runs of surviving keys, one partition per run
        val runs = scala.collection.mutable.ArrayBuffer.empty[InputPartition]
        var i = 0
        while (i < vs.length) {
          var j = i
          while (j + 1 < vs.length && vs(j + 1) == vs(j) + 1) j += 1
          runs += SeqRange(vs(i), vs(j) + 1)
          i = j + 1
        }
        runs.toArray
      case None =>
        val n = math.max(0L, hi - lo)
        val k = math.max(1, math.min(slices.toLong, n).toInt)
        Array.tabulate[InputPartition](k) { i =>
          SeqRange(lo + i * n / k, lo + (i + 1) * n / k)
        }
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    SeqReaderFactory(required.fieldNames)
}

case class SeqRange(lo: Long, hi: Long) extends InputPartition

/** A residue class {n ∈ [lo, hi) : n ≡ res (mod k)} — the key-grouped
  * partition, reporting its g value to the SPJ planner. */
case class SeqResidue(lo: Long, hi: Long, k: Int, res: Int)
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](res))
}

case class SeqReaderFactory(cols: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    // materialize ONLY the pruned columns — n_str is never built unless asked
    def row(n: Long, g: Int): InternalRow =
      new GenericInternalRow(cols.map[Any] {
        case "n" => n
        case "n_str" => UTF8String.fromString(SeqSource.nStr(n))
        case "g" => g
      })
    partition match {
      case r: SeqRange =>
        new PartitionReader[InternalRow] {
          private var cur = r.lo - 1
          override def next(): Boolean = { cur += 1; cur < r.hi }
          override def get(): InternalRow = row(cur, -1)
          override def close(): Unit = ()
        }
      case p: SeqResidue =>
        // first n ≥ lo with n ≡ res (mod k), then stride by k
        val first = p.lo + java.lang.Math.floorMod(p.res - p.lo, p.k.toLong)
        new PartitionReader[InternalRow] {
          private var cur = first - p.k
          override def next(): Boolean = { cur += p.k; cur < p.hi }
          override def get(): InternalRow = row(cur, p.res)
          override def close(): Unit = ()
        }
    }
  }
}
