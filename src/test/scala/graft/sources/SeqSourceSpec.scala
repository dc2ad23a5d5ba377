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

  test("runtime filtering: a broadcast join's key set reaches the scan at execution and collapses generation") {
    val spark0 = graft.SparkSuite.session
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import spark0.implicits._

    def seqScans(df: org.apache.spark.sql.DataFrame): Seq[SeqScan] = {
      // descend AQE wrappers: both the adaptive root and its query
      // stages are leaf nodes that hide their subtrees from collect
      def walk(p: SparkPlan): Seq[SeqScan] =
        p.collect {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: QueryStageExec => walk(q.plan)
          case b: BatchScanExec if b.scan.isInstanceOf[SeqScan] =>
            Seq(b.scan.asInstanceOf[SeqScan])
        }.flatten
      walk(df.queryExecution.executedPlan)
    }

    // the dim must survive optimization as scan+Filter (a literal local
    // Seq constant-folds its filter away and the injection rule sees no
    // selective predicate) — parquet-backed, as production dims are
    val dimDir = java.nio.file.Files.createTempDirectory("graft_rtf_dim").toString
    Seq((7L, "a"), (8L, "b"), (9L, "c"), (5000L, "d"), (99999L, "e"),
      (123456L, "x")).toDF("n", "tag")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)

    // selective non-join-key predicate on the build side: the DPP-style
    // injection condition; the probe side's scan must generate ONLY the
    // surviving keys' runs
    val joined = SeqSource.read(spark, 0L, 100000L, 8)
      .join(dim.filter(col("tag") =!= "x"), "n")
    val got = joined.collect().map(_.getAs[Long]("n")).sorted.toSeq
    assert(got === Seq(7L, 8L, 9L, 5000L, 99999L))
    assert(joined.queryExecution.executedPlan.toString
      .contains("dynamicpruningexpression"),
      "the optimizer must inject a runtime pruning filter on the scan")
    val scans = seqScans(joined)
    assert(scans.nonEmpty, "expected the seq scan in the executed plan")
    assert(scans.exists(_.runtimeNarrowed),
      "the join's key set must reach the scan as a runtime filter")

    // red control: no selective predicate on the build side -> no
    // injection, the scan stays at its static bounds (fresh scan object)
    val wide = SeqSource.read(spark, 0L, 100000L, 8).join(dim, "n")
    assert(wide.collect().length === 5) // 123456 is outside the range
    assert(seqScans(wide).forall(!_.runtimeNarrowed),
      "an unselective join must not claim runtime narrowing")
  }

  test("runtime In-filter with unexpected boxing falls back to static bounds (conservative, never lossy)") {
    // the scan consumes a delivered key set ONLY when every value is the
    // boxed Long it expects; anything else must leave the static bounds
    // in place — dropping individual values would under-produce rows and
    // corrupt join results silently (r14 advice)
    val scan = new SeqScan(0L, 100L, 4, SeqSource.schema)
    scan.filter(Array[org.apache.spark.sql.sources.Filter](org.apache.spark.sql.sources.In("n",
      Array[Any](java.lang.Long.valueOf(3L), java.lang.Integer.valueOf(7)))))
    assert(!scan.runtimeNarrowed,
      "a mixed-type key set must be refused wholesale")
    assert(scan.planInputPartitions().map { case SeqRange(lo, hi) => hi - lo }
      .sum === 100L, "the scan must keep generating the full static range")
    // and the well-typed set still narrows
    val scan2 = new SeqScan(0L, 100L, 4, SeqSource.schema)
    scan2.filter(Array[org.apache.spark.sql.sources.Filter](org.apache.spark.sql.sources.In("n",
      Array[Any](java.lang.Long.valueOf(3L), java.lang.Long.valueOf(7L)))))
    assert(scan2.runtimeNarrowed)
    assert(scan2.planInputPartitions().map { case SeqRange(lo, hi) => hi - lo }
      .sum === 2L)
  }

  test("storage-partitioned join: two key-grouped scans join with no shuffle; disabled bucketing is the red control") {
    val conf = spark.conf
    val saved = (conf.getOption("spark.sql.sources.v2.bucketing.enabled"),
      conf.getOption("spark.sql.autoBroadcastJoinThreshold"),
      conf.getOption("spark.sql.requireAllClusterKeysForCoPartition"))
    try {
      conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      // force a non-broadcast join so the exchange question is real
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // the partition key [g] is a strict SUBSET of the join keys [g, n]
      // (n functionally determines g) — co-partitioning on the subset is
      // exactly what SPJ permits once the all-keys requirement is relaxed
      conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
      def joined() = SeqSource.readBucketed(spark, 0L, 50000L, 8)
        .select(col("g"), col("n"))
        .join(SeqSource.readBucketed(spark, 10000L, 60000L, 8)
          .select(col("g"), col("n")), Seq("g", "n"))
      val df = joined()
      val rows = df.count()
      assert(rows === 40000L, "join values must match the range overlap")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"a join on the declared partition key must plan NO exchange:\n$plan")
      // and with SupportsReportOrdering declaring [g, n] ascending per
      // partition, the merge join needs no Sort either: the whole plan
      // is scan -> merge-join ("+- Sort"/ ":- Sort" are Sort NODES;
      // SortMergeJoin itself contains the substring but not the node)
      assert(!plan.contains("- Sort ["),
        s"declared per-partition ordering must drop the SMJ sorts:\n$plan")
      // per-partition alignment really is by g: spot-check values
      val sample = joined().filter(col("n") % 9999 === 0)
        .collect().map(_.getAs[Long]("n")).sorted
      assert(sample.toSeq === (10000L until 60000L)
        .filter(n => n < 50000L && n % 9999 == 0).toSeq)

      // red control: same query with the SPJ planner path off shuffles
      conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val off = joined()
      off.count()
      assert(off.queryExecution.executedPlan.toString.contains("Exchange"),
        "without v2 bucketing the same join must fall back to shuffles")
    } finally {
      def restore(k: String, v: Option[String]): Unit =
        v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
      restore("spark.sql.sources.v2.bucketing.enabled", saved._1)
      restore("spark.sql.autoBroadcastJoinThreshold", saved._2)
      restore("spark.sql.requireAllClusterKeysForCoPartition", saved._3)
    }
  }

  test("limit/offset/top-n push into the generation bounds") {
    // limit: the scan's upper bound collapses to lo + n
    val lim = SeqSource.read(spark, 0L, 100000L, 8).limit(5)
    assert(lim.collect().map(_.getAs[Long]("n")).sorted.toSeq ===
      Seq(0L, 1L, 2L, 3L, 4L))
    assert(scanOf(lim.select("n")).description().contains("[0, 5)"))
    // offset + limit: both bounds move
    val page = SeqSource.read(spark, 0L, 100000L, 8).offset(10).limit(5)
    assert(page.collect().map(_.getAs[Long]("n")).sorted.toSeq ===
      Seq(10L, 11L, 12L, 13L, 14L))
    assert(scanOf(page.select("n")).description().contains("[10, 15)"))
    // descending top-n: generation collapses to the range TAIL, and the
    // kept Sort still returns rows in the requested order
    val top = SeqSource.read(spark, 0L, 100000L, 8)
      .orderBy(col("n").desc).limit(3)
    assert(top.collect().map(_.getAs[Long]("n")).toSeq ===
      Seq(99999L, 99998L, 99997L))
    assert(scanOf(top.select("n")).description().contains("[99997, 100000)"))
    // ascending top-n keeps the head
    val bot = SeqSource.read(spark, 0L, 100000L, 8)
      .orderBy(col("n")).limit(2)
    assert(bot.collect().map(_.getAs[Long]("n")).toSeq === Seq(0L, 1L))
    assert(scanOf(bot.select("n")).description().contains("[0, 2)"))
    // a filter composes: pushed bounds tighten first, then the page
    val fp = SeqSource.read(spark, 0L, 100000L, 8)
      .filter(col("n") >= 50000L).limit(4)
    assert(fp.collect().map(_.getAs[Long]("n")).sorted.toSeq ===
      Seq(50000L, 50001L, 50002L, 50003L))
  }

  test("reported closed-form statistics drive broadcast planning for the generated side") {
    // without SupportsReportStatistics a V2 relation is "unknown =
    // infinite" and can never be the auto-broadcast build side; with the
    // closed form, a tiny pushed range broadcasts and a huge one does not
    val other = spark.range(0L, 5000000L).selectExpr("id AS n", "id * 2 AS w")
    val small = other.join(SeqSource.read(spark, 0L, 50L, 2), "n")
    val planSmall = small.queryExecution.executedPlan.toString
    assert(planSmall.contains("BroadcastHashJoin") &&
      planSmall.split("BroadcastExchange").last.contains("BatchScan seq"),
      s"a 50-row generated side must broadcast:\n$planSmall")
    val large = other.join(SeqSource.read(spark, 0L, 5000000L, 8), "n")
    val planLarge = large.queryExecution.executedPlan.toString
    assert(!planLarge.contains("BroadcastHashJoin"),
      s"a ~140MB generated side must not broadcast at plan time:\n$planLarge")
  }

  test("aggregate pushdown answers count/min/max from closed forms; residuals and group-bys stay unpushed") {
    def planOf(df: org.apache.spark.sql.DataFrame) = {
      df.collect()
      (df.queryExecution.executedPlan.collect {
        case b: BatchScanExec => b.scan.description()
      }.mkString, df.queryExecution.executedPlan.toString)
    }
    // pushed: scan becomes SeqAggScan, no aggregate exec, no generated rows
    val agg = SeqSource.read(spark, 0L, 100000L, 8)
      .filter(col("n") >= 20000L && col("n") < 60000L)
      .agg(count(lit(1)).as("c"), min(col("n")).as("lo"), max(col("n")).as("hi"))
    val row = agg.collect()(0)
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) ===
      ((40000L, 20000L, 59999L)))
    val (desc, plan) = planOf(agg)
    assert(desc.contains("SeqAggScan[20000, 60000)"),
      s"aggregate must reach the scan: $desc")
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      s"complete pushdown must plan no aggregate exec:\n$plan")
    // empty range: count 0, NULL min/max — the engine's empty-agg semantics
    val emptyRow = SeqSource.read(spark, 0L, 100000L, 8)
      .filter(col("n") >= 70000L && col("n") < 60000L)
      .agg(count(lit(1)).as("c"), min(col("n")).as("lo")).collect()(0)
    assert(emptyRow.getLong(0) === 0L && emptyRow.isNullAt(1))
    // red control 1: a residual predicate blocks the closed forms
    val res = SeqSource.read(spark, 0L, 1000L, 4)
      .filter(col("n") % 2 === 0).agg(count(lit(1)).as("c"))
    assert(res.collect()(0).getLong(0) === 500L)
    val (dRes, pRes) = planOf(res)
    assert(!dRes.contains("SeqAggScan") && pRes.contains("Aggregate"),
      s"residual filter must keep the aggregate in Spark: $dRes")
    // red control 2: group-bys are not pushed
    val grp = SeqSource.read(spark, 0L, 1000L, 4)
      .groupBy((col("n") % 3).as("g")).agg(count(lit(1)).as("c"))
    assert(grp.collect().map(_.getLong(1)).sum === 1000L)
    assert(!planOf(grp)._1.contains("SeqAggScan"))
  }
}
