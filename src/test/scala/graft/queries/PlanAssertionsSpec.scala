package graft.queries

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** The 100 TB-scale claims made in scaladoc, asserted against actual
  * physical plans so regressions fail CI instead of surviving as stale
  * comments: no cartesian products where equi-joins are promised,
  * broadcasts where constant-size dims are promised, filter pushdown into
  * scans, and single-scan pipelines where one pass is promised.
  *
  * Plans are inspected PRE-execution (`sparkPlan`, before AQE rewrites):
  * that is the statically-chosen strategy — what survives a scale-up,
  * where AQE's runtime demotions/promotions depend on small-SF sizes.
  */
class PlanAssertionsSpec extends SparkSuite {

  private def plan(df: DataFrame): String = df.queryExecution.sparkPlan.toString

  test("LSH dedup/ANN mining is equi-join only — never an all-pairs product") {
    for (df <- Seq(
        graft.ext.Dedup.qDocMinhashPairs(spark, sf),
        graft.ext.Similarity.qEmbNearDup(spark, sf),
        graft.ext.Similarity.qEmbAnnLsh(spark, sf))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), s"cartesian product in:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop join in:\n$p")
    }
  }

  test("brute-force cosine top-k is the one sanctioned nested-loop (broadcast q-side, non-equi)") {
    val p = plan(graft.ext.Similarity.qEmbCosineTopk(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q5 broadcasts constant-size dims but NOT the O(rows) customer side") {
    // At sf0.001 every table sits under the auto-broadcast threshold and the
    // planner broadcasts them all — which says nothing about 100 TB. Disable
    // size-based promotion: what remains broadcast is exactly the EXPLICIT
    // hints (constant-size nation/region); the O(rows) joins fall back to
    // shuffle strategies — the plan a large cluster actually gets.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan(Analytics.q5NationRevenue(spark, sf))
      // sparkPlan precedes EnsureRequirements, so join NODES (not Exchange
      // operators) carry the strategy.
      assert("BroadcastHashJoin".r.findAllIn(p).size == 2, p)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q4 EXISTS is a SEMI join that ships two lineitem columns, never fans out") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan(Analytics.q4LateOrders(spark, sf))
      assert(p.contains("LeftSemi"), p)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
      // column pruning: the build side is (l_orderkey, l_shipdate), not the fact
      assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_shipdate:timestamp"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q16 NOT IN plans as the null-aware anti join (three-valued logic preserved)") {
    val p = plan(Analytics.q16SupplierCensus(spark, sf))
    // the trailing `true` on the join node is the isNullAwareAntiJoin flag —
    // a plain left_anti would silently change NULL semantics
    assert(p.contains("LeftAnti, BuildRight, true"), p)
  }

  test("q22 scalar aggregate reaches rows via a 1-row broadcast; dormancy is an anti join") {
    val p = plan(Analytics.q22DormantRich(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin BuildRight, Cross"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("semantic dedup pairs only within a cell — cell-keyed equi-join, no products") {
    val p = plan(graft.ext.Similarity.qEmbSemDedup(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    // every nested-loop join must be the sanctioned 1-row quantizer CROSS
    // broadcast (probeCells; its cached plan prints once per consumer) — a
    // mis-planned pairwise compare would surface as an Inner/conditioned
    // nested loop or a cartesian product
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    val quantizerCross = "BroadcastNestedLoopJoin BuildRight, Cross".r.findAllIn(p).size
    assert(bnlj === quantizerCross, s"non-quantizer nested-loop join:\n$p")
  }

  test("taxi pipeline filters push into the events scan and the pipeline scans events ONCE") {
    val p = plan(graft.etl.StarSchema.factTrips(spark, sf))
    assert("Scan parquet".r.findAllIn(p).size == 1, s"expected single events scan:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull("), p)
  }

  test("documents ops read only the columns they use (column pruning reaches the scan)") {
    val p = plan(graft.ext.Dedup.qDocExactDedup(spark, sf))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("keep-latest compaction partial-aggregates map-side (shuffle carries keys, not events)") {
    val p = plan(Analytics.qEventLatestPerUser(spark, sf))
    // a partial max_by below the exchange is the whole point of the agg
    // form over the window form — each task reduces to one row per key
    // before anything moves
    assert(p.contains("partial_max_by"), s"no map-side combine in:\n$p")
  }

  test("decontamination probes a BROADCAST eval-gram set — the training corpus never shuffle-joins") {
    // the scaladoc's 100 TB claim: eval grams are benchmark-sized, so the
    // join must be a broadcast hash probe; a sort-merge/shuffled-hash plan
    // would exchange the full exploded training-gram stream
    val p = plan(graft.ext.Dedup.qDocDecontam(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast probe in:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"training grams shuffle-joined:\n$p")
  }

  test("document packing windows over (lang, shard) — never a single-partition funnel") {
    // the scaladoc's scale claim: the content-hash shard key bounds window
    // partitions, so no lang stratum can serialize through one task. The
    // Window NODE carries the spec pre-EnsureRequirements; the executed
    // plan proves no SinglePartition exchange materialized.
    val df = graft.ext.TextOps.qDocPack(spark, sf)
    val p = plan(df)
    assert("Window \\[.*\\], \\[lang[#0-9]*, shard".r.findFirstIn(p).isDefined,
      s"window not partitioned by (lang, shard):\n$p")
    val executed = df.queryExecution.executedPlan.toString
    assert(!executed.contains("Exchange SinglePartition"),
      s"single-partition exchange in:\n$executed")
  }

  test("stratified sampling and packing read only the columns they use") {
    val sample = plan(graft.ext.TextOps.qDocSampleStratified(spark, sf))
    assert(sample.contains("ReadSchema: struct<doc_id:bigint,text:string,lang:string>"),
      sample)
    val pack = plan(graft.ext.TextOps.qDocPack(spark, sf))
    assert(pack.contains("ReadSchema: struct<doc_id:bigint,text:string,lang:string>"),
      pack)
  }

  test("passage dedup: no joins — hash-keyed window + doc-keyed agg over a pruned scan") {
    val p = plan(graft.ext.CorpusOps.qDocPassageDedup(spark, sf))
    // the first-occurrence decision is a window, never a self-join
    assert(!p.contains("Join"), s"unexpected join in:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
    // the window partitions on the passage hash — high-cardinality, no
    // single-partition funnel at any corpus size
    assert("Window \\[.*\\], \\[h[#0-9L]*\\]".r.findFirstIn(p).isDefined,
      s"window not partitioned by passage hash:\n$p")
  }

  test("hard negatives rank on the native top-k operator — no Window exchange of Q×N rows") {
    val df = graft.ext.Similarity.qEmbHardNegatives(spark, sf)
    val p = plan(df)
    assert(p.contains("TopKPerKey"), s"native operator missing:\n$p")
    assert(!p.contains("Window"), s"window-form ranking crept back:\n$p")
    // the label-mismatch scoring join is the sanctioned broadcast
    // nested loop (query side broadcast, non-equi predicate)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("PQ ADC ranks on the native top-k heap — no Window, no cartesian, broadcast codebook only") {
    val p = plan(graft.ext.Similarity.qEmbPqAdc(spark, sf))
    assert(p.contains("TopKPerKey"), s"native operator missing:\n$p")
    assert(!p.contains("Window"), s"window-form ranking crept back:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("moving window is ONE user-keyed window — never a time-range self-join") {
    val p = plan(Analytics.qEventMovingWindow(spark, sf))
    assert(!p.contains("Join"), s"self-join formulation crept in:\n$p")
    assert("Window ".r.findAllIn(p).size == 1, s"expected exactly one window:\n$p")
  }

  test("set operators plan as semi/anti joins over pre-aggregated sides") {
    val p = plan(Analytics.qPartSizeSetops(spark, sf))
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("as-of attribution never funnels through a single partition") {
    // the merge-window is partitioned by user_id; a missing partition spec
    // would plan Exchange SinglePartition and serialize the whole table
    // through one task at any scale
    val p = Analytics.qEventAttributionAsof(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange SinglePartition"), s"single-partition exchange in:\n$p")
  }

  test("LOCF is ONE user-keyed window — no self-join, no single partition") {
    val p = plan(Warehouse.qEventLocf(spark, sf))
    assert(!p.contains("Join"), s"self-join formulation crept in:\n$p")
    assert("Window ".r.findAllIn(p).size == 1, s"expected exactly one window:\n$p")
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("chunking is narrow: generator + projections, no join, no mid-plan exchange") {
    val s = graft.ext.CorpusOps.qDocChunk(spark, sf).queryExecution.sparkPlan.toString
    assert(!s.contains("Join"), s"join crept into chunking:\n$s")
    assert(s.contains("Generate"), s"expected the sequence/posexplode generator:\n$s")
    // sparkPlan precedes EnsureRequirements: any Exchange already present
    // here would be mid-plan semantics, not the final ORDER BY's range sort
    assert(!s.contains("Exchange"), s"mid-plan exchange in narrow chunking:\n$s")
  }

  test("OOV probe broadcasts the vocab — the token stream never shuffles on token") {
    val p = plan(graft.ext.CorpusOps.qDocOov(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
  }

  test("q15 argmax is a 1-row broadcast — never a single-partition window") {
    val p = plan(Analytics.q15TopSupplier(spark, sf))
    assert(!p.contains("Window"), s"window-max formulation crept in:\n$p")
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("ohlc is ONE aggregation — no window, no join, no per-bar sort") {
    val p = plan(Analytics.qEventOhlc(spark, sf))
    assert(!p.contains("Window"), s"window formulation crept in:\n$p")
    assert(!p.contains("Join"), p)
    // min_by/max_by partial-aggregate: both partial and final HashAggregate
    // appear, nothing else shuffles
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
  }

  test("transitions pairing is one user-keyed window over one sort") {
    val p = plan(Analytics.qEventTransitions(spark, sf))
    // two Window nodes total: the per-user lead pairing and the tiny
    // outgoing-share window over the |types|^2 aggregate
    assert("Window ".r.findAllIn(p).size == 2, s"expected exactly two windows:\n$p")
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("anomaly and postings probes broadcast their tiny sides") {
    for (df <- Seq(Analytics.qEventAnomalies(spark, sf),
        graft.ext.TextOps.qDocPostings(spark, sf))) {
      val p = plan(df)
      assert(p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    }
  }

  test("global running total: the row-scale window is day-partitioned") {
    val p = plan(Analytics.qEventGlobalRunning(spark, sf))
    // the two-phase prefix sum confines the unpartitioned (single-
    // partition) window to the |days|-row offset aggregate; the window
    // that touches every event row must carry the day partition key
    assert(p.contains("windowspecdefinition(day"), s"row-scale window lost its partition key:\n$p")
    // and the offsets join back as a broadcast, not a shuffle
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("incremental dedup is equi-join only, window keyed on the hash") {
    val p = plan(graft.ext.Dedup.qDocIncrDedup(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window"), p) // intra-batch first-wins
  }

  test("hop window plans as Expand + partial aggregate — never a window-table join") {
    val p = plan(Analytics.qEventHopWindow(spark, sf))
    assert(p.contains("Expand"), s"hop membership should be an Expand:\n$p")
    assert(!p.contains("Join"), s"no join of the stream against a window table:\n$p")
    // partial (map-side) aggregation before the exchange: the shuffle
    // carries |windows| combined rows, not the ×4-expanded corpus
    assert(p.contains("partial_count") || p.contains("partial"), p)
  }

  test("co-occurrence pairs equi-join on user over DISTINCT rows; scalars broadcast") {
    val p = plan(Analytics.qEventCooccur(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop is the sanctioned 1-row user-count broadcast
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
  }

  test("k-anonymity ladder is one Expand over one customer scan — no per-level rescans") {
    val p = plan(graft.etl.Quality.qKAnonCustomer(spark, sf))
    assert(p.contains("Expand"), p)
    assert("Scan parquet".r.findAllIn(p).size === 1, s"expected a single scan:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("drift histogram reads events ONCE — the time split is a conditional agg, not two scans") {
    val p = plan(graft.etl.Quality.qEventDrift(spark, sf))
    assert("Scan parquet".r.findAllIn(p).size === 1, s"expected a single scan:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("triangle closure is hash-equi only — the OR-of-directions nested loop stays dead") {
    // regression guard: closing wedges with (x=src AND y=dst) OR
    // (y=src AND x=dst) is un-hashable and planned a wedges×edges nested
    // loop (measured 9 min vs 20 s at sf0.01); the orientation-ordered
    // legs make every join in the pipeline an equi-join
    val p = plan(graft.ext.Graph.qGraphTriangles(spark, sf))
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$p")
  }

  test("per-cell TwoNN pairs candidates by cell equi-key — no corpus-wide broadcast loop") {
    // the global estimator's Q×N broadcast nested loop must NOT appear.
    // The only nested loop anywhere in the text is the sanctioned 1-row
    // quantizer cross INSIDE the persisted assignment's cached lineage
    // (IdentityBroadcastMode on a single-row centroid array); the pairing
    // itself has to be a hash equi-join on the cell id
    val p = plan(graft.ext.Similarity.qEmbTwonnCell(spark, sf))
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    // the executing operators print ABOVE the first cached-lineage dump
    // (children under parents): any nested loop in the live pairing would
    // appear before the first InMemoryRelation marker
    val firstImr = p.indexOf("InMemoryRelation")
    val firstBnlj = p.indexOf("BroadcastNestedLoopJoin")
    assert(firstImr >= 0, s"expected the persisted assignment:\n$p")
    assert(firstBnlj == -1 || firstBnlj > firstImr,
      s"nested loop in the live pairing plan:\n$p")
    // the probe side is corpus-sized (|corpus|/mod rows) and must pair
    // via a SHUFFLE on the cell id, never a whole-side broadcast
    assert(p.contains("ShuffledHashJoin [cell") ||
      p.contains("SortMergeJoin [cell"),
      s"expected a shuffled cell-equi pairing join:\n$p")
  }

  test("prefix-sum family: corpus-side windows are partitioned, never a global corpus sort") {
    // qDocPackChunks: the two-level decomposition means the only
    // UNpartitioned window runs on the n/256 block table; the
    // corpus-sized running sum must be partitioned by blk
    val pc = plan(graft.ext.TextOps.qDocPackChunks(spark, sf))
    assert(pc.contains("windowspecdefinition(blk"),
      s"expected the within-block partitioned window:\n$pc")
    // qDocPackBins: the within-length rank must partition by the length
    // value (the bounded-support key), not sort the corpus globally
    val pb = plan(graft.ext.TextOps.qDocPackBins(spark, sf))
    assert(pb.contains("windowspecdefinition(n_tokens"),
      s"expected the per-length-value partitioned rank:\n$pb")
    // qDocCurriculum: exactly ONE window total — the cumulative over the
    // bounded difficulty-bucket table; the per-doc side has none
    val cu = plan(graft.ext.TextOps.qDocCurriculum(spark, sf))
    assert("\\bWindow \\[".r.findAllIn(cu).size == 1,
      s"expected exactly one (bucket-table) window:\n$cu")
  }

  test("EWMA is one user-keyed aggregate — no window, no join, fold stays in the projection") {
    val p = plan(Analytics.qEventEwma(spark, sf))
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate") ||
      p.contains("SortAggregate"), p)
  }

  test("ACF joins only metadata-sized frames — no products beyond the 7-row lag broadcast") {
    val p = plan(Analytics.qEventAcf(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop is the sanctioned broadcast cross with the
    // constant 7-row lag table
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("rolling actives: fan-out is a generator after dedup; only the 1-row max clamp nests") {
    val p = plan(Analytics.qEventRollingActive(spark, sf))
    assert(p.contains("Generate"), s"expected the sequence/explode generator:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
    // exact distinct goes two-phase (partial before the exchange)
    assert(p.contains("partial"), p)
  }

  test("compaction planner: both windows ride ONE partition-keyed exchange") {
    import spark.implicits._
    val files = (1 to 100).map(i => (s"p${i % 4}", i.toLong, 10L + i))
      .toDF("part", "file", "bytes")
    val executed = graft.etl.Layout
      .compactionPlan(files, "part", "file", "bytes", 200L)
      .queryExecution.executedPlan.toString
    // running sum and dense renumber both partition by `part`: Catalyst
    // must reuse the partitioning instead of exchanging twice, and the
    // file listing never funnels through a single task
    assert("Exchange hashpartitioning".r.findAllIn(executed).size === 1, executed)
    assert(!executed.contains("Exchange SinglePartition"), executed)
  }

  test("peak concurrency: marker collapse partial-aggregates before any exchange; one sweep window") {
    val qe = Analytics.qEventPeakConcurrency(spark, sf).queryExecution
    val executed = qe.executedPlan.toString
    // the (day, second) collapse must combine map-side so the first
    // exchange carries <= 86400 rows/day, not 3x the corpus; the per-day
    // sweep is ONE window; the day agg reuses the window's partitioning
    // (two hash exchanges total: (day,t) collapse + day sweep)
    assert(executed.contains("partial"), executed)
    assert("Exchange hashpartitioning".r.findAllIn(executed).size <= 2, executed)
    assert("Window".r.findAllIn(qe.sparkPlan.toString).size === 1, executed)
    assert(!executed.contains("Exchange SinglePartition"), executed)
    assert(!executed.contains("CartesianProduct"), executed)
  }

  test("coverage: running sum and lead share the day exchange — no third shuffle, one sort") {
    val executed = Analytics.qEventCoverage(spark, sf)
      .queryExecution.executedPlan.toString
    // offset frame (lead) and aggregate frame (running sum) plan as two
    // Window operators, but both ride ONE day-keyed exchange and ONE sort:
    // same 2-exchange budget as the peak sweep
    assert(executed.contains("partial"), executed)
    assert("Exchange hashpartitioning".r.findAllIn(executed).size <= 2, executed)
    assert("\\bSort\\b".r.findAllIn(executed).size <= 2, executed) // window sort + final orderBy
    assert(!executed.contains("Exchange SinglePartition"), executed)
  }

  test("skyline: distinct collapse combines map-side; ONE nation-keyed frontier window") {
    val qe = Warehouse.qLineSkyline(spark, sf).queryExecution
    val p = qe.sparkPlan.toString
    assert("Window".r.findAllIn(p).size === 1, p)
    assert("windowspecdefinition\\(nation".r.findFirstIn(p).isDefined,
      s"frontier window lost its nation partition:\n$p")
    val executed = qe.executedPlan.toString
    // a function-less distinct prints no "partial" tag; two-phase combine
    // shows as the HashAggregate pair straddling the exchange
    assert("HashAggregate".r.findAllIn(executed).size >= 2,
      s"distinct not map-side combined:\n$executed")
    assert(!executed.contains("Exchange SinglePartition"), executed)
    assert(!executed.contains("CartesianProduct"), executed)
  }

  test("weighted median: both weight windows ride ONE nation exchange after the collapse") {
    val executed = Warehouse.qWeightedMedian(spark, sf)
      .queryExecution.executedPlan.toString
    // (nation, price) collapse + nation window = two hash exchanges total;
    // cumulative and whole-partition frames must not add a third
    assert("Exchange hashpartitioning".r.findAllIn(executed).size <= 2, executed)
    assert(executed.contains("partial"), executed)
    assert(!executed.contains("Exchange SinglePartition"), executed)
  }

  test("user balance: stacked windows and the final agg share ONE user exchange and ONE sort") {
    val executed = Analytics.qUserBalance(spark, sf)
      .queryExecution.executedPlan.toString
    // running sum, running min and the user groupBy all cluster on user_id:
    // EnsureRequirements must reuse the window's partitioning for the agg
    assert("Exchange hashpartitioning".r.findAllIn(executed).size === 1, executed)
    assert("\\bSort\\b".r.findAllIn(executed).size <= 2, executed) // window sort + final orderBy
    assert(!executed.contains("Exchange SinglePartition"), executed)
    assert(!executed.contains("Join"), executed)
  }

  test("changepoint and theil-sen run on the collapsed daily series — corpus partial-aggs first") {
    val cp = Analytics.qEventChangepoint(spark, sf).queryExecution.executedPlan.toString
    assert(cp.contains("partial"), s"daily collapse not map-side combined:\n$cp")
    assert(!cp.contains("Join"), cp)
    assert(!cp.contains("CartesianProduct"), cp)
    val ts = Analytics.qEventTheilSen(spark, sf).queryExecution.executedPlan.toString
    assert(ts.contains("partial"), ts)
    // the day-pair build is an equi-join on event_type, never a product
    assert(!ts.contains("CartesianProduct") && !ts.contains("BroadcastNestedLoopJoin"), ts)
  }

  test("streaks: user-day dedup combines map-side; island aggs reuse the window's user partitioning") {
    val executed = Analytics.qUserStreaks(spark, sf)
      .queryExecution.executedPlan.toString
    // (user, dn) dedup + user window; the island and per-user aggs cluster
    // on user-prefixed keys, so neither may add a third hash exchange
    assert("Exchange hashpartitioning".r.findAllIn(executed).size <= 2, executed)
    assert(executed.contains("partial"), executed)
    assert(!executed.contains("Exchange SinglePartition"), executed)
    assert(!executed.contains("Join"), executed)
  }

  test("type cosine: profile self-join is user-keyed equi; norms broadcast onto the pair table") {
    val p = plan(Analytics.qTypeCosine(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("debounce: one (user,type)-keyed aggregate — fold in the projection, no window, no join") {
    val p = plan(Analytics.qEventDebounce(spark, sf))
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate") ||
      p.contains("SortAggregate"), p)
  }

  test("TPC-H tail is product-free; Q2/Q20 prune the fact through broadcast dims") {
    for ((name, df) <- Seq(
        "q2" -> TpchTail.q2MinCostSupplier(spark, sf),
        "q12" -> TpchTail.q12ShipPriority(spark, sf),
        "q13" -> TpchTail.q13OrderCountDist(spark, sf),
        "q20" -> TpchTail.q20DominantSupplier(spark, sf),
        "q21" -> TpchTail.q21SoleLateSupplier(spark, sf))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), s"$name cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name nested loop:\n$p")
    }
    // Q2: the part/supplier filters reach the fact as broadcast probes
    val q2 = plan(TpchTail.q2MinCostSupplier(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(q2).size >= 2, q2)
    // Q20: the qualifying-supplier list enters supplier as a SEMI join
    val q20 = plan(TpchTail.q20DominantSupplier(spark, sf))
    assert(q20.contains("LeftSemi"), q20)
  }

  test("Q6 pushes all three predicates into the lineitem scan and reads 4 columns") {
    val p = plan(TpchTail.q6ForecastRevenue(spark, sf))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("IsNotNull(l_shipdate"), p)
    assert(p.contains(
      "ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate:timestamp"),
      p)
  }

  test("Q11's global threshold rides a 1-row broadcast; the fact aggregates once") {
    val p = plan(TpchTail.q11ImportantStock(spark, sf))
    // scalar side: 1-row cross broadcast (the q22 pattern)
    assert(p.contains("BroadcastNestedLoopJoin BuildRight, Cross"), p)
    assert(!p.contains("CartesianProduct"), p)
    // per-part aggregate combines map-side before its exchange
    assert(p.contains("partial_sum"), p)
  }

  test("bm25 top-20 plans as TakeOrdered heaps, never a global sort") {
    val p = plan(graft.ext.TextOps.qDocBm25(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dsir model tables ride broadcasts; the corpus never nested-loops") {
    val p = plan(graft.ext.CorpusOps.qDocDsirWeights(spark, sf))
    // bucket tables + totals: two broadcast hash probes and the 1-row cross
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(p.contains("BroadcastNestedLoopJoin BuildRight, Cross"), p)
    assert(!p.contains("CartesianProduct"), p)
    // smoothing must tolerate target-absent buckets: a LEFT outer probe
    assert(p.contains("LeftOuter"), p)
  }

  test("mmr result is constant-size model state; greedy ran on the driver") {
    // the distributed pool cut happens inside the collect; what the caller
    // receives is the mmrK-row local result — LocalTableScan, zero
    // exchanges, nothing corpus-sized survives into the returned plan
    val p = plan(graft.ext.Similarity.qEmbMmr(spark, sf))
    assert(p.contains("LocalTableScan"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("recall audits keep both arms shuffle-joined/broadcast — no products") {
    for (df <- Seq(
        graft.ext.Dedup.qDocMinhashEval(spark, sf),
        graft.ext.Similarity.qEmbAnnRecall(spark, sf))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), p)
    }
    spark.catalog.clearCache()
  }

  test("semantic decontam: eval set broadcast-probes the train scan — no corpus shuffle") {
    // the scaladoc claim: the training corpus is scanned once and never
    // exchanged; the only join is the sanctioned broadcast nested loop of
    // the benchmark-sized eval side against the pipelined train scan
    val p = plan(graft.ext.Similarity.qEmbDecontam(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"train side shuffle-joined:\n$p")
  }

  test("hybrid RRF: the dense pool cut is a distributed top-k heap, not a global sort") {
    val p = plan(graft.ext.Similarity.qHybridRrf(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), s"no TakeOrdered pool cut in:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dataset fingerprint and anisotropy are pure aggregates — no joins of corpus frames") {
    val fp = plan(graft.etl.Quality.qDatasetFingerprint(spark, sf))
    assert(!fp.contains("Join"), s"unexpected join in fingerprint plan:\n$fp")
    // anisotropy: the only joins are the 1-row broadcast crosses for totals
    val an = plan(graft.ext.Similarity.qEmbAnisotropy(spark, sf))
    assert(!an.contains("SortMergeJoin") && !an.contains("CartesianProduct"), an)
  }

  test("HHI and advisor keep dims on broadcasts; burstiness windows per (user, type)") {
    val hhi = plan(graft.queries.Warehouse.qSuppHhi(spark, sf))
    assert(!hhi.contains("SortMergeJoin"), s"dim chain shuffle-joined:\n$hhi")
    assert(hhi.contains("BroadcastHashJoin"), hhi)
    val adv = plan(graft.etl.Layout.qLayoutAdvisor(spark, sf))
    assert(!adv.contains("Join"), adv)
    val b = graft.queries.Analytics.qEventBurstiness(spark, sf)
    val pb = plan(b)
    assert("Window \\[.*\\], \\[user_id[#0-9L]*, event_type".r.findFirstIn(pb).isDefined,
      s"lag window not keyed by (user, type):\n$pb")
    assert(!b.queryExecution.executedPlan.toString.contains("Exchange SinglePartition"),
      "single-partition funnel in burstiness")
  }

  test("IVF-PQ: encode/probe are broadcast-only over the corpus — no shuffle join, heap top-k") {
    val p = plan(graft.ext.Similarity.qEmbIvfPq(spark, sf))
    // the corpus touches: 1-row quantizer/codebook crosses (BroadcastNestedLoop
    // with a single-row build), the cell-dim broadcast, the vec_id label
    // rejoin, and the cell-equi probe — never a SortMergeJoin of corpus-sized
    // frames at this plan's broadcast points, never a cartesian
    assert(!p.contains("CartesianProduct"), s"cartesian in IVFPQ plan:\n$p")
    assert(p.contains("TopKPerKey") || p.contains("TakeOrderedAndProject"),
      s"no native top-k operator in IVFPQ plan:\n$p")
  }

  test("bootstrap: the x40 fan-out combines map-side — shuffle carries (type, rep) partials") {
    val df = Analytics.qEventBootstrap(spark, sf)
    val p = plan(df)
    // partial_sum before the exchange proves the replicate fan-out never
    // crosses the wire row-by-row
    assert(p.contains("partial_sum") || p.contains("Partial"),
      s"no map-side partial aggregation in bootstrap plan:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("percentile kernel: one cached grid feeds every pass, joins broadcast, no SMJ") {
    // the rankQuantiles one-corpus-scan claim: the (type, cent) count grid
    // is persisted and every kernel pass reads the cache; all grid-side
    // joins (rank selection, bound join-back) are broadcast
    for (df <- Seq(Analytics.qValuePercentiles(spark, sf),
        Analytics.qEventWinsorized(spark, sf),
        Analytics.qEventAnomalies(spark, sf))) {
      val p = plan(df)
      assert(p.contains("InMemoryTableScan"), s"grid not cached:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    }
  }

  test("epoch shuffle: the row-scale rank window carries the (epoch, bucket) key") {
    val p = plan(graft.ext.TextOps.qDocEpochShuffle(spark, sf))
    // two-level decomposition: the corpus-touching row_number must be
    // partitioned by BOTH epoch and bucket (the offset window runs on the
    // bounded bucket table only), and nothing funnels through one task
    assert("windowspecdefinition\\(e#\\d+L?, bkt#\\d+L?".r.findFirstIn(p).isDefined,
      s"row-scale rank window lost its (e, bkt) partition key:\n$p")
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ivf append-only: the no-rebuild path never exchanges on a row key") {
    import org.apache.spark.sql.functions._
    // "the corpus never reshuffles in the no-rebuild path": every exchange
    // in the append plan must be keyed on bounded-cardinality columns
    // (cell / label / dim) — a hashpartitioning on vec_id would mean the
    // row-scale corpus itself got reshuffled, which the O(batch) claim
    // forbids. The quantizer reaches rows through the 1-row broadcast
    // fold, so no row-keyed join exists either.
    val raw = graft.model.Tables.embeddings(spark, sf)
    def side(newSide: Boolean) = raw
      .filter(if (newSide) col("vec_id") % 10 === 0 else col("vec_id") % 10 =!= 0)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), _.cast("double")).as("e"))
    val q = graft.ext.Similarity.centroidArrayOfE(side(false), None)
    val stored = graft.ext.Similarity.ivfCellStats(side(false), q)
    val p = plan(graft.ext.Similarity.ivfAppendOnly(stored, q, side(true)))
    assert(!"hashpartitioning\\([^)]*vec_id".r.findFirstIn(p).isDefined,
      s"no-rebuild append reshuffled the corpus on vec_id:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // the stat merge's full-outer join is |cells|-sized and must be keyed
    // on cell — any join on another key would be row-scale work
    "SortMergeJoin \\[(\\w+)#".r.findAllMatchIn(p).foreach(m =>
      assert(m.group(1) == "cell", s"row-scale sort-merge join:\n$p"))
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"quantizer should reach rows via the 1-row broadcast fold:\n$p")
  }

  test("ivf incremental: no cartesian, cell stats combine map-side") {
    // the O(batch) claim's plan shape: the quantizer reaches rows through
    // the sanctioned 1-row broadcast fold (BNLJ), never a product of
    // corpus-sized frames, and the per-cell stats partial-aggregate
    // before the exchange
    val p = plan(graft.ext.Similarity.qEmbIvfIncremental(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_sum") || p.contains("Partial"),
      s"no map-side partial aggregation:\n$p")
  }

  test("KS/Mann-Whitney cumulative windows partition by event_type") {
    // (the 1-row span aggregate's SinglePartition exchange is the sanctioned
    // scalar funnel; what must never happen is the VALUE-grain window
    // running unpartitioned)
    for (df <- Seq(Analytics.qEventKsDrift(spark, sf),
        Analytics.qEventMannWhitney(spark, sf))) {
      val p = plan(df)
      assert("Window \\[.*\\], \\[event_type".r.findFirstIn(p).isDefined,
        s"cumulative window not keyed by event_type:\n$p")
      assert(!"Window \\[[^\\]]*\\], \\[\\]".r.findFirstIn(p).isDefined,
        s"empty-key window in drift-test plan:\n$p")
    }
  }

  test("bt rating: MM rounds run on model state only — no corpus rescan in the final plan") {
    // matches/neighbor aggregation pay the corpus once (persisted nbr,
    // collected as |sources|²-bounded model state); the MM rounds run on
    // the driver (r15, the kmeans/MMR precedent) and the final frame is
    // the driver-built rating table. The final plan must therefore be a
    // pure local relation — no parquet rescan, no join, no aggregation:
    // the strongest possible form of the no-corpus-rescan claim.
    val p = plan(graft.ext.CorpusOps.qDocBtRating(spark, sf))
    assert(p.contains("LocalTableScan"),
      s"expected the driver-built rating table as a local relation:\n$p")
    assert(!p.contains("FileScan parquet"),
      s"MM/normalization replanned a corpus scan:\n$p")
    spark.catalog.clearCache()
  }

  test("streaming semantic screen: the per-batch plan has ZERO shuffle exchanges") {
    // the E328 O(batch) claim, pinned structurally: batch-side cell
    // assignment is the narrow 1-row-quantizer fold (BNLJ against a
    // single-row build), the verify join probes a BROADCAST eval-side
    // assignment, and nothing groups or sorts — so a micro-batch plan
    // must contain no shuffle at all. (The quantizer/eval frames are
    // stream-lifetime state, built once outside the per-batch path.)
    import org.apache.spark.sql.functions.{col, transform => atransform}
    val emb = graft.model.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"),
        atransform(col("embedding"), _.cast("double")).as("e"))
    val qArr = graft.ext.Similarity.centroidArrayOfE(
      emb.filter(col("vec_id") % 2 === 0), None).localCheckpoint(true)
    val evalA = graft.ext.Similarity.semanticEvalAssign(
      emb.filter(col("vec_id") % 50 === 0), qArr).localCheckpoint(true)
    val p = plan(graft.ext.Similarity.semanticScreenWith(
      emb.filter(col("vec_id") % 2 === 1).select(col("vec_id"), col("e")),
      evalA, qArr))
    assert(!p.contains("Exchange hashpartitioning") &&
      !p.contains("Exchange rangepartitioning"),
      s"shuffle in the per-batch screen plan:\n$p")
    assert(p.contains("BroadcastHashJoin [cell"),
      s"verify join must probe the broadcast eval assignment:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }
}
