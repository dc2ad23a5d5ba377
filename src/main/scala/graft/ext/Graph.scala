package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Distributed graph analytics beyond [[Dedup.connectedComponents]]'s
  * label propagation: an iterative PageRank kernel in SCALED INTEGER
  * arithmetic, so ranks are bit-identical at any parallelism and on any
  * engine — the floating-point formulation sums doubles in
  * partition-merge order and drifts in the low bits run-to-run, which
  * would fail both the driver's hash compare and any cross-run
  * reproducibility audit of a production ranking job.
  *
  * Fixed-point scheme: ranks are BIGINT multiples of 1/SCALE
  * (SCALE = 10¹²). One iteration is
  *
  *   r'(v) = floor(0.15·SCALE) + floor(85 · Σ_{u→v} floor(r(u)/deg⁺(u)) / 100)
  *
  * — every operation an exact integer multiply/divide/sum, identically
  * floored in Spark (`div`) and DuckDB (`//`). Dangling-node mass (no
  * out-edges) is dropped, the standard simplification; floors leak
  * < deg⁺ · 1/SCALE per node per round. Neither affects ordering at any
  * realistic scale and both are deterministic.
  *
  * Scale (100 TB graph): one iteration = one join of edges against the
  * |V|-row rank table (shuffle keyed on src — co-partition edges by src
  * at write time and the probe is exchange-free on the edge side) + one
  * dst-keyed partial aggregate. State per round is |V| rows, lineage is
  * truncated per round ([[Dedup.connectedComponents]]'s eager
  * localCheckpoint pattern) so plans stay O(1) deep regardless of
  * iteration count.
  */
object Graph {

  /** Scale-adaptive spread (r15, guide §2.5/§2.6): hash-partition `df` on
    * `key` to default parallelism ONLY when its current plan would run on
    * fewer partitions. Every graph query starts from the
    * orders⋈lineitem purchase-edge build, whose map-side join + partial
    * distinct cost follows ROW count while scan parallelism follows
    * BYTES — a tiny sf0.1 scan yields 3 splits and serializes the build
    * onto 3 of 32 cores. At production scale the scan already fans wider
    * than the core count and this is a no-op, so no extra exchange is
    * paid where it wouldn't help. `key` is always the equi-join key, so
    * the spread's partitioning is the one the join wants anyway.
    */
  private def spread(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par, key) else df
  }

  /** The (l_orderkey, l_suppkey) projection of lineitem, spread to full
    * parallelism — the shared stream side of every purchase-graph edge
    * build below.
    */
  private def lineitemOrderSupp(spark: SparkSession, sfDir: String): DataFrame =
    spread(Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey")), col("l_orderkey"))

  /** Scaled-integer rank unit: 1.0 == 10¹². */
  val rankScale: Long = 1000000000000L

  /** Iterative PageRank over `edges(src, dst)` for the node set
    * `nodes(id)` (nodes carry rank even with no edges — they keep the
    * teleport mass). Returns `(id, rank_scaled)`; damping fixed at the
    * canonical 0.85 as an exact rational 85/100.
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "pageRank needs at least one iteration")
    val spark = nodes.sparkSession
    val e = edges.select(col("src"), col("dst"))
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // contributions depend only on (src rank, outdeg): pre-join once, and
    // MATERIALIZE — every iteration probes this frame, and without the
    // checkpoint the caller's whole edge-construction pipeline (often a
    // join+distinct) re-executes per round (measured 3× cost at iters=3)
    val srcSide = e.join(outdeg, "src").localCheckpoint(true)
    var ranks = nodes.select(col("id"), lit(rankScale).as("r"))
    var it = 0
    while (it < iters) {
      val inbox = srcSide
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("r div deg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("s"))
      ranks = nodes.select(col("id"))
        .join(inbox, Seq("id"), "left")
        .select(col("id"),
          (lit(rankScale * 15 / 100) +
            expr(s"(85 * coalesce(s, 0L)) div 100")).as("r"))
        // truncate lineage each round: without this the plan nests one
        // join+agg deeper per iteration and planning cost explodes
        .localCheckpoint(true)
      it += 1
    }
    ranks.select(col("id"), col("r").as("rank_scaled"))
  }

  /** Supplier-id offset into the shared node-id space: customer keys and
    * supplier keys overlap numerically, so supplier node ids are
    * s_suppkey + this. Harness keyspaces stay far below it.
    */
  val supplierIdOffset: Long = 1000000L

  /** PageRank over the customer→supplier purchase graph (who supplies
    * the well-connected buyers): nodes = customers ∪ offset suppliers,
    * edges = DISTINCT (o_custkey → l_suppkey) pairs from orders ⋈
    * lineitem, 3 exact-integer iterations. Customers have no in-edges, so
    * they settle at pure teleport rank; suppliers accumulate rank
    * proportional to their buyer reach — surfaced per node with its kind.
    */
  def qGraphPagerank(spark: SparkSession, sfDir: String): DataFrame = {
    val nodes = Tables.customer(spark, sfDir).select(col("c_custkey").as("id"))
      .unionAll(Tables.supplier(spark, sfDir)
        .select((col("s_suppkey") + supplierIdOffset).as("id")))
    val edges = Tables.orders(spark, sfDir)
      .join(lineitemOrderSupp(spark, sfDir),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + supplierIdOffset).as("dst"))
      .distinct()
    pageRank(nodes, edges, iters = 3)
      .select(col("id").as("node_id"),
        when(col("id") >= supplierIdOffset, lit("supplier"))
          .otherwise(lit("customer")).as("kind"),
        col("rank_scaled"))
      .orderBy(col("node_id"))
  }

  /** Oracle: the same three iterations unrolled as chained CTEs — every
    * step exact integer arithmetic, so the compare is hash-exact. DuckDB
    * widens BIGINT sums to HUGEINT; the final cast narrows back.
    */
  val qGraphPagerankSql: String = {
    def step(prev: String, out: String): String =
      s"""$out AS (
         |  SELECT n.id,
         |    150000000000 + CAST((85 * COALESCE(m.s, 0)) // 100 AS BIGINT) AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS id, SUM(p.r // o.deg) AS s
         |    FROM edges e
         |    JOIN $prev p ON p.id = e.src
         |    JOIN outdeg o ON o.src = e.src
         |    GROUP BY e.dst) m ON m.id = n.id)""".stripMargin
    s"""WITH nodes AS (
       |  SELECT c_custkey AS id FROM customer
       |  UNION ALL SELECT s_suppkey + 1000000 AS id FROM supplier
       |),
       |edges AS (
       |  SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |),
       |outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
       |r0 AS (SELECT id, CAST(1000000000000 AS BIGINT) AS r FROM nodes),
       |${step("r0", "r1")},
       |${step("r1", "r2")},
       |${step("r2", "r3")}
       |SELECT id AS node_id,
       |  CASE WHEN id >= 1000000 THEN 'supplier' ELSE 'customer' END AS kind,
       |  r AS rank_scaled
       |FROM r3 ORDER BY node_id""".stripMargin
  }

  /** Unreached-distance sentinel: min-propagation stays pure BIGINT
    * arithmetic (no NULL-vs-least edge cases to keep engine-identical).
    */
  val unreached: Long = 1000000000L

  /** Multi-source BFS / hop-distance: iterative min-plus propagation of
    * `dist(v) = min(dist(v), min over edges u→v of dist(u)+1)` for
    * `maxHops` rounds — after round h every node within h hops of a
    * source carries its exact hop distance. The relational form of
    * Pregel's shortest-path program; [[unreached]] keeps the fold in
    * sentinel integers.
    *
    * Scale: identical shape to [[pageRank]] — per round one src-keyed
    * join of edges against the |V|-row frontier and one dst-keyed
    * partial-agg min (map-side combined), with per-round lineage
    * truncation. Rounds = graph diameter bound, a plan constant.
    */
  def shortestPaths(nodes: DataFrame, edges: DataFrame, sources: DataFrame,
      maxHops: Int): DataFrame = {
    require(maxHops >= 1, "shortestPaths needs at least one round")
    // materialized once: each relaxation round re-probes the edge frame
    // (see pageRank's srcSide note)
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    var dist = nodes.select(col("id"))
      .join(sources.select(col("id"), lit(0L).as("s0")), Seq("id"), "left")
      .select(col("id"), coalesce(col("s0"), lit(unreached)).as("d"))
    var it = 0
    while (it < maxHops) {
      val relaxed = e
        .join(dist.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), (col("d") + 1).as("nd"))
        .groupBy(col("id")).agg(min(col("nd")).as("nd"))
      dist = dist.join(relaxed, Seq("id"), "left")
        .select(col("id"), least(col("d"), coalesce(col("nd"), lit(unreached))).as("d"))
        .localCheckpoint(true)
      it += 1
    }
    dist.select(col("id"), col("d").as("hops"))
  }

  /** Hop distance from the first two suppliers through the UNDIRECTED
    * purchase graph (customer↔supplier edges both ways): 1 hop = their
    * direct buyers, 2 hops = co-suppliers of those buyers, … — the
    * "blast radius" traversal behind supply-chain impact and
    * account-linking analyses. 4 rounds; unreached nodes are dropped
    * (their sentinel is an implementation detail, not a distance).
    */
  def qGraphReach(spark: SparkSession, sfDir: String): DataFrame = {
    val nodes = Tables.customer(spark, sfDir).select(col("c_custkey").as("id"))
      .unionAll(Tables.supplier(spark, sfDir)
        .select((col("s_suppkey") + supplierIdOffset).as("id")))
    val fwd = Tables.orders(spark, sfDir)
      .join(lineitemOrderSupp(spark, sfDir),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + supplierIdOffset).as("dst"))
      .distinct()
    val edges = fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst")))
    val sources = Tables.supplier(spark, sfDir)
      .filter(col("s_suppkey") <= 2)
      .select((col("s_suppkey") + supplierIdOffset).as("id"))
    shortestPaths(nodes, edges, sources, maxHops = 4)
      .filter(col("hops") < unreached)
      .select(col("id").as("node_id"),
        when(col("id") >= supplierIdOffset, lit("supplier"))
          .otherwise(lit("customer")).as("kind"),
        col("hops"))
      .orderBy(col("node_id"))
  }

  /** Oracle: 4 unrolled min-plus rounds over the same sentinel. */
  val qGraphReachSql: String = {
    def round(prev: String, out: String): String =
      s"""$out AS (
         |  SELECT d.id, least(d.d, COALESCE(m.nd, $unreached)) AS d
         |  FROM $prev d LEFT JOIN (
         |    SELECT e.dst AS id, MIN(p.d + 1) AS nd
         |    FROM edges e JOIN $prev p ON p.id = e.src
         |    GROUP BY e.dst) m ON m.id = d.id)""".stripMargin
    s"""WITH nodes AS (
       |  SELECT c_custkey AS id FROM customer
       |  UNION ALL SELECT s_suppkey + 1000000 AS id FROM supplier
       |),
       |fwd AS (
       |  SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |),
       |edges AS (
       |  SELECT src, dst FROM fwd UNION ALL SELECT dst AS src, src AS dst FROM fwd
       |),
       |d0 AS (
       |  SELECT id, CASE WHEN id IN (SELECT s_suppkey + 1000000 FROM supplier
       |                              WHERE s_suppkey <= 2)
       |              THEN CAST(0 AS BIGINT) ELSE CAST($unreached AS BIGINT) END AS d
       |  FROM nodes
       |),
       |${round("d0", "d1")},
       |${round("d1", "d2")},
       |${round("d2", "d3")},
       |${round("d3", "d4")}
       |SELECT id AS node_id,
       |  CASE WHEN id >= 1000000 THEN 'supplier' ELSE 'customer' END AS kind,
       |  d AS hops
       |FROM d4 WHERE d < $unreached ORDER BY node_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // Triangle counting (degree-ordered orientation)
  // ------------------------------------------------------------------

  /** Triangle counting over the part co-order graph (parts appearing in
    * the same order are linked) with the DEGREE-ORDERED ORIENTATION
    * trick: orient every undirected edge from its lower-degree endpoint
    * to its higher-degree one (ties by id), then count wedges only at
    * each edge's SOURCE and close them with one equi-join against the
    * oriented edge set. Per-triangle work happens exactly once, and —
    * the 100 TB point — the wedge join fans out by ORIENTED out-degree,
    * which the orientation bounds at O(√|E|) even on power-law graphs
    * where a hub's undirected degree is O(|V|) (the wedge count at an
    * unoriented hub would be quadratic in its degree).
    *
    * The closure never materializes the wedge stream at all: each
    * node's oriented out-neighborhood folds into one array and every
    * EDGE u→v intersects adj⁺(u) with adj⁺(v) (compact-forward, the
    * Latapy-family algorithm) — see the inline comment for why each
    * triangle lands exactly once and why this beats the
    * wedge-join-then-close plan it replaced (r7: 41M wedge rows through
    * a broadcast probe; now |E| rows with in-codegen intersects).
    *
    * Output: per-node triangle participation + the global count (the
    * clustering-coefficient numerator).
    */
  def qGraphTriangles(spark: SparkSession, sfDir: String): DataFrame = {
    // NO pre-distinct on (ok, p): the downstream edge-level distinct is
    // the dedup barrier anyway (repeated partkeys within an order are
    // rare), so pre-deduping would add a full extra shuffle of the scan
    // to save join rows it doesn't need to save
    val pairs = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
    // per-order quadratic, bounded by order width (≤7 lineitems) — the
    // standard co-occurrence edge build, same shape as qEventCooccur.
    // The STREAM side is hash-spread on the order key first (r15, guide
    // §2.5/§2.6): the expansion's cost follows order count, not input
    // bytes, so leaving it on raw scan splits serializes the quadratic
    // work onto however few splits the file layout produced (3 tasks at
    // sf0.1; one giant unsplittable file in production) — the shuffle
    // moves only the 16-byte (ok, p) projection and the order-key
    // partitioning is what the equi-join clusters on anyway.
    val par = spark.sparkContext.defaultParallelism
    val und = pairs.repartition(par, col("ok")).as("a")
      .join(pairs.as("b"), col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .distinct()
      .persist()
    und.count() // eager: degree agg + both orientation probes consume it
    // MATERIALIZED (r15): deg feeds TWO broadcast attachment joins, and a
    // broadcast exchange cannot reuse a sibling broadcast's subtree — the
    // node-degree aggregation over the full edge set ran twice (probe:
    // two identical 64-task stages). localCheckpoint(true) runs it once;
    // both broadcast builds then read |V| cached rows.
    val deg = und.select(col("u").as("n")).unionAll(und.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
      .localCheckpoint(true)
    // orient low→high by (degree, id): a total order, so each undirected
    // edge appears exactly once; dst_d rides along for the wedge compare
    val lowFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    // deg is |V| rows (node-bounded, not edge-bounded) — broadcast both
    // attachment joins so the persisted edge set never reshuffles; at
    // billions of nodes swap for shuffle_hash, the algebra is unchanged
    val oriented = und
      .join(broadcast(deg.select(col("n").as("u"), col("d").as("du"))), "u")
      .join(broadcast(deg.select(col("n").as("v"), col("d").as("dv"))), "v")
      // 1-core prune, free here (both endpoint degrees already ride the
      // row): an edge with a degree-1 endpoint cannot lie in a triangle
      // (all three triangle vertices have degree ≥2), so dropping it
      // changes nothing downstream while shrinking the persisted edge
      // set, the closing-probe broadcast and the wedge stream. On a
      // power-law co-occurrence graph the leaf fringe is a large share
      // of |E| at any scale.
      .filter(col("du") > 1 && col("dv") > 1)
      .select(
        when(lowFirst, col("u")).otherwise(col("v")).as("src"),
        when(lowFirst, col("v")).otherwise(col("u")).as("dst"))
      .persist()
    oriented.count() // eager: adjacency build + both probe sides
    // COMPACT-FORWARD closure: instead of materializing the wedge stream
    // (Σ C(outdeg,2) rows — 41M at sf0.1, the whole cost of the r7 plan)
    // through a join, fold each node's oriented out-neighborhood into one
    // array and intersect per EDGE: for oriented edge u→v every
    // w ∈ adj⁺(u) ∩ adj⁺(v) closes a triangle, and each triangle
    // (a→b, a→c, b→c) is found exactly once — at its base edge a→b
    // (adj⁺ of b never contains a, adj⁺ of c contains neither). The
    // probe side stays |E| rows; the quadratic wedge volume becomes
    // per-row array-intersect work inside codegen, no shuffle, no 41M-row
    // materialization. Out-degree is bounded at O(√|E|) by the
    // orientation, so each adj array is small and the adjacency table is
    // |V| rows — broadcastable far beyond this harness (at billions of
    // edges swap both broadcasts for hint("shuffle_hash") on src/dst:
    // the intersect math is unchanged).
    // MATERIALIZED (r15): adj feeds TWO broadcast probes (nu and nv) and
    // would otherwise be aggregated twice, same sibling-broadcast
    // non-reuse as deg above — the collect_list shuffle is the closure's
    // most expensive build, so run it exactly once.
    val adj = oriented.groupBy(col("src"))
      .agg(collect_list(col("dst")).as("nbrs"))
      .localCheckpoint(true)
    val tris = oriented.select(col("src"), col("dst"))
      .join(broadcast(adj.select(col("src"), col("nbrs").as("nu"))), "src")
      .join(broadcast(adj.select(col("src").as("dst"), col("nbrs").as("nv"))), "dst")
      .select(col("src").as("apex"), col("dst").as("x"),
        explode(array_intersect(col("nu"), col("nv"))).as("y"))
    tris.select(explode(array(col("apex"), col("x"), col("y"))).as("part_id"))
      .groupBy(col("part_id")).agg(count(lit(1)).as("n_triangles"))
      .orderBy(col("part_id"))
  }

  val qGraphTrianglesSql: String =
    """WITH pairs AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
      |und AS (
      |  SELECT DISTINCT a.p AS u, b.p AS v
      |  FROM pairs a JOIN pairs b ON a.ok = b.ok AND a.p < b.p
      |),
      |deg AS (
      |  SELECT n, count(*) AS d FROM (
      |    SELECT u AS n FROM und UNION ALL SELECT v AS n FROM und)
      |  GROUP BY n
      |),
      |oriented AS (
      |  SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN u ELSE v END AS src,
      |         CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN v ELSE u END AS dst,
      |         CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN dv.d ELSE du.d END AS dst_d
      |  FROM und
      |  JOIN deg du ON du.n = u
      |  JOIN deg dv ON dv.n = v
      |),
      |wedges AS (
      |  SELECT e1.src AS apex, e1.dst AS x, e2.dst AS y
      |  FROM oriented e1 JOIN oriented e2
      |    ON e1.src = e2.src
      |   AND (e1.dst_d < e2.dst_d OR (e1.dst_d = e2.dst_d AND e1.dst < e2.dst))
      |),
      |tris AS (
      |  SELECT apex, x, y FROM wedges JOIN oriented o
      |    ON x = o.src AND y = o.dst
      |)
      |SELECT part_id, count(*) AS n_triangles
      |FROM (SELECT unnest([apex, x, y]) AS part_id FROM tris)
      |GROUP BY part_id ORDER BY part_id""".stripMargin

  // ------------------------------------------------------------------
  // Bounded-round k-core peeling (E158)
  // ------------------------------------------------------------------

  /** Iterative k-CORE PEELING: repeatedly delete nodes of degree < k
    * (with the edges they anchor) — after enough rounds only the k-core
    * survives, the standard "dense engagement nucleus" extraction
    * behind community seeding and spam-ring mining. `rounds` BOUNDS the
    * iteration exactly like [[pageRank]]'s `iters`: each round is one
    * degree aggregate + two semi joins, per-round lineage truncated, so
    * the plan stays O(1) deep; a fixpoint run would iterate until a
    * round deletes nothing (the peel sequence is confluent — deletion
    * order can't change the final core, which is what makes the
    * bounded prefix well-defined too).
    *
    * `edges` must carry each undirected edge in BOTH directions, so
    * out-degree IS undirected degree and every round stays a src-keyed
    * aggregate — no union per round.
    *
    * Scale (100 TB): degree agg is map-side combinable on src; the
    * kept-set semi joins are key-only (node id), broadcastable once the
    * peel shrinks the survivor set; round count is a plan constant.
    */
  def kCorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(rounds >= 1, "kCorePeel needs at least one round")
    var e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    var it = 0
    while (it < rounds) {
      val kept = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("src").as("n"))
      e = e
        .join(kept.select(col("n").as("src")), Seq("src"), "left_semi")
        .join(kept.select(col("n").as("dst")), Seq("dst"), "left_semi")
        .localCheckpoint(true)
      it += 1
    }
    e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("id"), col("deg"))
  }

  /** 3-core of the undirected customer↔supplier purchase graph after 4
    * peel rounds: the mutually-reinforcing trading nucleus — customers
    * kept only while ≥3 of their suppliers survive, and vice versa.
    * Surviving nodes report their within-core degree.
    */
  def qGraphKcore(spark: SparkSession, sfDir: String): DataFrame = {
    val fwd = Tables.orders(spark, sfDir)
      .join(lineitemOrderSupp(spark, sfDir),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + supplierIdOffset).as("dst"))
      .distinct()
    val edges = fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst")))
    kCorePeel(edges, k = 3, rounds = 4)
      .select(col("id").as("node_id"),
        when(col("id") >= supplierIdOffset, lit("supplier"))
          .otherwise(lit("customer")).as("kind"),
        col("deg"))
      .orderBy(col("node_id"))
  }

  /** Oracle: the identical 4 unrolled peel rounds. */
  val qGraphKcoreSql: String = {
    def round(prev: String, i: Int): String =
      s"""k$i AS (SELECT src AS n FROM $prev GROUP BY src HAVING count(*) >= 3),
         |e$i AS (
         |  SELECT e.src, e.dst FROM $prev e
         |  WHERE e.src IN (SELECT n FROM k$i) AND e.dst IN (SELECT n FROM k$i))""".stripMargin
    s"""WITH fwd AS (
       |  SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |),
       |e0 AS (
       |  SELECT src, dst FROM fwd UNION ALL SELECT dst AS src, src AS dst FROM fwd
       |),
       |${round("e0", 1)},
       |${round("e1", 2)},
       |${round("e2", 3)},
       |${round("e3", 4)}
       |SELECT src AS node_id,
       |  CASE WHEN src >= 1000000 THEN 'supplier' ELSE 'customer' END AS kind,
       |  CAST(count(*) AS BIGINT) AS deg
       |FROM e4 GROUP BY src ORDER BY node_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // Link prediction: common-neighbor / Jaccard candidate scoring
  // ------------------------------------------------------------------

  /** Reported candidate links. */
  final val linkPredTopK = 20

  /** Minimum shared neighbors for a candidate pair. */
  final val linkPredMinCommon = 2

  /** Common-neighbor link prediction over the bipartite purchase graph:
    * score supplier pairs by the Jaccard similarity of their customer
    * neighborhoods — |N(a)∩N(b)| / |N(a)∪N(b)| — and report the top
    * [[linkPredTopK]] non-trivial candidates (≥ [[linkPredMinCommon]]
    * shared buyers). The classic "who-should-trade-next" /
    * account-linking primitive: a high-Jaccard supplier pair serves the
    * same buyer population without (necessarily) any direct tie.
    *
    * Scale (100 TB): the wedge generation is per-CUSTOMER quadratic in
    * that customer's distinct-supplier width — the same bounded
    * co-occurrence build as [[qGraphTriangles]]'s edge stage; on graphs
    * with unbounded hub widths, cap or sample hub neighborhoods, or
    * switch candidate generation to the prefix-filter AllPairs plan
    * ([[Dedup.qDocSimJoinPrefix]] — neighborhoods ARE sets, the same
    * algorithm applies verbatim). Counting is one (s_a, s_b)-keyed
    * map-side-combined aggregate; degrees join in supplier-keyed
    * (broadcastable — |suppliers| ≪ |edges|); the top-k plans as
    * TakeOrdered. Jaccard divides two exact BIGINTs once at the end, so
    * scores and the (score DESC, s_a, s_b) cut are engine-identical.
    */
  def qGraphLinkpred(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = Tables.orders(spark, sfDir)
      .join(lineitemOrderSupp(spark, sfDir),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct()
      .persist()
    edges.count() // eager: wedge self-join + degree agg consume it
    // MATERIALIZED (r15): deg feeds two broadcast attachments and a
    // sibling broadcast cannot reuse the other's subtree — without the
    // checkpoint the degree aggregate ran twice (see qGraphTriangles).
    val deg = edges.groupBy(col("s")).agg(count(lit(1)).as("d"))
      .localCheckpoint(true)
    val pairs = edges.as("a")
      .join(edges.as("b"), col("a.c") === col("b.c") && col("a.s") < col("b.s"))
      .groupBy(col("a.s").as("s_a"), col("b.s").as("s_b"))
      .agg(count(lit(1)).as("common"))
      .filter(col("common") >= linkPredMinCommon)
    pairs
      .join(broadcast(deg.select(col("s").as("s_a"), col("d").as("deg_a"))), "s_a")
      .join(broadcast(deg.select(col("s").as("s_b"), col("d").as("deg_b"))), "s_b")
      .select(col("s_a"), col("s_b"), col("common"), col("deg_a"), col("deg_b"),
        (col("common").cast("double") /
          (col("deg_a") + col("deg_b") - col("common")).cast("double")).as("jaccard"))
      .orderBy(col("jaccard").desc, col("s_a"), col("s_b"))
      .limit(linkPredTopK)
  }

  val qGraphLinkpredSql: String =
    s"""WITH edges AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |),
       |deg AS (SELECT s, count(*) AS d FROM edges GROUP BY s),
       |pairs AS (
       |  SELECT a.s AS s_a, b.s AS s_b, count(*) AS common
       |  FROM edges a JOIN edges b ON a.c = b.c AND a.s < b.s
       |  GROUP BY a.s, b.s
       |  HAVING count(*) >= $linkPredMinCommon
       |)
       |SELECT s_a, s_b, common, da.d AS deg_a, db.d AS deg_b,
       |  CAST(common AS DOUBLE) / CAST(da.d + db.d - common AS DOUBLE) AS jaccard
       |FROM pairs JOIN deg da ON da.s = s_a JOIN deg db ON db.s = s_b
       |ORDER BY jaccard DESC, s_a, s_b
       |LIMIT $linkPredTopK""".stripMargin

  // ------------------------------------------------------------------
  // Degree assortativity: do hubs trade with hubs?
  // ------------------------------------------------------------------

  /** Degree-assortativity coefficient of the customer→supplier trade
    * graph: Pearson correlation of (deg(src), deg(dst)) over the edge
    * list — positive means high-degree customers concentrate on
    * high-degree suppliers (hub-hub coupling: fragile to hub loss),
    * negative means hubs fan out to the periphery. The one-number
    * mixing summary next to [[qGraphLinkpred]]'s per-pair view, and a
    * direct input to skew planning: strong positive assortativity says
    * the join's heavy keys COLLIDE (hub customers join hub suppliers),
    * exactly when [[graft.queries.Analytics]]'s salted-join path earns
    * its keep.
    *
    * Exactness: all six correlation sums (n, Σx, Σy, Σxy, Σx², Σy²)
    * accumulate as exact BIGINTs over the edge list (degrees are
    * integers); the coefficient performs TWO correctly-rounded sqrts
    * and one division on identical exact integers in both engines —
    * bit-equal output. Int64 bounds: Σx² ≤ |E|·maxdeg² — safe past
    * 10⁹ edges at maxdeg 10³; beyond that, quantize degrees first.
    *
    * Scale (100 TB): the edge distinct is the one corpus-sized shuffle
    * (shared shape with [[qGraphPagerank]]); the two degree tables are
    * node-grain aggregates of it, joined back edge-keyed (src then dst
    * — two shuffles of the |E|-row frame; co-partition by src at write
    * time to drop the first), and the correlation is ONE mergeable
    * 1-row aggregate, map-side combined.
    */
  def qGraphAssortativity(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = Tables.orders(spark, sfDir)
      .join(lineitemOrderSupp(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
      .distinct()
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("x"))
    val indeg = edges.groupBy(col("dst")).agg(count(lit(1)).as("y"))
    edges.join(outdeg, "src").join(indeg, "dst")
      .agg(count(lit(1)).as("n_edges"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("n_edges"), col("sx"), col("sy"), col("sxy"),
        ((col("n_edges") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n_edges") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n_edges") * col("syy") - col("sy") * col("sy")).cast("double"))))
          .as("assortativity"))
  }

  val qGraphAssortativitySql: String =
    """WITH edges AS (
      |  SELECT DISTINCT o_custkey AS src, l_suppkey AS dst
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |),
      |outdeg AS (SELECT src, count(*) AS x FROM edges GROUP BY src),
      |indeg AS (SELECT dst, count(*) AS y FROM edges GROUP BY dst),
      |sums AS (
      |  SELECT count(*) AS n_edges,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM edges JOIN outdeg USING (src) JOIN indeg USING (dst)
      |)
      |SELECT n_edges, sx, sy, sxy,
      |  CAST(n_edges * sxy - sx * sy AS DOUBLE) /
      |    (sqrt(CAST(n_edges * sxx - sx * sx AS DOUBLE)) *
      |     sqrt(CAST(n_edges * syy - sy * sy AS DOUBLE))) AS assortativity
      |FROM sums""".stripMargin

  // ------------------------------------------------------------------
  // Community detection: synchronous label propagation
  // ------------------------------------------------------------------

  /** Tie-break scale for the label-propagation vote key
    * `cnt · scale − label`: larger than any node id (max ≈ 1.01·10⁶
    * after [[supplierIdOffset]]), so the key orders by count first and
    * breaks exact ties toward the SMALLEST label — the deterministic
    * variant the async-random textbook LPA lacks. `final` literal per
    * the init-cycle rule.
    */
  final val lpTieScale = 10000000L

  /** LABEL PROPAGATION communities over the DOMESTIC purchase graph
    * (same-nation customer↔supplier edges) — 3 semi-synchronous
    * rounds: suppliers adopt their buyers' majority label, then
    * customers adopt their (freshly-updated) suppliers' majority label,
    * ties → smallest label, seeds = own id. The missing member of the
    * graph family: pagerank ranks nodes, k-core peels them, triangles
    * count cohesion — this one PARTITIONS the graph, recovering each
    * nation's trade blob as a community (the ground truth the spec
    * checks). Deterministic by construction (fixed phase schedule +
    * total-ordered vote key) — unlike the async/random-order textbook
    * LPA — and bipartite-safe: the two-phase schedule is what prevents
    * the label oscillation fully-synchronous LPA exhibits on bipartite
    * graphs (see [[lpCore]]).
    *
    * Scale (100 TB): each phase is one fwd⋈labels equi-join +
    * per-(node,label) count (map-side combined) + one arg-max per node —
    * all key-partitioned, no global state; labels materialize per round
    * (localCheckpoint) so plans stay O(1) deep, the module's pageRank
    * discipline. The scalar vote key bounds cnt·scale in BIGINT up to
    * ~10¹¹ votes per (node,label); past that move the key to a
    * (cnt, −label) struct Spark-side (the oracle's arg_max key is the
    * only scalar-bound piece).
    */
  /** The labelprop core shared with [[qGraphModularity]]: the DOMESTIC
    * purchase graph (customer↔supplier edges restricted to same-nation
    * pairs — the subgraph with real community structure: each nation's
    * trade blob) and the labels after 3 SEMI-SYNCHRONOUS rounds
    * (suppliers update from customers, then customers from the updated
    * suppliers). The two-phase schedule is the standard bipartite-safe
    * LPA variant: fully synchronous updates on a bipartite graph
    * OSCILLATE (both sides swap labels every round and the partition
    * converges to an anti-community split — observed here before the
    * fix: Q = −0.25), while alternating sides is deterministic AND
    * convergent. `fwd` is materialized (localCheckpoint) because both
    * phases of every round probe it.
    */
  private def lpCore(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    val nodes = Tables.customer(spark, sfDir).select(col("c_custkey").as("id"))
      .unionAll(Tables.supplier(spark, sfDir)
        .select((col("s_suppkey") + supplierIdOffset).as("id")))
    val fwd = Tables.orders(spark, sfDir)
      .join(lineitemOrderSupp(spark, sfDir),
        col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, sfDir),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.supplier(spark, sfDir),
        col("s_suppkey") === col("l_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + supplierIdOffset).as("dst"))
      .distinct()
      .localCheckpoint(true)
    def phase(labels: DataFrame, voteFrom: String, voteFor: String): DataFrame = {
      val votes = fwd
        .join(labels.select(col("id").as(voteFrom), col("lbl").as("nlbl")), voteFrom)
        .groupBy(col(voteFor).as("uid"), col("nlbl"))
        .agg(count(lit(1)).as("cnt"))
      // most votes, ties to the SMALLEST label: struct key — unbounded in
      // the label domain (the oracle's packed cnt·lpTieScale − nlbl form
      // needs nlbl < lpTieScale, an oracle-fidelity bound only; r12 #6)
      val best = votes.groupBy(col("uid"))
        .agg(max_by(col("nlbl"), struct(col("cnt"), -col("nlbl")))
          .as("new_lbl"))
      labels
        .join(best.withColumnRenamed("uid", "id"), Seq("id"), "left")
        .select(col("id"), coalesce(col("new_lbl"), col("lbl")).as("lbl"))
    }
    var labels = nodes.select(col("id"), col("id").as("lbl"))
    var round = 0
    while (round < 3) {
      // the customer phase consumes its input twice (vote join + the
      // keep-old-label left join), so an unmaterialized supplier phase
      // evaluated twice per round (r15); |V| rows per checkpoint
      val afterSupp = phase(labels, "src", "dst") // suppliers from customers
        .localCheckpoint(true)
      labels = phase(afterSupp, "dst", "src")     // customers from NEW supplier labels
        .localCheckpoint(true)
      round += 1
    }
    (labels, fwd)
  }

  def qGraphLabelprop(spark: SparkSession, sfDir: String): DataFrame = {
    val (labels, _) = lpCore(spark, sfDir)
    val sizes = labels.groupBy(col("lbl")).agg(count(lit(1)).as("comm_size"))
    labels.join(sizes, "lbl")
      .select(col("id").as("node_id"),
        when(col("id") >= supplierIdOffset, lit("supplier"))
          .otherwise(lit("customer")).as("kind"),
        col("lbl").as("community"), col("comm_size"))
      .orderBy(col("node_id"))
  }

  /** The shared CTE prefix (domestic-graph build + 3 unrolled
    * two-phase labelprop rounds — supplier phase `a$i`, then customer
    * phase closing as `l$i`) for the labelprop-family oracles — final
    * labels land in CTE `l3`.
    */
  private val lpCoreCtesSql: String = {
    def phase(prev: String, out: String, voteFrom: String, voteFor: String): String =
      s"""${out}_c AS (
         |  SELECT e.$voteFor AS id, p.lbl AS nlbl, CAST(count(*) AS BIGINT) AS cnt
         |  FROM fwd e JOIN $prev p ON p.id = e.$voteFrom
         |  GROUP BY e.$voteFor, p.lbl
         |),
         |${out}_b AS (
         |  SELECT id, arg_max(nlbl, cnt * $lpTieScale - nlbl) AS new_lbl
         |  FROM ${out}_c GROUP BY id
         |),
         |$out AS MATERIALIZED (
         |  SELECT p.id, COALESCE(b.new_lbl, p.lbl) AS lbl
         |  FROM $prev p LEFT JOIN ${out}_b b ON b.id = p.id
         |)""".stripMargin
    def round(prev: String, i: Int): String =
      s"""${phase(prev, s"a$i", "src", "dst")},
         |${phase(s"a$i", s"l$i", "dst", "src")}""".stripMargin
    s"""nodes AS (
       |  SELECT c_custkey AS id FROM customer
       |  UNION ALL SELECT s_suppkey + $supplierIdOffset AS id FROM supplier
       |),
       |fwd AS MATERIALIZED (
       |  SELECT DISTINCT o_custkey AS src, l_suppkey + $supplierIdOffset AS dst
       |  FROM orders
       |  JOIN lineitem ON l_orderkey = o_orderkey
       |  JOIN customer ON c_custkey = o_custkey
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  WHERE c_nationkey = s_nationkey
       |),
       |l0 AS (SELECT id, id AS lbl FROM nodes),
       |${round("l0", 1)},
       |${round("l1", 2)},
       |${round("l2", 3)}""".stripMargin
  }

  /** Oracle: the same 3 synchronous rounds unrolled as CTE pairs
    * (vote-count, then arg-max with the identical scalar tie key).
    */
  val qGraphLabelpropSql: String =
    s"""WITH $lpCoreCtesSql,
       |sizes AS (SELECT lbl, CAST(count(*) AS BIGINT) AS comm_size FROM l3 GROUP BY lbl)
       |SELECT l3.id AS node_id,
       |  CASE WHEN l3.id >= $supplierIdOffset THEN 'supplier' ELSE 'customer' END AS kind,
       |  l3.lbl AS community, comm_size
       |FROM l3 JOIN sizes ON sizes.lbl = l3.lbl
       |ORDER BY node_id""".stripMargin

  // ------------------------------------------------------------------
  // Modularity of the labelprop partition
  // ------------------------------------------------------------------

  /** MODULARITY scoring of the [[qGraphLabelprop]] partition — per
    * community, Newman's Q contribution e_c/m − (d_c/2m)², reported in
    * the EXACT integer form Q·4m² = Σ_c (4m·e_c − d_c²) so the only
    * doubles are final divisions. The quality gate on top of the
    * community op: LPA always returns SOME partition — modularity says
    * whether it beats random wiring (Q>0) and which communities carry
    * the structure, which is what decides if the segmentation is worth
    * acting on. The running total accumulates the INTEGER numerators in
    * the community-ordered frame and divides once (last row = the
    * partition's Q) — summing the double contributions instead differs
    * at the last ulp across engines (DuckDB windows aggregate via a
    * segment tree, Spark serially).
    *
    * Exactness: e_c (intra-community edges), d_c (degree mass) and m
    * are BIGINTs off two equi-joins; Q·4m² stays in BIGINT up to
    * m ≈ 10⁹ edges — past that widen the two products to
    * DECIMAL(38,0) (the per-community counts themselves never
    * overflow).
    *
    * Scale (100 TB): labels join onto the edge list by node key (the
    * only corpus-sized exchanges — same shape as a LPA round), then
    * everything is community-grain. Zero-degree communities (isolated
    * nodes keeping their own label) contribute nothing and are
    * excluded.
    */
  def qGraphModularity(spark: SparkSession, sfDir: String): DataFrame = {
    val (labels, fwd) = lpCore(spark, sfDir)
    val m = fwd.agg(count(lit(1)).as("m_edges"))
    val lbl = labels.select(col("id"), col("lbl"))
    val eIn = fwd
      .join(lbl.select(col("id").as("src"), col("lbl").as("l_src")), "src")
      .join(lbl.select(col("id").as("dst"), col("lbl").as("l_dst")), "dst")
      .filter(col("l_src") === col("l_dst"))
      .groupBy(col("l_src").as("community"))
      .agg(count(lit(1)).as("e_in"))
    val deg = fwd.select(col("src").as("id"))
      .unionAll(fwd.select(col("dst").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val dMass = lbl.join(deg, "id")
      .groupBy(col("lbl").as("community"))
      .agg(sum(col("deg")).as("d_c"), count(lit(1)).as("n_nodes"))
    val w = Window.orderBy(col("community"))
      .rowsBetween(Window.unboundedPreceding, 0)
    dMass.join(eIn, Seq("community"), "left")
      .select(col("community"), col("n_nodes"),
        coalesce(col("e_in"), lit(0L)).as("e_in"), col("d_c"))
      .crossJoin(broadcast(m))
      .select(col("community"), col("n_nodes"), col("e_in"), col("d_c"),
        col("m_edges"),
        (lit(4L) * col("m_edges") * col("e_in") - col("d_c") * col("d_c"))
          .as("q_num"))
      .select(col("community"), col("n_nodes"), col("e_in"), col("d_c"),
        col("q_num"),
        (col("q_num").cast("double") /
          (lit(4L) * col("m_edges") * col("m_edges")).cast("double"))
          .as("q_contrib"),
        // accumulate the EXACT integer numerators and divide once —
        // engines disagree at the last ulp when the window sums doubles
        // (DuckDB aggregates frames via a segment tree, Spark serially)
        (sum(col("q_num")).over(w).cast("double") /
          (lit(4L) * col("m_edges") * col("m_edges")).cast("double"))
          .as("q_running"))
      .orderBy(col("community"))
  }

  val qGraphModularitySql: String =
    s"""WITH $lpCoreCtesSql,
       |mt AS (SELECT CAST(count(*) AS BIGINT) AS m_edges FROM fwd),
       |e_in AS (
       |  SELECT ls.lbl AS community, CAST(count(*) AS BIGINT) AS e_in
       |  FROM fwd
       |  JOIN l3 ls ON ls.id = fwd.src
       |  JOIN l3 ld ON ld.id = fwd.dst
       |  WHERE ls.lbl = ld.lbl
       |  GROUP BY ls.lbl
       |),
       |deg AS (
       |  SELECT id, CAST(count(*) AS BIGINT) AS deg
       |  FROM (SELECT src AS id FROM fwd UNION ALL SELECT dst AS id FROM fwd)
       |  GROUP BY id
       |),
       |d_mass AS (
       |  SELECT l3.lbl AS community, CAST(sum(deg) AS BIGINT) AS d_c,
       |    CAST(count(*) AS BIGINT) AS n_nodes
       |  FROM l3 JOIN deg ON deg.id = l3.id
       |  GROUP BY l3.lbl
       |)
       |SELECT community, n_nodes, COALESCE(e_in, 0) AS e_in, d_c,
       |  4 * m_edges * COALESCE(e_in, 0) - d_c * d_c AS q_num,
       |  CAST(4 * m_edges * COALESCE(e_in, 0) - d_c * d_c AS DOUBLE) /
       |    CAST(4 * m_edges * m_edges AS DOUBLE) AS q_contrib,
       |  CAST(sum(4 * m_edges * COALESCE(e_in, 0) - d_c * d_c)
       |    OVER (ORDER BY community ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS DOUBLE) / CAST(4 * m_edges * m_edges AS DOUBLE) AS q_running
       |FROM d_mass LEFT JOIN e_in USING (community)
       |CROSS JOIN mt
       |ORDER BY community""".stripMargin

  // ------------------------------------------------------------------
  // Conductance of each labelprop community
  // ------------------------------------------------------------------

  /** CONDUCTANCE per labelprop community — φ_c = cut(c) /
    * min(vol(c), 2m − vol(c)): the share of a community's edge volume
    * that LEAKS out, the standard cut-quality score. The per-community
    * companion to [[qGraphModularity]]'s partition score: modularity
    * contributions are size-biased (a big community scores high just by
    * mass), conductance is the size-normalized bottleneck measure — a
    * community with φ near 0 is a real module, φ near 1 is an artifact
    * of the algorithm. On the domestic graph the nation blobs are
    * DISCONNECTED components, so the honest expectation (asserted in
    * spec) is φ = 0 for every multi-node community — the zero-leak
    * control; the op earns its keep on graphs whose communities
    * overlap.
    *
    * Exactness: cut, volume and m are BIGINTs off the same joins as
    * modularity; φ is one guarded double division (min-volume 0 —
    * a community holding EVERY edge endpoint — reports φ = 0
    * identically in both engines).
    *
    * Scale (100 TB): same shape as a labelprop round — labels join the
    * edge list by node key, then community-grain aggregates.
    */
  def qGraphConductance(spark: SparkSession, sfDir: String): DataFrame = {
    val (labels, fwd) = lpCore(spark, sfDir)
    val m = fwd.agg(count(lit(1)).as("m_edges"))
    val lbl = labels.select(col("id"), col("lbl"))
    val marked = fwd
      .join(lbl.select(col("id").as("src"), col("lbl").as("l_src")), "src")
      .join(lbl.select(col("id").as("dst"), col("lbl").as("l_dst")), "dst")
    // a crossing edge counts toward the cut of BOTH its communities
    val cut = marked.filter(col("l_src") =!= col("l_dst"))
      .select(col("l_src").as("community"))
      .unionAll(marked.filter(col("l_src") =!= col("l_dst"))
        .select(col("l_dst").as("community")))
      .groupBy(col("community")).agg(count(lit(1)).as("cut"))
    val deg = fwd.select(col("src").as("id"))
      .unionAll(fwd.select(col("dst").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val vol = lbl.join(deg, "id")
      .groupBy(col("lbl").as("community"))
      .agg(sum(col("deg")).as("vol"), count(lit(1)).as("n_nodes"))
    vol.join(cut, Seq("community"), "left")
      .crossJoin(broadcast(m))
      .select(col("community"), col("n_nodes"), col("vol"),
        coalesce(col("cut"), lit(0L)).as("cut"),
        least(col("vol"), lit(2L) * col("m_edges") - col("vol")).as("min_vol"))
      .select(col("community"), col("n_nodes"), col("vol"), col("cut"),
        when(col("min_vol") > 0,
          col("cut").cast("double") / col("min_vol").cast("double"))
          .otherwise(lit(0.0)).as("phi"))
      .orderBy(col("community"))
  }

  val qGraphConductanceSql: String =
    s"""WITH $lpCoreCtesSql,
       |mt AS (SELECT CAST(count(*) AS BIGINT) AS m_edges FROM fwd),
       |marked AS MATERIALIZED (
       |  SELECT ls.lbl AS l_src, ld.lbl AS l_dst
       |  FROM fwd
       |  JOIN l3 ls ON ls.id = fwd.src
       |  JOIN l3 ld ON ld.id = fwd.dst
       |),
       |cut AS (
       |  SELECT community, CAST(count(*) AS BIGINT) AS cut
       |  FROM (SELECT unnest([l_src, l_dst]) AS community
       |        FROM marked WHERE l_src <> l_dst)
       |  GROUP BY community
       |),
       |deg AS (
       |  SELECT id, CAST(count(*) AS BIGINT) AS deg
       |  FROM (SELECT src AS id FROM fwd UNION ALL SELECT dst AS id FROM fwd)
       |  GROUP BY id
       |),
       |vol AS (
       |  SELECT l3.lbl AS community, CAST(sum(deg) AS BIGINT) AS vol,
       |    CAST(count(*) AS BIGINT) AS n_nodes
       |  FROM l3 JOIN deg ON deg.id = l3.id
       |  GROUP BY l3.lbl
       |)
       |SELECT community, n_nodes, vol, COALESCE(cut, 0) AS cut,
       |  CASE WHEN least(vol, 2 * m_edges - vol) > 0
       |    THEN CAST(COALESCE(cut, 0) AS DOUBLE) /
       |         CAST(least(vol, 2 * m_edges - vol) AS DOUBLE)
       |    ELSE CAST(0.0 AS DOUBLE) END AS phi
       |FROM vol LEFT JOIN cut USING (community)
       |CROSS JOIN mt
       |ORDER BY community""".stripMargin

  val registry: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "q_graph_pagerank" -> ((qGraphPagerank _, qGraphPagerankSql)),
    "q_graph_reach" -> ((qGraphReach _, qGraphReachSql)),
    "q_graph_triangles" -> ((qGraphTriangles _, qGraphTrianglesSql)),
    "q_graph_kcore" -> ((qGraphKcore _, qGraphKcoreSql)),
    "q_graph_linkpred" -> ((qGraphLinkpred _, qGraphLinkpredSql)),
    "q_graph_assortativity" -> ((qGraphAssortativity _, qGraphAssortativitySql)),
    "q_graph_labelprop" -> ((qGraphLabelprop _, qGraphLabelpropSql)),
    "q_graph_modularity" -> ((qGraphModularity _, qGraphModularitySql)),
    "q_graph_conductance" -> ((qGraphConductance _, qGraphConductanceSql))
  )
}
