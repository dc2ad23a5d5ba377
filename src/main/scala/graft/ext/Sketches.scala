package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Probabilistic membership / frequency sketches as DISTRIBUTED QUERY
  * PLANS: a Bloom-filter pre-join audit and a Count-Min frequency sketch,
  * companions to the HLL distinct sketch
  * ([[Similarity.qApproxDistinct]]) and the Misra-Gries heavy-hitter
  * sketch ([[graft.functions.MisraGries]]).
  *
  * Unlike library sketches (`DataFrameStatFunctions.bloomFilter` collects
  * the filter INTO THE DRIVER), both build steps here are plain
  * aggregates — map-side combinable, mergeable across partitions by
  * construction, never driver-resident — and both probe steps are
  * broadcast equi-joins against the aggregate-sized sketch table. That is
  * the shape that survives 100 TB: the sketch is O(sketch size), the data
  * moves through one partial-agg exchange, and the probe never shuffles
  * the corpus.
  *
  * Everything is integer arithmetic over the registry's portable 31-bit
  * md5 hash ([[TextOps.h31]]), so both engines compute bit-identical
  * sketches — the ORACLE checks the sketch itself, not just its summary.
  */
object Sketches {

  /** Salted portable hash: h31 of `key#i` — k independent-enough hash
    * functions from the one cross-engine hash definition.
    */
  private def saltedH(key: Column, i: Int): Column =
    TextOps.h31(concat(key, lit(s"#$i")))
  private def saltedHSql(e: String, i: Int): String =
    TextOps.h31Sql(s"($e || '#$i')")

  // ------------------------------------------------------------------
  // Bloom-filter pre-join membership audit
  // ------------------------------------------------------------------

  /** Bloom geometry: 16 lanes × 62 usable bits = 992 positions, 3 probes
    * per key. 62 bits per BIGINT lane, not 64: bit 63 flips the sign and
    * DuckDB refuses `1::BIGINT << 63` outright (overflow error), so the
    * cross-engine-safe lane is [0, 62). At ~150 build keys (sf0.01
    * denylist) the fill factor keeps the theoretical FP rate ≈
    * (1−e^(−kn/m))^k ≈ 6% — deliberately non-trivial so the audit's
    * false-positive row is exercised.
    */
  val bloomLanes = 16
  val bloomBitsPerLane = 62
  val bloomM: Int = bloomLanes * bloomBitsPerLane
  val bloomK = 3

  /** Bloom-filter pre-join audit: build a 992-bit Bloom filter over a
    * customer denylist (negative account balance), probe EVERY order row
    * for membership of its customer, and emit the one-row confusion
    * summary — probe rows, bloom hits, true members, false positives,
    * and the measured FP rate — that tells an engineer whether the
    * pre-filter is worth installing in front of an expensive join.
    *
    * Build: explode each key into [[bloomK]] salted-hash bit positions,
    * fold to (lane, OR-of-bit-masks) with ONE 16-group `bit_or`
    * aggregate — the filter IS a 16-row DataFrame, mergeable by
    * construction (OR is associative/commutative), never collected.
    *
    * Probe: the 16-row filter folds into ONE array-of-masks row that
    * rides a broadcast cross join, and every order row tests its 3 bits
    * NARROWLY — no explode, no per-position join, no re-keying of the
    * fact. The exact twin (broadcast LEFT SEMI against the denylist)
    * classifies hits into members vs false positives — and the spec
    * asserts the Bloom invariant: ZERO false negatives.
    *
    * Scale (100 TB): the probe side is scan → 1-row broadcast →
    * narrow bit tests → partial 1-row agg — the fact NEVER shuffles
    * (plan-asserted: zero Exchanges between the orders scan and the
    * final aggregate's partials); the build side shuffles ≤16 partial
    * masks per map task. As a pre-join filter the pass-rate column is
    * the decision number: shuffle bytes drop by (1 − pass rate) at the
    * cost of one broadcast.
    */
  def qBloomPrejoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val deny = Tables.customer(spark, sfDir)
      .filter($"c_acctbal" < 0)
      .select($"c_custkey".cast("string").as("key"))
    val buildPos = deny.select(
      explode(array((0 until bloomK).map(i => saltedH($"key", i) % bloomM): _*))
        .as("pos"))
    // shift amounts are COLUMNS, so the bit ops go through expr(): the
    // functions._ shiftleft/shiftright overloads take only literal Ints
    val filter = buildPos
      .select(expr(s"pos div $bloomBitsPerLane").as("lane"),
        expr(s"shiftleft(1L, int(pos % $bloomBitsPerLane))").as("mask"))
      .groupBy($"lane").agg(expr("bit_or(mask)").as("lane_mask"))
    // fold the lane table into one dense array row (missing lanes = 0),
    // so the probe is a 1-row broadcast instead of a per-position join
    val filterRow = filter
      .agg(collect_list(struct($"lane", $"lane_mask")).as("lms"))
      .select(expr(
        s"transform(sequence(0L, ${bloomLanes - 1}L)," +
          " l -> coalesce(map_from_entries(lms)[l], 0L))").as("masks"))
    val hits = Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey".cast("string").as("key"))
      .select(Seq($"o_orderkey", $"key") ++
        (0 until bloomK).map(i => (saltedH($"key", i) % bloomM).as(s"pos$i")): _*)
      .crossJoin(broadcast(filterRow))
      .withColumn("bloom_pass",
        (0 until bloomK).map { i =>
          expr(s"((shiftright(element_at(masks, int(pos$i div " +
            s"$bloomBitsPerLane) + 1), int(pos$i % $bloomBitsPerLane)) & 1L) = 1L)")
        }.reduce(_ && _))
      .select($"o_orderkey", $"key", $"bloom_pass")
    val member = Tables.customer(spark, sfDir)
      .filter($"c_acctbal" < 0)
      .select($"c_custkey".cast("string").as("key"), lit(true).as("is_member"))
    hits.join(broadcast(member), Seq("key"), "left")
      .agg(count(lit(1)).as("n_probe"),
        count(when($"bloom_pass", lit(1))).as("n_bloom_pass"),
        count(when($"is_member", lit(1))).as("n_member"),
        count(when($"bloom_pass" && $"is_member".isNull, lit(1))).as("n_false_pos"),
        count(when($"is_member" && !$"bloom_pass", lit(1))).as("n_false_neg"))
      .select($"n_probe", $"n_bloom_pass", $"n_member", $"n_false_pos",
        $"n_false_neg",
        ($"n_false_pos".cast("double") /
          ($"n_probe" - $"n_member").cast("double")).as("fp_rate"))
  }

  val qBloomPrejoinSql: String = {
    def posSql(i: Int) = s"${saltedHSql("key", i)} % $bloomM"
    val buildPos = (0 until bloomK).map(posSql).mkString(", ")
    s"""WITH deny AS (
       |  SELECT CAST(c_custkey AS VARCHAR) AS key FROM customer WHERE c_acctbal < 0
       |),
       |build_pos AS (
       |  SELECT unnest([$buildPos]) AS pos FROM deny
       |),
       |filt AS (
       |  SELECT pos // $bloomBitsPerLane AS lane,
       |    bit_or(1::BIGINT << CAST(pos % $bloomBitsPerLane AS INTEGER)) AS lane_mask
       |  FROM build_pos GROUP BY 1
       |),
       |probe AS (
       |  SELECT o_orderkey, CAST(o_custkey AS VARCHAR) AS key,
       |    unnest([$buildPos]) AS pos
       |  FROM orders
       |),
       |hits AS (
       |  SELECT o_orderkey, key,
       |    count(CASE WHEN ((COALESCE(lane_mask, 0) >>
       |      CAST(pos % $bloomBitsPerLane AS INTEGER)) & 1) = 1 THEN 1 END)
       |      = $bloomK AS bloom_pass
       |  FROM probe LEFT JOIN filt ON pos // $bloomBitsPerLane = lane
       |  GROUP BY 1, 2
       |),
       |classified AS (
       |  SELECT h.*, d.key IS NOT NULL AS is_member
       |  FROM hits h LEFT JOIN deny d USING (key)
       |)
       |SELECT count(*) AS n_probe,
       |  count(CASE WHEN bloom_pass THEN 1 END) AS n_bloom_pass,
       |  count(CASE WHEN is_member THEN 1 END) AS n_member,
       |  count(CASE WHEN bloom_pass AND NOT is_member THEN 1 END) AS n_false_pos,
       |  count(CASE WHEN is_member AND NOT bloom_pass THEN 1 END) AS n_false_neg,
       |  CAST(count(CASE WHEN bloom_pass AND NOT is_member THEN 1 END) AS DOUBLE) /
       |    CAST(count(*) - count(CASE WHEN is_member THEN 1 END) AS DOUBLE) AS fp_rate
       |FROM classified""".stripMargin
  }

  // ------------------------------------------------------------------
  // Count-Min frequency sketch vs exact counts
  // ------------------------------------------------------------------

  /** CMS geometry: 3 rows × 64 buckets — deliberately TIGHT for the
    * harness key cardinality (~150 users at sf0.01), so nearly every
    * bucket carries collisions and the overestimate column is
    * non-trivially exercised; at 256 buckets every top-10 estimate came
    * back exact and the audit proved nothing. Production sizes w by the
    * error budget (ε ≈ e/w of total stream mass), not by key count.
    */
  val cmsDepth = 3
  val cmsWidth = 64

  /** Count-Min sketch over the event stream's user frequencies, audited
    * against exact counts for the 10 busiest users. The sketch is a
    * (row, bucket) → counter table built with ONE partial-agg groupBy —
    * every map task pre-merges its local counters, so the exchange
    * carries ≤ d·w rows per task no matter the corpus size; merging two
    * sketches is adding counters, which is exactly what the aggregate
    * does. Point queries take the MIN over the key's d buckets — always
    * ≥ the true count (collisions only ADD), which the `overestimate`
    * column proves non-negative row by row (and the spec asserts).
    *
    * Scale (100 TB): the sketch build is the ONLY corpus-sized pass — a
    * 768-group aggregate, the cheapest shuffle shape there is; the probe
    * explodes 10 keys × 3 rows and equi-joins the broadcast sketch. The
    * exact side costs a real user-keyed aggregate here (it IS the audit);
    * production keeps only the sketch and pays O(d·w) memory for
    * ε = e/w ≈ 1% of stream length accuracy.
    */
  def qCmsUserCounts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val keyed = Tables.events(spark, sfDir)
      .select($"user_id".cast("string").as("key"))
    val sketch = keyed
      .select(posexplode(
        array((0 until cmsDepth).map(r => saltedH($"key", r) % cmsWidth): _*))
        .as(Seq("r", "c")))
      .groupBy($"r", $"c").agg(count(lit(1)).as("counter"))
    val exact = keyed.groupBy($"key").agg(count(lit(1)).as("exact_n"))
      .orderBy($"exact_n".desc, $"key").limit(10)
    exact
      .select($"key", $"exact_n",
        posexplode(array((0 until cmsDepth).map(r => saltedH($"key", r) % cmsWidth): _*))
          .as(Seq("r", "c")))
      .join(broadcast(sketch), Seq("r", "c"))
      .groupBy($"key", $"exact_n")
      .agg(min($"counter").as("cms_est"))
      .select($"key".cast("long").as("user_id"), $"exact_n", $"cms_est",
        ($"cms_est" - $"exact_n").as("overestimate"))
      .orderBy($"exact_n".desc, $"user_id")
  }

  val qCmsUserCountsSql: String = {
    def posSql(i: Int) = s"${saltedHSql("key", i)} % $cmsWidth"
    val positions = (0 until cmsDepth).map(posSql).mkString(", ")
    s"""WITH keyed AS (
       |  SELECT CAST(user_id AS VARCHAR) AS key FROM events
       |),
       |cells AS (
       |  SELECT unnest([$positions]) AS c,
       |    unnest(range(0, $cmsDepth)) AS r
       |  FROM keyed
       |),
       |sketch AS (
       |  SELECT r, c, count(*) AS counter FROM cells GROUP BY 1, 2
       |),
       |exact AS (
       |  SELECT key, count(*) AS exact_n FROM keyed GROUP BY key
       |  ORDER BY exact_n DESC, key LIMIT 10
       |),
       |probe AS (
       |  SELECT key, exact_n, unnest([$positions]) AS c,
       |    unnest(range(0, $cmsDepth)) AS r
       |  FROM exact
       |)
       |SELECT CAST(key AS BIGINT) AS user_id, exact_n,
       |  CAST(min(counter) AS BIGINT) AS cms_est,
       |  CAST(min(counter) - exact_n AS BIGINT) AS overestimate
       |FROM probe JOIN sketch USING (r, c)
       |GROUP BY key, exact_n
       |ORDER BY exact_n DESC, user_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // HLL sketch MERGE: daily distinct-user sketches rolled up losslessly
  // ------------------------------------------------------------------

  /** Relative-error band the sketch estimates must land in (±15%, the
    * [[Similarity.qApproxDistinct]] contract; at these cardinalities the
    * Datasketches HLL is near-exact and NewOpsSpec asserts much tighter).
    */
  final val hllTolNum = 15L
  final val hllTolDen = 100L

  /** Daily distinct-user counts WITH mergeable HLL sketches, rolled up
    * to the month by UNIONING THE DAILY SKETCHES — the operation exact
    * distinct counts cannot do (distincts don't add: Σ daily ND ≠
    * monthly ND). This is THE sketch pattern that matters at 100 TB:
    * materialize one tiny sketch per partition/day at ingest, answer
    * any coarser-grain distinct question later by merging sketches —
    * no rescan, no re-shuffle of history. Each row carries the exact
    * count (oracle-checked), the within-tolerance verdict for the
    * sketch estimate, and the month row's verdict covers the MERGED
    * estimate vs the exact month-wide distinct.
    *
    * Determinism: HLL register updates are max-merges — commutative and
    * associative — so estimates are partitioning-independent; the
    * verdict compares against exact counts with an integer-rational
    * tolerance gate. The raw estimates are asserted (tightly) in
    * NewOpsSpec rather than emitted, keeping every oracle column
    * engine-exact (the [[Similarity.qApproxDistinct]] discipline).
    *
    * Scale (100 TB): one day-keyed agg computes exact count + sketch
    * side by side (the exact arm is the audit — production keeps only
    * the sketch arm); the month rollup is an agg over |days| sketch
    * rows. Nothing but aggregates and a 1-row broadcast cross.
    */
  def qEventHllMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
    def okCol(est: Column, exact: Column): Column =
      abs(est - exact) * hllTolDen <= exact * hllTolNum
    val daily = ev.groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("exact_nd"),
        hll_sketch_agg(col("user_id")).as("sk"))
    val dailyOut = daily.select(col("day"), col("exact_nd"),
      okCol(hll_sketch_estimate(col("sk")), col("exact_nd")).as("sketch_ok"))
    val monthExact = ev.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("exact_nd"))
    val monthRow = daily.agg(hll_union_agg(col("sk")).as("msk"))
      .crossJoin(broadcast(monthExact))
      .select(lit("zz_month").as("day"), col("exact_nd"),
        okCol(hll_sketch_estimate(col("msk")), col("exact_nd")).as("sketch_ok"))
    dailyOut.unionAll(monthRow).orderBy(col("day"))
  }

  val qEventHllMergeSql: String =
    """SELECT strftime(ts, '%Y-%m-%d') AS day,
      |  count(DISTINCT user_id) AS exact_nd, TRUE AS sketch_ok
      |FROM events GROUP BY day
      |UNION ALL
      |SELECT 'zz_month', count(DISTINCT user_id), TRUE FROM events
      |ORDER BY day""".stripMargin

  // ------------------------------------------------------------------
  // Q-digest quantile sketch: mergeable rank queries, exactly audited
  // ------------------------------------------------------------------

  /** Universe bits (values quantize to floor(value·[[qdScale]]) <
    * 2^[[qdBits]]), compression parameter, and the probed quantiles.
    * Rank-error guarantee: ≤ [[qdBits]]·n/[[qdK]] (≈ 5% here).
    */
  final val qdBits = 13
  final val qdK = 256L
  final val qdScale = 8L
  final val qdPs: Seq[Int] = Seq(25, 50, 75, 95)

  /** Quantiles via the custom MERGEABLE [[graft.functions.QDigest]]
    * aggregator, exactly audited: pass 1 builds one q-digest of
    * `events.value` (quantized to the fixed integer grid) through
    * ordinary map-side partial aggregation — the sketch ships between
    * tasks, values never re-shuffle; pass 2 computes, RELATIONALLY and
    * exactly, each probed quantile (the oracle-checked column) and the
    * exact rank of the sketch's estimate, deciding the
    * rank-error-within-log₂(U)·n/k verdict by integer cross-
    * multiplication. The [[Similarity.qApproxDistinct]] discipline:
    * every emitted column is engine-exact; the merge-order-dependent
    * digest internals stay out of the output (NewOpsSpec asserts the
    * quantitative bound).
    *
    * The digest itself is CONSTANT-SIZE MODEL STATE (≤ ~4k nodes), so
    * the quantile read-off happens on the collected digest — the
    * kmeans-centroid precedent, not a data collect.
    *
    * Scale (100 TB): this op exists FOR that scale — an exact quantile
    * needs a sort or a value-grain shuffle of the full column; the
    * digest needs one pass, constant memory per task, and digests
    * merge across days/partitions like the HLL rollup
    * ([[qEventHllMerge]]). The exact arm here is the audit, not the
    * production path.
    */
  def qValueQdigest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val vals = Tables.events(spark, sfDir)
      .select(floor(col("value") * qdScale).cast("long").as("vq"))
    val grain = vals.groupBy(col("vq")).agg(count(lit(1)).as("cnt"))
    val qd = udaf(new graft.functions.QDigest(qdBits, qdK))
    val digest = vals.agg(qd(col("vq"))).head
      .getAs[scala.collection.Map[Long, Long]](0).toMap
    val estDf = qdPs
      .map(p => (p, graft.functions.QDigest.quantile(digest, qdBits, p.toLong, 100L)))
      .toDF("p", "est")
    val n = grain.agg(sum(col("cnt")).as("n"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("vq"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = grain.withColumn("cum", sum(col("cnt")).over(w))
    val exact = estDf.crossJoin(broadcast(n))
      .join(cum, col("cum") >= expr("(p * n + 99) div 100"))
      .groupBy(col("p"), col("n"), col("est"))
      .agg(min(col("vq")).as("exact_q"))
    val ranks = estDf
      .join(grain, col("vq") <= col("est"), "left")
      .groupBy(col("p").as("p2"))
      .agg(sum(coalesce(col("cnt"), lit(0L))).as("rank_est"))
    exact.join(ranks, col("p") === col("p2"))
      .select(col("p"), col("exact_q"), col("n"),
        (abs(col("rank_est") * 100L - col("p") * col("n")) * qdK <=
          lit(qdBits.toLong) * col("n") * 100L).as("sketch_ok"))
      .orderBy(col("p"))
  }

  val qValueQdigestSql: String =
    s"""WITH g AS (
       |  SELECT CAST(floor(value * $qdScale) AS BIGINT) AS vq, count(*) AS cnt
       |  FROM events GROUP BY vq
       |),
       |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM g),
       |cum AS (
       |  SELECT vq, CAST(sum(cnt) OVER (ORDER BY vq) AS BIGINT) AS cum FROM g
       |),
       |ps AS (SELECT unnest([${qdPs.mkString(", ")}]) AS p)
       |SELECT p, min(vq) AS exact_q, n, TRUE AS sketch_ok
       |FROM ps CROSS JOIN tot JOIN cum ON cum >= (p * n + 99) // 100
       |GROUP BY p, n
       |ORDER BY p""".stripMargin

  // ------------------------------------------------------------------
  // AMS (Alon-Matias-Szegedy) second-frequency-moment sketch
  // ------------------------------------------------------------------

  /** AMS lane count: 16 averaged estimators give relative std
    * ≈ √(2/16) ≈ 35%; the measured error on this corpus is asserted
    * tighter in NewOpsSpec. `final` with a literal RHS per the
    * init-cycle rule (verify skill).
    */
  final val amsLanes = 16

  /** AMS F2 SKETCH audit — estimates the second frequency moment
    * F2 = Σ_k f_k² (the self-join size / repeat-concentration of
    * orders-per-customer) from 16 single-BIGINT sign counters
    * Z_j = Σ_k f_k·s_j(k), s_j(k) ∈ {−1,+1}, est = mean(Z_j²), next to
    * the EXACT two-phase F2 so the estimate is auditable in place. F2
    * is what a join planner needs to size `orders ⋈ orders` on custkey
    * and what a skew monitor tracks (F2/n² is the Simpson concentration
    * [[CorpusOps.qDocLangDiversity]] reports for sources); the sketch
    * form is what survives when keys don't fit anywhere — 16 BIGINTs
    * ship instead of the key dictionary, and counters merge across
    * partitions/streams by ADDITION (sum of sums), unlike the exact
    * form's key-wise merge.
    *
    * Signs come from the registry's portable md5 hash (parity of
    * h31(key#lane)) — pairwise- rather than 4-wise-independent, which
    * affects the textbook variance CONSTANT only; both engines compute
    * bit-identical signs, so the ORACLE checks the sketch itself
    * (every Z_j exact), not just its summary.
    *
    * Scale (100 TB): one custkey groupBy (map-side combined — the only
    * corpus shuffle; the streaming form skips even that, updating the
    * 16 counters per arrival), then a 1-row global aggregate. Z_j is
    * bounded by n, so Z² crosses 2^63 near n ≈ 3·10⁹ — past that,
    * square into DECIMAL(38,0); the counters themselves stay BIGINT.
    */
  def qAmsF2(spark: SparkSession, sfDir: String): DataFrame = {
    val f = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("f"))
    val lanes = (0 until amsLanes).map { j =>
      sum(col("f") *
        (lit(1L) - lit(2L) * (saltedH(col("o_custkey").cast("string"), j) % 2)))
        .as(s"z$j")
    }
    val moments = f.agg(
      sum(col("f") * col("f")).as("f2_exact"),
      (count(lit(1)).as("n_keys") +: lanes): _*)
    val estSum = (0 until amsLanes)
      .map(j => col(s"z$j") * col(s"z$j"))
      .reduce(_ + _).as("est_sum")
    moments
      .select((col("f2_exact") :: col("n_keys") :: estSum ::
        (0 until amsLanes).map(j => col(s"z$j")).toList): _*)
      .select(col("f2_exact"), col("n_keys"), col("est_sum"),
        (col("est_sum").cast("double") / lit(amsLanes)).as("est_mean"),
        (abs(col("est_sum").cast("double") / lit(amsLanes) -
          col("f2_exact").cast("double")) / col("f2_exact").cast("double"))
          .as("rel_err"))
  }

  val qAmsF2Sql: String = {
    val laneCols = (0 until amsLanes).map { j =>
      s"    CAST(sum(f * (1 - 2 * (${saltedHSql("(CAST(k AS VARCHAR))", j)} % 2))) AS BIGINT) AS z$j"
    }.mkString(",\n")
    val estSum = (0 until amsLanes).map(j => s"z$j * z$j").mkString(" + ")
    s"""WITH f AS (
       |  SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS f
       |  FROM orders GROUP BY o_custkey
       |),
       |z AS (
       |  SELECT CAST(sum(f * f) AS BIGINT) AS f2_exact,
       |    CAST(count(*) AS BIGINT) AS n_keys,
       |$laneCols
       |  FROM f
       |),
       |e AS (SELECT f2_exact, n_keys, $estSum AS est_sum FROM z)
       |SELECT f2_exact, n_keys, est_sum,
       |  CAST(est_sum AS DOUBLE) / $amsLanes AS est_mean,
       |  abs(CAST(est_sum AS DOUBLE) / $amsLanes - CAST(f2_exact AS DOUBLE)) /
       |    CAST(f2_exact AS DOUBLE) AS rel_err
       |FROM e""".stripMargin
  }

  val registry: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "q_bloom_prejoin" -> ((qBloomPrejoin _, qBloomPrejoinSql)),
    "q_cms_user_counts" -> ((qCmsUserCounts _, qCmsUserCountsSql)),
    "q_event_hll_merge" -> ((qEventHllMerge _, qEventHllMergeSql)),
    "q_value_qdigest" -> ((qValueQdigest _, qValueQdigestSql)),
    "q_ams_f2" -> ((qAmsF2 _, qAmsF2Sql))
  )
}
