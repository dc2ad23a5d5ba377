package graft.ext

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.SparkSuite

/** Sketch invariants that the DuckDB oracle cannot phrase (it checks
  * equality, not the probabilistic contracts) plus the plan shapes the
  * scaladoc promises at 100 TB.
  */
class SketchesSpec extends SparkSuite {

  test("bloom filter never false-negatives and its FP rate is a real rate") {
    val row = Sketches.qBloomPrejoin(spark, sf).collect().head
    assert(row.getAs[Long]("n_false_neg") === 0L)
    assert(row.getAs[Long]("n_bloom_pass") >= row.getAs[Long]("n_member"))
    val fp = row.getAs[Double]("fp_rate")
    assert(fp >= 0.0 && fp < 1.0)
  }

  test("bloom probe never re-keys the fact — no fact-keyed exchange, no shuffle join") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Sketches.qBloomPrejoin(spark, sf).queryExecution.executedPlan
      val p = plan.toString
      assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
        s"probe side shuffle-joined:\n$p")
      // every exchange in the plan belongs to the SKETCH side (the 16-lane
      // bit_or, its 1-row fold) or the 1-row summary — none may partition
      // by the probe fact's keys
      val factKeyed = plan.collect { case e: ShuffleExchangeExec => e }
        .filter { e =>
          val part = e.outputPartitioning.toString
          part.contains("o_orderkey") || part.contains("o_custkey")
        }
      assert(factKeyed.isEmpty, s"fact-keyed exchange in:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("CMS estimates dominate exact counts (collisions only ADD)") {
    val rows = Sketches.qCmsUserCounts(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("overestimate") >= 0L,
        s"CMS under-estimated user ${r.getAs[Long]("user_id")}")
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_n"))
    }
  }

  test("CMS build partial-aggregates map-side and the probe joins the sketch broadcast") {
    val p = Sketches.qCmsUserCounts(spark, sf).queryExecution.sparkPlan.toString
    assert(p.contains("partial_count"), s"no map-side combine in sketch build:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"sketch probe not broadcast:\n$p")
  }
}
