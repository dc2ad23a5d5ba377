package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.model.Tables

/** Runtime (bloom-filter) join pruning — the Catalyst feature that at
  * 100 TB keeps a selective dim-side filter from turning into a full
  * fact-table shuffle: the optimizer builds a bloom filter over the
  * filtered creation side's join keys and pushes a
  * `bloom_filter_might_contain` probe into the application side's scan,
  * discarding non-joining rows BEFORE the exchange.
  *
  * Spark gates the rewrite on size estimates (creation side small,
  * application side ≥ `applicationSideScanSizeThreshold`, default 10 GB)
  * — correct at scale, never met by harness-sized inputs. The spec
  * lowers the thresholds to prove the rewrite ENGAGES under engine
  * config and produces correct results; production configs keep the
  * defaults and get the filter exactly when it pays.
  */
class RuntimeFilterSpec extends SparkSuite {

  test("selective order-side filter injects a bloom probe into the lineitem scan") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled" -> "false",
      // harness-sized sides would broadcast, and the rule skips joins that
      // need no shuffle — force the shuffle-join shape the filter exists for
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val filtered = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = Tables.lineitem(spark, sf)
        .join(filtered, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") && optimized.contains("bloom_filter_agg"),
        s"runtime bloom filter did not engage:\n$optimized")
      // and the filtered plan still returns the right answer
      val n = joined.collect().map(r => r.getAs[Long]("n")).sum
      val expected = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(n === expected)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
