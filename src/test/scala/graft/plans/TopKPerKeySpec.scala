package graft.plans

import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.GraftOps
import graft.model.Tables

/** The custom whole-operator extension (logical node → strategy → exec):
  * result parity with the stock window formulation, and the plan shape
  * that justifies its existence — a key exchange with NO sort.
  */
class TopKPerKeySpec extends SparkSuite {

  private def ordersSlim = Tables.orders(spark, sf)
    .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))

  test("native top-k agrees with the window formulation (total order supplied)") {
    val native = GraftOps.topKPerKey(ordersSlim,
      keys = Seq("o_orderpriority"),
      order = Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val windowForm = ordersSlim
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3).drop("rn")
    assert(native.exceptAll(windowForm).isEmpty && windowForm.exceptAll(native).isEmpty)
    // within-key emission respects the requested order
    val byKey = native.collect().groupBy(_.getString(0))
    byKey.values.foreach { rows =>
      val prices = rows.map(_.getDouble(2))
      assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
    }
  }

  test("groups smaller than k emit whole; k=1 emits exactly one row per key") {
    val perKey = GraftOps.topKPerKey(ordersSlim, Seq("o_orderpriority"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), 1)
      .collect().groupBy(_.getString(0))
    val nKeys = ordersSlim.select("o_orderpriority").distinct().count()
    assert(perKey.size === nKeys && perKey.values.forall(_.length === 1))
    // k far above any group size degenerates to the identity multiset
    val all = GraftOps.topKPerKey(ordersSlim, Seq("o_orderpriority"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), 1000000)
    assert(all.count() === ordersSlim.count())
  }

  test("plan: TopKPerKeyExec over a key exchange with NO sort anywhere") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // expose the full physical plan statically
    try {
      val native = GraftOps.topKPerKey(ordersSlim,
        Seq("o_orderpriority"), Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
      val plan = native.queryExecution.executedPlan
      assert(plan.collect { case e: TopKPerKeyExec => e }.nonEmpty, plan.toString)
      val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.nonEmpty &&
        exchanges.head.outputPartitioning.toString.contains("o_orderpriority"), plan.toString)
      // the whole point vs. the window form: no SortExec in the plan
      assert(plan.collect { case s: SortExec => s }.isEmpty, plan.toString)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
