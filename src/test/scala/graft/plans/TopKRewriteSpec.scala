package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.model.Tables

/** The rank-filter→TopKPerKey optimizer rewrite: the textbook window
  * top-k formulation must plan onto the native heap operator (no
  * WindowExec, no per-partition sort of the full input) and return the
  * identical row set.
  */
class TopKRewriteSpec extends SparkSuite {

  private def windowTopK(bound: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.functions.col
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(bound(col("rn")))
      .drop("rn")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
  }

  test("rewrite fires: window+filter+drop plans as TopKPerKeyExec, results identical") {
    GraftOpt.enable(spark)
    try {
      val df = windowTopK(_ <= 3)
      val physical = df.queryExecution.executedPlan.toString
      assert(physical.contains("TopKPerKey"), physical)
      assert(!physical.contains("Window"), physical)
      val rewritten = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      // reference: same query with the rank RETAINED in the output — the
      // rewrite cannot fire there (the operator does not produce the
      // rank), so this runs through the stock window path
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val reference = Tables.orders(spark, sf)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          col("rn")) // rank retained ⇒ rewrite cannot fire ⇒ stock window path
      assert(reference.queryExecution.executedPlan.toString.contains("Window"))
      assert(rewritten === reference.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet)
    } finally GraftOpt.disable(spark)
  }

  test("every supported bound shape fires; unsupported shapes do not") {
    GraftOpt.enable(spark)
    try {
      def plansNative(df: org.apache.spark.sql.DataFrame): Boolean =
        df.queryExecution.executedPlan.toString.contains("TopKPerKey")
      assert(plansNative(windowTopK(_ <= 3)))
      assert(plansNative(windowTopK(_ < 4)))
      assert(plansNative(windowTopK(c => lit(3) >= c)))
      assert(plansNative(windowTopK(c => c === 1)))
      // rank-retaining projection: must NOT fire (rank is consumed)
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val keepsRank = Tables.orders(spark, sf)
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      assert(!plansNative(keepsRank))
      // rank() admits ties beyond k: different semantics, must NOT fire
      val rankForm = Tables.orders(spark, sf)
        .withColumn("rn", rank().over(w)).filter(col("rn") <= 3).drop("rn")
      assert(!plansNative(rankForm))
      // equal row sets for the < / >= / = shapes too
      val le = windowTopK(_ <= 1).collect().map(_.toSeq).toSet
      val eq = windowTopK(_ === 1).collect().map(_.toSeq).toSet
      assert(le === eq)
    } finally GraftOpt.disable(spark)
  }

  test("rewrite respects the idiomatic-form row count at every k") {
    GraftOpt.enable(spark)
    try {
      val priorities = Tables.orders(spark, sf)
        .select("o_orderpriority").distinct().count()
      for (k <- Seq(1, 2, 5)) {
        val n = windowTopK(_ <= k).count()
        // every priority group has ≥ k orders in the testdata
        assert(n === priorities * k, s"k=$k")
      }
    } finally GraftOpt.disable(spark)
  }
}
