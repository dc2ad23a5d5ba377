package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.model.Tables

/** The bucketed-write → exchange-free join contract: after paying the
  * bucket hash at write time, the keyed join must plan with no shuffle on
  * either side (broadcast disabled so bucket co-location, not small-SF
  * size promotion, is what's proven).
  */
class BucketingSpec extends SparkSuite {

  test("equal-bucket tables join with zero Exchange and correct rows") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS graft_orders_bkt")
      spark.sql("DROP TABLE IF EXISTS graft_customer_bkt")
      Bucketing.writeBucketed(Tables.orders(spark, sf), "graft_orders_bkt", "o_custkey", 4)
      Bucketing.writeBucketed(Tables.customer(spark, sf), "graft_customer_bkt", "c_custkey", 4)

      val joined = Bucketing.coLocatedJoin(
        spark, "graft_orders_bkt", "graft_customer_bkt", "o_custkey", "c_custkey")
      val n = joined.count()
      // correctness: same count as the plain parquet join
      val expected = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
        .count()
      assert(n === expected && n > 0)

      // the point: no shuffle anywhere in the executed plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected exchange-free bucketed join:\n${plan.take(3000)}")
      assert(plan.contains("SortMergeJoin"), plan.take(1000))
      // bucket pruning metadata visible on the scan
      assert(plan.contains("SelectedBucketsCount"), plan.take(3000))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_orders_bkt")
      spark.sql("DROP TABLE IF EXISTS graft_customer_bkt")
    }
  }
}
