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

  test("pre-bucketed vector index: LSH bucket computed at WRITE time, probe is exchange-free") {
    // the production shape Similarity's scaladoc promises: pay the bucket
    // hash once when the index is written, and the ANN probe's bucket
    // equi-join moves nothing — broadcast disabled so co-location, not
    // size promotion, is what's proven.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS graft_emb_idx")
      spark.sql("DROP TABLE IF EXISTS graft_emb_probe")
      val emb = Tables.embeddings(spark, sf)
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"))
        .withColumn("bucket", graft.ext.Similarity.lshBucketCol(col("e")))
      Bucketing.writeBucketed(emb.filter(col("vec_id") >= 3), "graft_emb_idx", "bucket", 4)
      Bucketing.writeBucketed(emb.filter(col("vec_id") < 3), "graft_emb_probe", "bucket", 4)

      val probed = Bucketing.coLocatedJoin(
        spark, "graft_emb_idx", "graft_emb_probe", "bucket", "bucket")
      val n = probed.count()
      // same candidate count as the inline-bucketed equi-join
      val expected = emb.filter(col("vec_id") >= 3).as("c")
        .join(emb.filter(col("vec_id") < 3).as("q"), col("c.bucket") === col("q.bucket"))
        .count()
      assert(n === expected && n > 0)
      val plan = probed.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected exchange-free bucketed vector probe:\n${plan.take(3000)}")
      assert(plan.contains("SortMergeJoin"), plan.take(1000))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_emb_idx")
      spark.sql("DROP TABLE IF EXISTS graft_emb_probe")
    }
  }
}
