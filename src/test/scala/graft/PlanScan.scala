package graft

import org.apache.spark.sql.SparkSession

/** Dev diagnostic (not a spec): dump physical-plan shape counters for
  * registry queries — cartesians, nested-loop joins, single-partition
  * exchanges, sort-merge vs broadcast joins, hash exchanges. Run with:
  *
  *   sbt "Test/runMain graft.PlanScan [q_name,q_name,...]"
  *
  * No assertion here because several counters are legitimately non-zero
  * for specific queries (1-row crossJoins plan as BroadcastNestedLoop,
  * documented global sorts plan SinglePartition exchanges); the value is
  * the REVIEW — an unexpected counter on a new query is a plan bug the
  * oracle can't see. RegistrySmokeSpec owns the hard correctness gate.
  */
object PlanScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val only = args.headOption.map(_.split(',').toSet)
    for ((n, fn) <- SparkEntry.queries if only.forall(_.contains(n))) {
      try {
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        def c(p: String) = p.r.findAllIn(plan).length
        println(f"$n%-28s cart=${c("CartesianProduct")} bnl=${c("BroadcastNestedLoopJoin")} " +
          f"single=${c("Exchange SinglePartition")} smj=${c("SortMergeJoin")} " +
          f"bhj=${c("BroadcastHashJoin")} hashex=${c("Exchange hashpartitioning")}")
      } catch { case e: Throwable => println(s"$n FAILED: ${e.getClass.getName}") }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
