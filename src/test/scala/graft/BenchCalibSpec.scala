package graft

/** The bench host-calibration job must actually HASH: its 1-row result
  * is consumed by value (`head()`), so the xxhash64 over the generated
  * range cannot be pruned. The r14 advice caught the `.count()` form
  * degenerating into an empty range loop — count(1) over a 1-row
  * aggregate lets column pruning delete the unused hash sum entirely.
  */
class BenchCalibSpec extends SparkSuite {

  test("calibration plan hashes the range (xxhash64 survives optimization)") {
    val df = Bench.calibFrame(spark, 4)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("xxhash64"),
      s"the calibration aggregate must keep the hash in the executed plan:\n$plan")
  }

  test("calibration EXECUTES under ANSI: the bounded sum cannot overflow") {
    // the r15 regression class this guards: the raw-hash sum passed the
    // plan assertion but aborted at runtime with ARITHMETIC_OVERFLOW
    // once it actually evaluated — so execute a small-range instance
    val r = Bench.calibFrame(spark, 4, n = 1000000L).head()
    assert(!r.isNullAt(0), "the consumed sum must be a real value")
  }

  test("the red control: consuming via count() would prune the hash away") {
    val pruned = Bench.calibFrame(spark, 4).select(
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("xxhash64"),
      "count over the aggregate is expected to drop the hash — that is " +
        "exactly why calibPass must consume the sum itself")
  }
}
