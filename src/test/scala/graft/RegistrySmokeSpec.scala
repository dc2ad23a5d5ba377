package graft

/** Pre-flight smoke over the ENTIRE query registry (VERDICT r6 advice #3).
  *
  * Every `SparkEntry.queries` entry must at least analyze and produce one
  * row-or-empty result at sf0.001 — `.limit(1).count()` forces analysis,
  * optimization and a minimal execution without materializing real data
  * volume. This is the 30-second guard that would have caught the r6
  * Tables.events footer drift at build time: a loader regression breaks
  * dozens of entries at once, and this spec names every one of them.
  *
  * One test per entry (not one loop-test) so a failure report carries the
  * query name and the rest of the registry still gets checked.
  */
class RegistrySmokeSpec extends SparkSuite {
  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"registry smoke: $name") {
      val n = fn(spark, sf).limit(1).count()
      assert(n >= 0) // reaching here means analysis + execution succeeded
      spark.catalog.clearCache() // mirror Verify/Bench inter-query hygiene
    }
  }
}
