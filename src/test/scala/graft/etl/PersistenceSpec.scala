package graft.etl

import java.util.Properties

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.col

import graft.SparkSuite

/** Sink/source round-trips (SURVEY §2.1/§2.2): K1 partitioned parquet +
  * catalog sink with F5 partition-pruned readback, S6 catalog table read,
  * and the Job-2 JDBC surface (K2 create / K3 append / S7 pushdown
  * subquery) against embedded Derby — the same `spark.read.jdbc(url,
  * "(SELECT ...) t", props)` idiom the reference aims at Postgres
  * (pg:62-66), minus the network.
  */
class PersistenceSpec extends SparkSuite {

  test("K1+F5+S6: partitioned fact write, catalog read, partition-pruned readback") {
    val table = "graft_fact_k1_test"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val fact = StarSchema.factTrips(spark, sf)
    val n = fact.count()

    StarSchema.writeFact(fact, table) // K1
    val back = spark.table(table)     // S6
    assert(back.count() === n)

    // F5: filter on the partition columns must prune at the source, not scan+filter
    val pruned = back.filter(col("processed_year") === "2024" && col("processed_month") === "1")
    assert(pruned.count() === n)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("processed_year"),
      s"expected partition filters in plan:\n${plan.take(2000)}")

    // a non-existent partition reads nothing
    assert(back.filter(col("processed_month") === "12").count() === 0)

    // append semantics: re-dropping the month accumulates (reference month-at-a-time loads)
    StarSchema.writeFact(fact, table)
    assert(spark.table(table).count() === 2 * n)

    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("dynamic partition overwrite: reprocessing one month replaces it, others untouched") {
    // The reference's operational story for late/bad data is "re-drop the
    // month file" (SURVEY §2.9). With plain append that duplicates the
    // month (dedup downstream); the production-grade variant is DYNAMIC
    // partition overwrite — only partitions present in the incoming data
    // are replaced, every other month's files are untouched. At 100 TB
    // this is how one month reprocesses without rewriting (or double-
    // loading) the other 119.
    val table = "graft_fact_dpo_test"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val raw = TaxiFixture.raw(spark, sf)
      val jan = StarSchema.transform(raw, "2024", "1")
      val feb = StarSchema.transform(raw, "2024", "2")
      val nJan = jan.count()
      jan.write.partitionBy("processed_year", "processed_month")
        .format("parquet").saveAsTable(table)
      feb.write.mode(SaveMode.Overwrite).insertInto(table)
      assert(spark.table(table).count() === 2 * nJan)
      // reprocess February only: half the rows this time
      val feb2 = StarSchema.transform(raw, "2024", "2")
        .filter(col("passenger_count") % 2 === 0)
      val nFeb2 = feb2.count()
      assert(nFeb2 < nJan)
      feb2.write.mode(SaveMode.Overwrite).insertInto(table)
      // February replaced, January untouched
      val byMonth = spark.table(table).groupBy(col("processed_month")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byMonth === Map("1" -> nJan, "2" -> nFeb2))
    } finally {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("database guard: probe-then-create once, and K1 into a fresh database just works") {
    val db = "graft_r5_guard_db"
    val db2 = "graft_r5_guard_db2"
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    spark.sql(s"DROP DATABASE IF EXISTS $db2 CASCADE")
    try {
      assert(Publish.ensureDatabase(spark, db) === true)   // created (ny:37-57)
      assert(Publish.ensureDatabase(spark, db) === false)  // second probe no-ops
      assert(spark.catalog.databaseExists(db))
      // a db-qualified catalog sink needs no manual CREATE DATABASE step —
      // 2-part, 3-part, and quoted spellings all resolve the same database
      Publish.ensureDatabaseOf(spark, s"spark_catalog.$db2.elsewhere")
      Publish.ensureDatabaseOf(spark, s"`$db2`.elsewhere")
      StarSchema.writeFact(StarSchema.factTrips(spark, sf), s"$db2.fact_trips")
      assert(spark.catalog.tableExists(s"$db2.fact_trips"))
      assert(spark.table(s"$db2.fact_trips").count() > 0)
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
      spark.sql(s"DROP DATABASE IF EXISTS $db2 CASCADE")
    }
  }

  test("schema evolution: mergeSchema unifies old and new parquet generations") {
    // a 100 TB lake accretes schema versions (a column added mid-year);
    // readers must union generations without rewriting history: new
    // columns come back null for old files, and per-file pruning still
    // reads only each generation's own columns
    val spark0 = spark
    import spark0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    try {
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
        .write.mode("overwrite").parquet(s"$dir/gen=1")
      Seq((3L, "c", 0.5), (4L, "d", 0.7)).toDF("id", "v", "score")
        .write.mode("overwrite").parquet(s"$dir/gen=2")
      val merged = spark.read.option("mergeSchema", "true").parquet(dir)
      assert(merged.columns.sorted.toSeq === Seq("gen", "id", "score", "v"))
      val rows = merged.collect()
      assert(rows.length === 4)
      // old-generation rows carry null for the late-added column
      assert(rows.filter(_.getAs[Int]("gen") == 1).forall(_.isNullAt(merged.columns.indexOf("score"))))
      assert(rows.filter(_.getAs[Int]("gen") == 2).forall(!_.isNullAt(merged.columns.indexOf("score"))))
      // without mergeSchema the first-listed footer wins — the trap the
      // option exists to avoid — while explicit select still prunes
      val pruned = merged.select("id", "score").queryExecution.sparkPlan.toString
      assert(pruned.contains("ReadSchema: struct<id:bigint,score:double>"), pruned)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("K2/K3/S7: JDBC create, append, and pushdown-subquery read (embedded Derby)") {
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    val props = new Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")

    val dim = Dims.dimVendors(spark)
    dim.write.mode(SaveMode.Overwrite).jdbc(url, "dim_vendors", props) // K2
    dim.write.mode(SaveMode.Append).jdbc(url, "dim_vendors", props)    // K3

    val back = spark.read.jdbc(url, "dim_vendors", props)
    assert(back.count() === 8)
    assert(back.columns.toSeq === Seq("vendor_id", "vendor_name"))

    // S7: the subquery executes inside the database (pg:62-66 idiom).
    // Spark's writer creates the TABLE name unquoted (Derby folds it to
    // upper-case) but quotes the COLUMN names (case-preserved) — the probe
    // follows the same rules.
    // (Derby stores StringType as CLOB, which can't compare to a literal
    // directly — cast, per Derby's own guidance.)
    val probe = spark.read.jdbc(url,
      """(SELECT CAST("vendor_id" AS VARCHAR(32)) AS vendor_id FROM dim_vendors
        |WHERE CAST("vendor_id" AS VARCHAR(32)) = '1') probe""".stripMargin, props)
    assert(probe.count() === 2)
  }
}
