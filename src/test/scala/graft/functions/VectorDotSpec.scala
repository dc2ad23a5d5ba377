package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.SparkSuite
import graft.model.Tables

/** [[VectorDot]] must be bit-identical to the built-in higher-order
  * formulation it replaces (sequential left-to-right double fold) — that
  * equivalence is what lets [[graft.ext.Similarity]] swap it in without
  * touching the oracle SQL.
  */
class VectorDotSpec extends SparkSuite {

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("vector_dot matches the higher-order fold bit-for-bit on real embeddings") {
    val emb = Tables.embeddings(spark, sf)
    val both = emb.select(
      GraftFunctions.vector_dot(col("embedding"), col("embedding")).as("native"),
      hofDot(col("embedding"), col("embedding")).as("hof"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("codegen path is exercised (no interpreted fallback)") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val emb = Tables.embeddings(spark, sf)
      val n = emb.select(GraftFunctions.vector_dot(col("embedding"), col("embedding")).as("d"))
        .filter(col("d") > 0).count()
      assert(n > 0)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("null array yields null, empty arrays yield 0.0, length mismatch truncates") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)),
        |  (array(), array()),
        |  (array(2.0d, 3.0d, 100.0d), array(10.0d, 10.0d))
        |AS t(a, b)""".stripMargin)
      .select(GraftFunctions.vector_dot(col("a"), col("b")).as("d"))
    assert(df.collect().toSeq.map(r => if (r.isNullAt(0)) null else r.getDouble(0)) ==
      Seq(null, 0.0, 50.0))
  }

  test("SQL surface resolves after registerSql") {
    GraftExtensions.registerSql(spark)
    val Row(d: Double) =
      spark.sql("SELECT vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head()
    assert(d == 11.0)
    // float arrays widen through the builder's cast
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_vds")
    val n = spark.sql(
      "SELECT vector_dot(embedding, embedding) AS d FROM emb_vds").filter("d > 0").count()
    assert(n > 0)
  }
}
