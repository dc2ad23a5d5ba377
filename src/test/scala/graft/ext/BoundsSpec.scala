package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Regression tests for the r12-#6 integer-width promotions (SURVEY
  * §2.12): each test builds the exact collision the RETIRED packed-key
  * encoding silently mis-ordered, proves the packing really inverts
  * (so the test bites), and asserts the promoted struct key picks the
  * semantically correct winner. These are the cases where BOTH engines
  * used to agree on the wrong answer — invisible to the oracle gate.
  */
class BoundsSpec extends SparkSuite {

  test("passage-dedup first occurrence: struct min correct past the old 100000-passage bound") {
    val spark0 = spark
    import spark0.implicits._
    // two passages share a hash; the true FIRST occurrence is doc 1 (at
    // passage position 200000 ≈ a 3.2M-token document). The retired
    // doc_id·100000+pos key inverted this pair.
    assert(1L * 100000L + 200000L > 2L * 100000L + 0L, "old packing inverts")
    val df = Seq((1L, 200000, 77L), (2L, 0, 77L), (9L, 3, 42L))
      .toDF("doc_id", "pos", "h")
    val keyed = df.withColumn("k", struct(col("doc_id"), col("pos")))
      .withColumn("keep",
        col("k") === min(col("k")).over(Window.partitionBy(col("h"))))
    val kept = keyed.filter(col("keep")).select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 9L), "doc 1 is the first occurrence, not doc 2")
  }

  test("user-streaks winner: struct max_by correct past the old 2^20 epoch-day bound") {
    val spark0 = spark
    import spark0.implicits._
    // streak A is LONGER (len 5) but starts past epoch day 2^20 (year
    // ~4841), where the retired len·2²⁰+(2²⁰−1−start_dn) complement goes
    // negative and drops A below the shorter streak B.
    val a = 5L * 1048576L + (1048575L - 2000000L)
    val b = 4L * 1048576L + (1048575L - 0L)
    assert(a < b, "old packing inverts: shorter streak wins")
    val isl = Seq((1L, 5L, 2000000L), (1L, 4L, 0L)).toDF("user_id", "len", "start_dn")
    val got = isl.groupBy($"user_id")
      .agg(expr("max_by(start_dn, struct(len, -start_dn))").as("win"))
      .head.getLong(1)
    assert(got === 2000000L, "the len-5 streak wins under the struct key")
    // and ties on len still break to the EARLIEST start, incl. pre-1970
    val tie = Seq((1L, 4L, -30L), (1L, 4L, 10L)).toDF("user_id", "len", "start_dn")
    assert(tie.groupBy($"user_id")
      .agg(expr("max_by(start_dn, struct(len, -start_dn))")).head.getLong(1) === -30L)
  }

  test("label-prop tie-break: struct max_by correct past the old 10^7 label bound") {
    val spark0 = spark
    import spark0.implicits._
    // label 15e6 has MORE votes (3) than label 1 (2), but the retired
    // cnt·10⁷−nlbl key ranks it below once nlbl exceeds the 10⁷ scale.
    assert(3L * 10000000L - 15000000L < 2L * 10000000L - 1L, "old packing inverts")
    val votes = Seq((7L, 15000000L, 3L), (7L, 1L, 2L)).toDF("uid", "nlbl", "cnt")
    val got = votes.groupBy($"uid")
      .agg(max_by($"nlbl", struct($"cnt", -$"nlbl")).as("new_lbl"))
      .head.getLong(1)
    assert(got === 15000000L, "the 3-vote label wins under the struct key")
    // equal votes still tie to the SMALLEST label
    val tie = Seq((7L, 20000001L, 2L), (7L, 4L, 2L)).toDF("uid", "nlbl", "cnt")
    assert(tie.groupBy($"uid")
      .agg(max_by($"nlbl", struct($"cnt", -$"nlbl"))).head.getLong(1) === 4L)
  }

  test("DuckDB-oracle struct-min window (passage dedup) agrees with Spark on the same collision") {
    // the promoted oracle encoding is {'d': doc_id, 'p': pos} — pin the
    // Spark side of that exact window shape so a future oracle edit that
    // reverts to packing must fail here
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1L, 200000, 77L), (2L, 0, 77L)).toDF("doc_id", "pos", "h")
    df.createOrReplaceTempView("bounds_p")
    val kept = spark.sql(
      """SELECT doc_id FROM (
        |  SELECT doc_id,
        |    struct(doc_id, pos) = min(struct(doc_id, pos))
        |      OVER (PARTITION BY h) AS keep
        |  FROM bounds_p) WHERE keep""".stripMargin)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L))
  }
}
