package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed [[Aggregator]] (the remaining sanctioned extension type
  * after the codegen'd Expression and the whole-operator plan — SURVEY
  * §7.3): a fixed-width log₂ histogram of a double measure. 16 buckets
  * spanning 2⁻⁸..2⁷; values below/above clamp to the edge buckets.
  *
  * The buffer is a constant 16-long array — mergeable, constant-memory,
  * and map-side combinable, which is the entire point of an Aggregator
  * over a collect-and-fold: at 100 TB each task ships 128 bytes per
  * group, never the values.
  *
  * Determinism note: buckets are assigned by COMPARISON against exact
  * power-of-two literals, not `floor(log2(v))` — log/exp are
  * correctly-rounded-ish transcendentals whose last ulp differs between
  * implementations, and a value sitting on a bucket edge could flip
  * buckets between engines; comparisons against exact binary constants
  * cannot. The DuckDB oracle uses the same thresholds in a CASE.
  */
object LogHistogram extends Aggregator[Double, Array[Long], Seq[Long]] {

  val nBuckets = 16
  val minExp = -8 // bucket 0: v < 2^-8; bucket i: 2^(i-9) <= v < 2^(i-8); bucket 15: v >= 2^6

  /** Exact power-of-two thresholds 2^-8 .. 2^6 (15 edges → 16 buckets). */
  val thresholds: Array[Double] =
    (0 until nBuckets - 1).map(i => math.pow(2.0, (minExp + i).toDouble)).toArray

  /** NaN lands in the TOP bucket, matching the oracle CASE's ELSE arm
    * (every `NaN < t` comparison is false in both engines, but the Scala
    * loop would otherwise send NaN to bucket 0 — an engine divergence
    * waiting for the first NaN measure). NULL measures are out of
    * contract: the typed Double input erases them to 0.0 before the
    * aggregator sees them — filter nulls upstream.
    */
  def bucket(v: Double): Int = {
    if (v.isNaN) return nBuckets - 1
    var b = 0
    while (b < thresholds.length && v >= thresholds(b)) b += 1
    b
  }

  override def zero: Array[Long] = new Array[Long](nBuckets)
  override def reduce(buf: Array[Long], v: Double): Array[Long] = {
    buf(bucket(v)) += 1L; buf
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nBuckets) { a(i) += b(i); i += 1 }
    a
  }
  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
