package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Sketch buffer: total weight + (tree-node id → count). */
case class QDigestBuf(var n: Long, counts: mutable.Map[Long, Long])

/** Mergeable Q-DIGEST quantile sketch over the fixed integer universe
  * [0, 2^universeBits) (Shrivastava et al., SenSys 2004) as a custom
  * typed [[Aggregator]] — the rank-query member of the engine's
  * mergeable-summary family ([[MisraGries]] frequencies,
  * [[LogHistogram]] magnitudes, Datasketches HLL distincts). Values map
  * to leaves of a complete binary tree (leaf id = U + v); COMPRESSION
  * folds any (node, sibling) pair whose count plus the parent's falls
  * under n/k into the parent — coarser resolution exactly where little
  * mass lives. The classic guarantee: any quantile read off the digest
  * has rank error ≤ log₂(U)·n/k, and it survives ARBITRARY merge trees
  * (merge = add node counts, re-compress), which is what per-partition
  * map-side aggregation needs.
  *
  * Like [[MisraGries]], the sketch CONTENTS are merge-order-dependent
  * (which interior nodes absorb mass varies with partitioning), so the
  * digest itself is never an oracle-checked output — the registry op
  * ([[graft.ext.Sketches.qValueQdigest]]) emits EXACT quantiles plus a
  * bound-satisfied verdict, and the quantitative rank-error claim is
  * asserted in the spec.
  *
  * Scale: buffer is ≤ ~4k nodes per task regardless of input size; the
  * shuffle ships digests, not values — the whole point vs an exact
  * sort-based quantile of a 100 TB column.
  */
class QDigest(universeBits: Int, k: Long) extends Aggregator[Long, QDigestBuf, Map[Long, Long]] {
  require(universeBits >= 1 && universeBits <= 30, s"universeBits out of range: $universeBits")
  require(k >= 2, s"QDigest needs k >= 2, got $k")
  private val u: Long = 1L << universeBits

  override def zero: QDigestBuf = QDigestBuf(0L, mutable.Map.empty)

  override def reduce(b: QDigestBuf, v: Long): QDigestBuf = {
    require(v >= 0 && v < u, s"value $v outside universe [0, $u)")
    val leaf = u + v
    b.counts(leaf) = b.counts.getOrElse(leaf, 0L) + 1L
    b.n += 1L
    if (b.counts.size > 4 * k.toInt) compress(b)
    b
  }

  override def merge(a: QDigestBuf, b: QDigestBuf): QDigestBuf = {
    b.counts.foreach { case (id, c) => a.counts(id) = a.counts.getOrElse(id, 0L) + c }
    a.n += b.n
    compress(a)
    a
  }

  /** Bottom-up fold of under-threshold (node, sibling, parent) triples.
    * Threshold = n/k (the textbook rule); processing ids descending
    * visits children before parents, so one sweep suffices.
    */
  private def compress(b: QDigestBuf): Unit = {
    val t = b.n / k
    if (t <= 0L) return
    val ids = b.counts.keys.toArray.sorted(Ordering.Long.reverse)
    ids.foreach { id =>
      if (id > 1L && b.counts.contains(id)) {
        val sib = id ^ 1L
        val par = id >> 1
        val cSelf = b.counts(id)
        val cSib = b.counts.getOrElse(sib, 0L)
        val cPar = b.counts.getOrElse(par, 0L)
        if (cSelf + cSib + cPar < t) {
          b.counts(par) = cSelf + cSib + cPar
          b.counts.remove(id)
          b.counts.remove(sib)
        }
      }
    }
  }

  override def finish(b: QDigestBuf): Map[Long, Long] = { compress(b); b.counts.toMap }
  override def bufferEncoder: Encoder[QDigestBuf] = Encoders.kryo[QDigestBuf]
  override def outputEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
}

object QDigest {
  /** Rank-query helper shared by the registry op and its spec: the
    * quantile-φ estimate is the right endpoint of the node at which the
    * (right-endpoint, deeper-first) scan's running count reaches
    * ceil(φ·n) — the textbook read-off.
    */
  def quantile(counts: Map[Long, Long], universeBits: Int, num: Long, den: Long): Long = {
    val u = 1L << universeBits
    val n = counts.values.sum
    val target = (n * num + den - 1) / den
    val nodes = counts.toSeq.map { case (id, c) =>
      val depth = 63 - java.lang.Long.numberOfLeadingZeros(id)
      val span = universeBits - depth
      val rightLeaf = ((id + 1L) << span) - 1L - u
      (rightLeaf, -span, c)  // deeper (smaller span) first on ties
    }.sorted
    var cum = 0L
    var ans = u - 1L
    val it = nodes.iterator
    var found = false
    while (it.hasNext && !found) {
      val (right, _, c) = it.next()
      cum += c
      if (cum >= target) { ans = right; found = true }
    }
    ans
  }
}
