package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra–Gries heavy-hitters sketch as a custom typed
  * [[Aggregator]] — the harder mergeable-sketch counterpart to
  * [[LogHistogram]]'s constant-width buffer: the MG summary holds at
  * most k−1 (item, weight) counters, decrementing all counters when a
  * new item finds the table full, and MERGES by summing tables then
  * subtracting the k-th largest weight (Agarwal et al., "Mergeable
  * Summaries") — after any merge tree the classic guarantees still
  * hold:
  *
  *   1. every item with true frequency > N/k IS in the summary
  *      (no false negatives among heavy hitters);
  *   2. each surviving counter underestimates its item's true count by
  *      at most N/k.
  *
  * The sketch CONTENTS are merge-order-dependent (which sub-threshold
  * items survive varies with partitioning) — that is inherent to MG,
  * so the sketch itself is never an oracle-checked output. The engine
  * uses it the way production does: as pass 1 of the TWO-PASS exact
  * heavy-hitters query ([[graft.ext.TextOps.qDocHeavyHitters]]), whose
  * guarantee-(1) superset makes the final, exactly-verified output
  * deterministic regardless of sketch internals.
  *
  * Scale: the whole point vs a full `groupBy(token).count()` — the
  * sketch's map-side state is ≤ k−1 counters per task and the merge
  * ships ≤ k−1 rows per partition, where the exact count of a 100 TB
  * token stream shuffles its full distinct-token cardinality. Pass 2
  * then exact-counts ONLY the ≤ k−1 broadcast candidates.
  */
class MisraGries(k: Int) extends Aggregator[String, mutable.Map[String, Long], Map[String, Long]] {
  require(k >= 2, s"Misra-Gries needs k >= 2, got $k")

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(buf: mutable.Map[String, Long], x: String): mutable.Map[String, Long] = {
    if (buf.contains(x)) buf(x) += 1L
    else if (buf.size < k - 1) buf(x) = 1L
    else {
      // decrement-all: the textbook step that charges one occurrence of
      // every tracked item plus x itself
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { key =>
        val nv = buf(key) - 1L
        if (nv <= 0L) dead += key else buf(key) = nv
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (key, w) => a(key) = a.getOrElse(key, 0L) + w }
    if (a.size > k - 1) {
      // subtract the k-th largest weight from everything; at most k-1
      // strictly-positive counters remain (Mergeable Summaries, §3)
      val kth = a.values.toArray.sortBy(-_).apply(k - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      a.keysIterator.foreach { key =>
        val nv = a(key) - kth
        if (nv <= 0L) dead += key else a(key) = nv
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def finish(buf: mutable.Map[String, Long]): Map[String, Long] = buf.toMap
  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
