package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension (SURVEY §7.3 ladder step (c)): a
  * native top-k-per-key operator — logical node, planner strategy, and a
  * heap-based physical exec.
  *
  * Why it exists: the stock formulation (`row_number().over(Window
  * .partitionBy(keys).orderBy(ord)) <= k`) must SORT every partition's
  * full row set before discarding all but k rows per key. This operator
  * declares only a ClusteredDistribution requirement — the planner
  * inserts the hash exchange but NO SortExec — and keeps one bounded
  * heap of size k per key: O(rows·log k) comparisons and O(keys·k)
  * memory per partition, versus the window's O(rows·log rows) sort and
  * full-partition spill surface. At 100 TB with heavy keys (the salted
  * top-k problem of [[graft.queries.Analytics.qTopOrdersPerPriority]]),
  * dropping the sort is the difference between a streaming pass and a
  * spill-bound one.
  */
case class TopKPerKey(
    k: Int, keys: Seq[Expression], order: Seq[SortOrder], child: LogicalPlan)
  extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans [[TopKPerKey]] to [[TopKPerKeyExec]]; injectable via
  * `SparkSessionExtensions.injectPlannerStrategy` or
  * `experimental.extraStrategies` (see [[graft.functions.GraftOps]]).
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, child) =>
      TopKPerKeyExec(k, keys, order, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap top-k per key. Requires co-location of key groups (the
  * planner inserts the exchange) but NO child ordering — that absence is
  * the operator's entire advantage over the window form. Rows within a
  * key are emitted in `order`; key groups emit in first-seen order
  * (callers wanting a global presentation order add their own sort, as
  * with any aggregate).
  */
case class TopKPerKeyExec(
    k: Int, keys: Seq[Expression], order: Seq[SortOrder], child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keysLocal = keys
    val orderLocal = order
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keysLocal, childOutput)
      // codegen'd comparator with interpreted fallback; head of the heap =
      // WORST retained row (max under the requested order)
      val ord = RowOrdering.create(orderLocal, childOutput)
      val heaps = new java.util.LinkedHashMap[UnsafeRow, mutable.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = mutable.PriorityQueue.empty[InternalRow](ord)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { heap =>
        heap.dequeueAll.reverseIterator // dequeueAll emits worst-first; reverse = `order`
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
