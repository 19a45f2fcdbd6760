package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

import scala.collection.mutable

/** Group top-k as a first-class operator — the full custom-operator ladder:
  * a logical node ([[TopKPerKey]]), a planner strategy ([[GraftStrategies]])
  * lowering it to a two-phase physical operator ([[TopKPerKeyExec]]), and
  * registration through `spark.sql.extensions=graft.GraftExtensions`
  * ([[graft.GraftExtensions]]) — the same extension path a deployed cluster
  * uses via spark-submit conf.
  *
  * Why an operator instead of `row_number() OVER (...) <= k`: the Window
  * formulation shuffles every row, then SORTS each key's entire row set to
  * rank it. This operator keeps a bounded heap of k rows per key on both
  * sides of the shuffle — partial top-k before the exchange (only keys*k
  * rows ever shuffle, the map-side-combine of top-k) and a merge after —
  * so memory is O(keys*k) per task and nothing is ever globally sorted.
  * At 100 TB the Window version's per-key sort is the bottleneck; this is
  * the shape a dedicated engine gives the operator, expressed as a
  * Catalyst extension rather than a fork.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"topKPerKey: k must be >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans [[TopKPerKey]] as partial → (exchange inserted by
  * EnsureRequirements) → final. */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, ordering, k, child) =>
      val partial = TopKPerKeyExec(keys, ordering, k, planLater(child), partial = true)
      TopKPerKeyExec(keys, ordering, k, partial, partial = false) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap per-key top-k. `partial = true` runs before the shuffle on
  * whatever partitioning arrives (map-side combine); the final copy
  * requires a clustered distribution on the keys, so EnsureRequirements
  * inserts exactly one hash exchange between the two — over at most
  * keys*k rows per upstream partition. */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortExprs = ordering
    val attrs = output
    val limit = k
    child.execute().mapPartitions { iter =>
      val keyGen = UnsafeProjection.create(keyExprs, attrs)
      // codegen'd comparator; compare(a, b) < 0 means a ranks before b
      val ord = RowOrdering.create(sortExprs, attrs)
      // max-heap w.r.t. the rank order: head is the worst row currently kept
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyGen(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < limit) heap.enqueue(row.copy())
            else if (ord.compare(row, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(row.copy())
            }
          case None =>
            val heap = new mutable.PriorityQueue[InternalRow]()(ord)
            heap.enqueue(row.copy())
            heaps.update(key.copy(), heap)
        }
      }
      heaps.iterator.flatMap(_._2.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"
}
