package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode, UnsafeExternalRowSorter}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.util.collection.unsafe.sort.PrefixComparators

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
  * EnsureRequirements) → final. The in-memory row budget is captured from
  * the session conf at planning time (executors never read session confs). */
object GraftStrategies extends SparkStrategy {
  /** Max rows retained across all per-key heaps in ONE task (≈ distinct
    * keys × k for that task) before [[TopKPerKeyExec]] abandons the
    * hash-of-heaps and falls back to a spillable external sort. The default
    * bounds the map at ~4M retained row copies per task — a few hundred MB
    * worst case — where a billion-distinct-key pass (e.g. latest-per-key
    * CDC over a 100 TB corpus) would otherwise OOM the executor. */
  val MaxRowsKey = "spark.graft.topk.maxRowsInMemory"
  val MaxRowsDefault: Int = 4 * 1024 * 1024

  /** TEST-ONLY: force the fallback's external sorter to spill every N
    * inserted records (0 = off, production default). The same hook Spark's
    * own sort tests use — it lets TopKLawsSpec prove the disk-spill path
    * end-to-end instead of trusting that the sorter would spill under real
    * memory pressure. */
  val TestSpillFrequencyKey = "spark.graft.topk.testSpillFrequency"

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, ordering, k, child) =>
      val maxRows = SQLConf.get.getConfString(MaxRowsKey, MaxRowsDefault.toString).toInt
      val spillFreq = SQLConf.get.getConfString(TestSpillFrequencyKey, "0").toInt
      val partial = TopKPerKeyExec(keys, ordering, k, planLater(child),
        partial = true, maxRowsInMemory = maxRows, testSpillFrequency = spillFreq)
      TopKPerKeyExec(keys, ordering, k, partial,
        partial = false, maxRowsInMemory = maxRows, testSpillFrequency = spillFreq) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap per-key top-k. `partial = true` runs before the shuffle on
  * whatever partitioning arrives (map-side combine); the final copy
  * requires a clustered distribution on the keys, so EnsureRequirements
  * inserts exactly one hash exchange between the two — over at most
  * keys*k rows per upstream partition.
  *
  * MEMORY CONTRACT: the hash-of-heaps holds at most `maxRowsInMemory` row
  * copies. The task that exceeds it (distinct-key cardinality beyond the
  * budget) falls back to Spark's spillable external sort — the pruned heap
  * contents plus the rest of the input are sorted by (keys, rank order) and
  * the first k rows of each key group are streamed out. The fallback is
  * LOSSLESS: a row evicted from its heap was strictly worse than k rows of
  * its key that stayed retained (the heap keeps the best k seen so far, and
  * retained rows are only ever replaced by better ones), so no evicted row
  * can belong to the final top k. Stock Spark bounds the same shape the
  * same way — hash aggregate falls back to sort-based aggregation, and the
  * window formulation this operator replaces sorts spillably; without the
  * fallback this was the one memory-unbounded structure in the engine.
  * The fallback path requires the key types to be orderable (true of every
  * practical grouping key; same requirement as Spark's own sort fallback).
  * `fallbackTasks` in the node's SQL metrics counts the tasks that took it.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean,
    maxRowsInMemory: Int = GraftStrategies.MaxRowsDefault,
    testSpillFrequency: Int = 0) extends UnaryExecNode {
  require(maxRowsInMemory >= 1,
    s"${GraftStrategies.MaxRowsKey} must be >= 1, got $maxRowsInMemory")

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "fallbackTasks" -> SQLMetrics.createMetric(sparkContext,
      "tasks that fell back to spillable sort"))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortExprs = ordering
    val attrs = output
    val limit = k
    val maxRows = maxRowsInMemory
    val spillFreq = testSpillFrequency
    val schema = DataTypeUtils.fromAttributes(attrs)
    val fallbackTasks = longMetric("fallbackTasks")
    child.execute().mapPartitions { iter =>
      val keyGen = UnsafeProjection.create(keyExprs, attrs)
      // codegen'd comparator; compare(a, b) < 0 means a ranks before b
      val ord = RowOrdering.create(sortExprs, attrs)
      // max-heap w.r.t. the rank order: head is the worst row currently kept
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      var retained = 0L
      var overflow = false
      while (iter.hasNext && !overflow) {
        val row = iter.next()
        heaps.get(keyGen(row)) match {
          case Some(heap) =>
            if (heap.size < limit) { heap.enqueue(row.copy()); retained += 1 }
            else if (ord.compare(row, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(row.copy())
            }
          case None =>
            val heap = new mutable.PriorityQueue[InternalRow]()(ord)
            heap.enqueue(row.copy())
            heaps.update(keyGen(row).copy(), heap)
            retained += 1
        }
        if (retained > maxRows) overflow = true
      }
      if (!overflow) heaps.iterator.flatMap(_._2.iterator)
      else {
        fallbackTasks += 1
        // Spill path: external-sort (heap remnants ++ remaining input) by
        // (keys asc, rank order), then stream each key group's first k rows.
        // Constant zero prefixes push every comparison to the full row
        // comparator — correct for arbitrary (multi-column) grouped orders.
        val groupedOrder: Seq[SortOrder] =
          keyExprs.map(SortOrder(_, Ascending)) ++ sortExprs
        val sortOrd = RowOrdering.create(groupedOrder, attrs)
        val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
          private val zero = new UnsafeExternalRowSorter.PrefixComputer.Prefix
          override def computePrefix(row: InternalRow): UnsafeExternalRowSorter.PrefixComputer.Prefix = {
            zero.isNull = false; zero.value = 0L; zero
          }
        }
        // Page size from the executor's memory manager (what SortExec
        // passes) — read here inside the task so allocation granularity
        // follows the executor memory config, not a constant.
        val pageSize = org.apache.spark.SparkEnv.get.memoryManager.pageSizeBytes
        val sorter = UnsafeExternalRowSorter.create(
          schema, sortOrd, PrefixComparators.LONG, prefixComputer,
          pageSize, /* canUseRadixSort = */ false)
        if (spillFreq > 0) {
          // package-private test hook (same one SortExec's tests use):
          // spill to disk every spillFreq records so the disk path is
          // law-testable without fabricating executor memory pressure.
          // Reached reflectively because it is package-private; pinned to
          // the Spark 4.1 signature, so fail with a named cause rather
          // than an opaque NoSuchMethodException if an upgrade moves it.
          val m =
            try classOf[UnsafeExternalRowSorter]
              .getDeclaredMethod("setTestSpillFrequency", classOf[Int])
            catch {
              case e: NoSuchMethodException => throw new IllegalStateException(
                s"${GraftStrategies.TestSpillFrequencyKey} > 0 needs the package-private " +
                  "UnsafeExternalRowSorter.setTestSpillFrequency(Int) test hook " +
                  "(present in Spark 4.1.x); this Spark build does not have it — " +
                  "unset the conf or restore the hook", e)
            }
          m.setAccessible(true)
          m.invoke(sorter, Integer.valueOf(spillFreq))
        }
        val toUnsafe = UnsafeProjection.create(attrs, attrs)
        heaps.valuesIterator.foreach(_.foreach(r => sorter.insertRow(toUnsafe(r))))
        heaps.clear()
        while (iter.hasNext) sorter.insertRow(toUnsafe(iter.next()))
        val sorted = sorter.sort()
        // The sorter's iterator reuses one row buffer per next(), so the
        // lookahead copies EMITTED rows only (≤ keys*k; skipped rows are
        // never copied).
        new Iterator[InternalRow] {
          private var curKey: UnsafeRow = _
          private var curCount = 0
          private var ready: InternalRow = _
          private def advance(): Unit = {
            ready = null
            while (ready == null && sorted.hasNext) {
              val row = sorted.next()
              val key = keyGen(row)
              if (curKey == null || key != curKey) {
                curKey = key.copy()
                curCount = 0
              }
              if (curCount < limit) { curCount += 1; ready = row.copy() }
            }
          }
          advance()
          override def hasNext: Boolean = ready != null
          override def next(): InternalRow = { val r = ready; advance(); r }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"
}
