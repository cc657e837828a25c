package graft.plans

import java.util.{Comparator, HashMap => JHashMap, PriorityQueue => JPriorityQueue}

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BaseOrdering, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Physical per-key top-k via bounded heaps (SURVEY.md §2.7 extension).
  *
  * Two-stage, aggregate-style:
  *
  *   - `partial = true` runs on the child's existing partitioning and
  *     keeps at most k rows per key per partition in a hash-of-heaps,
  *     so at most k·partitions candidate rows per key ever reach the
  *     exchange. The window-function formulation of the same query
  *     (`row_number() <= k`) shuffles EVERY input row and sorts each
  *     key's full row set — at 100 TB that is the difference between
  *     shuffling the table and shuffling ~k rows per key.
  *   - `partial = false` declares `ClusteredDistribution(keys)` so
  *     EnsureRequirements inserts the one hash exchange; it re-reduces
  *     the candidates and emits each key's rows best-first.
  *
  * Memory: each heap holds ≤ k row copies; the partial stage flushes
  * its whole map downstream and resets whenever retained rows exceed
  * `spark.graft.topk.partialFlushRows` (flushing mid-partition only
  * loses combining, never correctness — the final stage re-reduces),
  * so partial-stage memory is bounded even on adversarial key
  * cardinality, analogous to a hash aggregate falling back to
  * pass-through. The final stage holds k rows per key of its shard —
  * the irreducible output size.
  *
  * Not whole-stage-codegen'd: the node replaces a Sort+Window pair
  * (neither of which pipelines anyway); the per-row comparator IS
  * codegen'd via `GenerateOrdering`.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (keys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(keys) :: Nil

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  protected override def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val ordExprs = order
    val kk = k
    val isPartial = partial
    val flushLimit =
      conf.getConfString("spark.graft.topk.partialFlushRows", "4194304").toLong
    val numOutputRows = longMetric("numOutputRows")

    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord: BaseOrdering = GenerateOrdering.generate(ordExprs, childOutput)
      // Heap head = greatest under `ord` = current worst kept row.
      val evictFirst: Comparator[InternalRow] = ord.reverse

      new Iterator[InternalRow] {
        private val heaps = new JHashMap[UnsafeRow, JPriorityQueue[InternalRow]]()
        private var retained = 0L
        private var out: Iterator[InternalRow] = Iterator.empty

        private def insert(row: InternalRow): Unit = {
          val key = keyProj(row)
          var heap = heaps.get(key)
          if (heap == null) {
            heap = new JPriorityQueue[InternalRow](math.min(kk, 16), evictFirst)
            heaps.put(key.copy(), heap)
          }
          if (heap.size < kk) {
            heap.offer(row.copy()); retained += 1
          } else if (ord.compare(row, heap.peek()) < 0) {
            heap.poll(); heap.offer(row.copy())
          }
        }

        /** Materialize heap references, clear the map, emit. Final
          * stage drains each heap worst-first and reverses, so each
          * key's rows stream best-first. */
        private def drainAll(sorted: Boolean): Iterator[InternalRow] = {
          val hs = new Array[JPriorityQueue[InternalRow]](heaps.size)
          val it = heaps.values.iterator
          var i = 0
          while (it.hasNext) { hs(i) = it.next(); i += 1 }
          heaps.clear(); retained = 0
          hs.iterator.flatMap { h =>
            if (!sorted) h.iterator.asScala
            else {
              val arr = new Array[InternalRow](h.size)
              var j = arr.length - 1
              while (j >= 0) { arr(j) = h.poll(); j -= 1 }
              arr.iterator
            }
          }
        }

        private def advance(): Boolean = {
          while (!out.hasNext && (iter.hasNext || !heaps.isEmpty)) {
            if (iter.hasNext) {
              insert(iter.next())
              if (isPartial && retained >= flushLimit) out = drainAll(sorted = false)
            } else {
              out = drainAll(sorted = !isPartial)
            }
          }
          out.hasNext
        }

        override def hasNext: Boolean = advance()
        override def next(): InternalRow = {
          if (!advance()) throw new NoSuchElementException("empty iterator")
          numOutputRows += 1
          out.next()
        }
      }
    }
  }
}
