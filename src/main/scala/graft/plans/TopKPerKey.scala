package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BaseOrdering, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Whole-operator Catalyst extension (SURVEY §2.10 tier (c)): top-k rows
  * per key as a first-class physical operator, planned as
  *
  * {{{
  *   TopKPerKeyExec(final)            O(k) memory, streaming over sorted runs
  *     +- Sort(keys ++ order)         spillable, input already pruned
  *       +- Exchange(hash(keys))      carries <= maps * keys_per_map * k rows
  *         +- TopKPerKeyExec(partial) per-partition bounded heaps
  *           +- child
  * }}}
  *
  * The Window-function formulation (`row_number() OVER (PARTITION BY key
  * ORDER BY ord) <= k`, the w01 shape) must shuffle EVERY row and sort
  * EVERY group in full before discarding all but k rows. Here the
  * partial stage prunes each map partition down to at most k rows per
  * observed key BEFORE the exchange — on a 100 TB fact table with
  * bounded key cardinality the shuffle payload drops from the full table
  * to ~(mapTasks * |keys| * k) rows, and the post-shuffle sort runs on
  * that pruned remnant instead of the raw table. Same asymmetric
  * partial/final split as HashAggregateExec, applied to ranking.
  *
  * Memory safety: the partial heap map is capped at `maxPartialKeys`
  * distinct keys; on overflow it FLUSHES (emits retained rows, clears,
  * keeps pruning) — correctness never depends on the cap because the
  * final stage re-prunes, so a high-cardinality key column degrades to a
  * pass-through, never to OOM (HashAggregate's partial-agg fallback
  * contract). The final stage requires child ordering (keys ++ order) —
  * Spark inserts a spillable SortExec — and then streams each key run
  * keeping only its first k rows: O(k) state, any group size.
  *
  * Determinism: ties are the caller's contract exactly as with
  * row_number — pass a total order (unique tie-break key) for
  * reproducible output. Grouping keys must not be FloatType/DoubleType
  * (heap/final grouping compares key bytes; NaN/-0.0 normalization is a
  * Window-planner service this operator does not replicate) — the
  * builder rejects them eagerly.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    maxPartialKeys: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKPerKey {
  /** Planner strategy: partial prune below the (EnsureRequirements-
    * inserted) exchange + sort, exact prune above.
    */
  object Strategy extends org.apache.spark.sql.execution.SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerKeyNode(keys, order, k, cap, child) =>
        val partial =
          TopKPerKeyExec(keys, order, k, cap, partial = true, planLater(child))
        TopKPerKeyExec(keys, order, k, cap, partial = false, partial) :: Nil
      case _ => Nil
    }
  }

  /** DataFrame-level entry point. `order` columns may carry `.desc`/
    * `.asc_nulls_last` etc; bare columns default to ascending.
    */
  def apply(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int,
            maxPartialKeys: Int = 1 << 16): DataFrame = {
    require(k > 0, s"topKPerKey: k must be positive, got $k")
    require(maxPartialKeys >= 1, "topKPerKey: maxPartialKeys must be >= 1")
    require(keys.nonEmpty,
      "topKPerKey: at least one grouping key is required " +
        "(for a global top-k use orderBy(...).limit(k))")
    // The session converter turns Column sort nodes into catalyst
    // SortOrder eagerly — ColumnBridge.expression would hand back a lazy
    // ColumnNodeExpression wrapper that never serializes to executors.
    val session = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val keyExprs = keys.map(session.expression)
    val sortOrders = order.map(c => session.expression(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    val out = PlanBridge.ofRows(session,
      TopKPerKeyNode(keyExprs, sortOrders, k, maxPartialKeys,
        df.queryExecution.analyzed))
    out.queryExecution.analyzed.foreach {
      case n: TopKPerKeyNode => n.keys.foreach(_.dataType match {
        case FloatType | DoubleType =>
          throw new IllegalArgumentException(
            "topKPerKey: floating-point grouping keys are not supported " +
              "(byte-wise key equality; normalize or cast the key first)")
        case _ => ()
      })
      case _ => ()
    }
    out
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    maxPartialKeys: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numFlushes" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext,
        "partial heap flushes (key-cap overflows)"))

  override def output: Seq[Attribute] = child.output

  override def outputPartitioning = child.outputPartitioning

  private def keyAscOrder: Seq[SortOrder] =
    keys.map(e => SortOrder(e, Ascending))

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  // Final stage streams over contiguous key runs; the keys themselves
  // only need to be grouped, not meaningfully ordered, but asc is the
  // cheapest grouping order to ask EnsureRequirements for.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil) else Seq(keyAscOrder ++ order)

  override def outputOrdering: Seq[SortOrder] =
    if (partial) Nil else keyAscOrder ++ order

  override def nodeName: String =
    if (partial) "GraftTopKPerKeyPartial" else "GraftTopKPerKeyFinal"

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val kk = k
    val cap = maxPartialKeys
    val outRows = longMetric("numOutputRows")
    val flushes = longMetric("numFlushes")
    if (partial) {
      child.execute().mapPartitions { iter =>
        new PartialTopKIterator(iter, keyExprs, sortOrder, childOutput, kk,
          cap, outRows, flushes)
      }
    } else {
      // Input sorted by (keys, order): emit the first k rows of each key
      // run, skip the remainder — O(1) state (a count + the previous
      // key's bytes). Rows pass through WITHOUT copying, so the next
      // input row must not be pulled until the caller has consumed the
      // current one (sort output reuses its row buffer): advance lazily.
      child.execute().mapPartitions { iter =>
        val keyProj = UnsafeProjection.create(keyExprs, childOutput)
        new Iterator[InternalRow] {
          private var prevKey: UnsafeRow = _
          private var runCount = 0
          private var nextRow: InternalRow = _

          private def advance(): Unit = {
            while (nextRow == null && iter.hasNext) {
              val row = iter.next()
              val key = keyProj(row)
              if (prevKey == null || key != prevKey) {
                prevKey = key.copy()
                runCount = 0
              }
              if (runCount < kk) { runCount += 1; nextRow = row }
            }
          }

          override def hasNext: Boolean = {
            if (nextRow == null) advance()
            nextRow != null
          }
          override def next(): InternalRow = {
            if (nextRow == null) advance()
            val r = nextRow; nextRow = null; outRows += 1; r
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Per-partition bounded heaps: at most k retained rows per key, at most
  * `cap` keys resident; overflow flushes retained rows downstream (the
  * final stage re-prunes, so a flush costs shuffle bytes, never
  * correctness).
  */
private final class PartialTopKIterator(
    input: Iterator[InternalRow],
    keys: Seq[Expression],
    order: Seq[SortOrder],
    childOutput: Seq[Attribute],
    k: Int,
    cap: Int,
    outRows: org.apache.spark.sql.execution.metric.SQLMetric,
    flushes: org.apache.spark.sql.execution.metric.SQLMetric)
  extends Iterator[InternalRow] {

  private val keyProj = UnsafeProjection.create(keys, childOutput)
  private val rowOrd: BaseOrdering = RowOrdering.create(order, childOutput)
  // Max-heap by sort order: head is the WORST retained row for the key,
  // the one a better-ranked newcomer evicts.
  private val heapOrd: Ordering[UnsafeRow] = new Ordering[UnsafeRow] {
    override def compare(a: UnsafeRow, b: UnsafeRow): Int = rowOrd.compare(a, b)
  }
  private val heaps =
    mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
  private var emit: Iterator[InternalRow] = Iterator.empty

  private def consume(): Unit = {
    while (input.hasNext && emit.isEmpty) {
      val row = input.next()
      val key = keyProj(row)
      heaps.get(key) match {
        case Some(heap) =>
          if (heap.size < k) {
            heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
          } else if (rowOrd.compare(row, heap.head) < 0) {
            heap.dequeue()
            heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
          }
        case None =>
          if (heaps.size >= cap) { flushes += 1; flush() }
          val heap = mutable.PriorityQueue.empty[UnsafeRow](heapOrd)
          heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
          heaps.put(key.copy(), heap)
      }
    }
    if (emit.isEmpty && !input.hasNext && heaps.nonEmpty) flush()
  }

  private def flush(): Unit = {
    val rows = heaps.valuesIterator.flatMap(_.iterator).toArray
    heaps.clear()
    emit = rows.iterator
  }

  override def hasNext: Boolean = {
    if (emit.isEmpty) consume()
    emit.hasNext
  }

  override def next(): InternalRow = {
    if (emit.isEmpty) consume()
    outRows += 1
    emit.next()
  }
}
