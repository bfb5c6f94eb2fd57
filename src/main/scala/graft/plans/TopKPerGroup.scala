package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, Descending, Expression,
  GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Native per-group top-k: the whole-operator tier (custom LogicalPlan
  * + Strategy + SparkPlan) for a shape Spark only expresses as
  * `row_number().over(Window.partitionBy(g).orderBy(o)) <= k` — which
  * fully SORTS every group. This operator keeps a bounded k-heap per
  * group instead:
  *
  *   partial TopKPerGroupExec (any distribution, heaps per key)
  *     → Exchange on group key (inserted by EnsureRequirements)
  *       → final TopKPerGroupExec (heaps again, emits rank)
  *
  * Map-side partials shrink the exchange to ≤ k rows per (partition,
  * key) — the same shape partial aggregation gives groupBy — and no
  * stage ever sorts more than k elements per key. At 100 TB with
  * millions of groups this replaces an O(n log n) sort per group with
  * O(n log k).
  *
  * Output = child columns + `topk_rank` (1-based, dense within group).
  * Ties must be broken by the caller's ordering for determinism.
  */
case class TopKPerGroupPlan(
    k: Int,
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    child: LogicalPlan,
    // constructor param (NOT a body val): tree transforms copy() nodes,
    // and a body val would mint a fresh exprId on every copy, orphaning
    // downstream references to topk_rank
    rankAttr: AttributeReference =
      AttributeReference("topk_rank", IntegerType, nullable = false)())
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroupPlan =
    copy(child = c)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p @ TopKPerGroupPlan(k, g, o, child, _) =>
      val partial = TopKPerGroupExec(k, g, o, planLater(child), partial = true, p.rankAttr)
      TopKPerGroupExec(k, g, o, partial, partial = false, p.rankAttr) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    k: Int,
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    child: SparkPlan,
    partial: Boolean,
    rankAttr: AttributeReference) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    if (partial) org.apache.spark.sql.catalyst.expressions.AttributeSet.empty
    else org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val gExprs = groupExprs
    val oExprs = orderExprs
    val kk = k
    val isPartial = partial
    val outAttrs = output
    child.execute().mapPartitions ({ iter =>
      val keyProj = UnsafeProjection.create(gExprs, childOutput)
      val rowOrdering =
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .create(oExprs, childOutput)
      // PriorityQueue dequeues the MAX under its ordering; under the
      // row ordering itself the max is the WORST kept row — exactly the
      // eviction candidate we want at head.
      val heapOrd: Ordering[InternalRow] = rowOrdering
      val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](heapOrd)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.enqueue(row.copy())
        else if (rowOrdering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      val entries = heaps.entrySet().iterator()
      if (isPartial) {
        // emit kept rows unranked; final phase re-ranks after merge
        new Iterator[InternalRow] {
          private var cur: Iterator[InternalRow] = Iterator.empty
          override def hasNext: Boolean = {
            while (!cur.hasNext && entries.hasNext) cur = entries.next().getValue.iterator
            cur.hasNext
          }
          override def next(): InternalRow = cur.next()
        }
      } else {
        val proj = UnsafeProjection.create(outAttrs, childOutput :+ rankAttr)
        val joined = new JoinedRow
        val rankRow = new GenericInternalRow(1)
        new Iterator[InternalRow] {
          private var cur: Iterator[InternalRow] = Iterator.empty
          override def hasNext: Boolean = {
            while (!cur.hasNext && entries.hasNext) {
              val sorted = entries.next().getValue.dequeueAll.reverse // best-first
              cur = sorted.zipWithIndex.iterator.map { case (r, i) =>
                rankRow.update(0, i + 1)
                proj(joined(r, rankRow)).copy(): InternalRow
              }
            }
            cur.hasNext
          }
          override def next(): InternalRow = cur.next()
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

object TopKPerGroup {

  /** Ensure the strategy is registered on this session (idempotent). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_.isInstanceOf[TopKPerGroupStrategy.type]))
      spark.experimental.extraStrategies = cur :+ TopKPerGroupStrategy
  }

  /** Top-k rows per group. `orderSpecs`: (column, descending?) — include
    * a unique tiebreaker for deterministic output. Appends `topk_rank`.
    */
  def apply(
      df: DataFrame, groupCols: Seq[String],
      orderSpecs: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    ensureRegistered(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String) = analyzed.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"column $name not in ${analyzed.output.map(_.name)}"))
    val g = groupCols.map(attr)
    val o = orderSpecs.map { case (c, desc) =>
      SortOrder(attr(c), if (desc) Descending else Ascending)
    }
    GraftShim.ofRows(spark, TopKPerGroupPlan(k, g, o, analyzed))
  }
}
