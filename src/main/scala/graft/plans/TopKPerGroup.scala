package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.functions.col

/** Top-k rows per group as a FIRST-CLASS operator — custom `LogicalPlan` +
  * `SparkStrategy` + `SparkPlan` (builder-prompt custom-operator case (c)):
  * the declarative form (`row_number().over(partitionBy(g).orderBy(o))
  * <= k`) must fully SORT every group before it can rank, so at corpus
  * scale the window shuffles and sorts all N rows to keep g·k of them.
  * This operator keeps a bounded heap of k rows per group instead:
  *
  *  - partial phase (before the shuffle): each input partition reduces to
  *    ≤ k rows per group it has seen — map-side combine for top-k;
  *  - final phase (after a ClusteredDistribution shuffle on the group
  *    key): the same heap merge over the ≤ k·partitions survivors.
  *
  * Memory is O(groups-per-partition · k) and nothing is ever sorted
  * except the k-element heaps. The planner inserts the exchange from the
  * declared distribution requirement; both phases run the codegen'd
  * `GenerateOrdering` comparator over UnsafeRows.
  *
  * Output set is exactly the window-filter form's when the ordering is
  * total (proven in PlansSpec); row order within a group is unspecified,
  * like any aggregate.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    rankAttr: Option[Attribute] = None) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  // the rank attribute (when requested) is CARRIED in the node, not minted
  // in `output` — logical plans are copied freely during analysis, and a
  // fresh exprId per copy would orphan parent references (same reason
  // Generate stores generatorOutput)
  override def output: Seq[Attribute] = child.output ++ rankAttr
  // declare the minted attribute as produced HERE, or CheckAnalysis counts
  // it as an input the child fails to supply (MISSING_ATTRIBUTES)
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Plans [[TopKPerGroup]] as partial + final [[TopKPerGroupExec]] around
  * the distribution-mandated exchange. Register per session via
  * `spark.experimental.extraStrategies` (see [[graft.ops.TopK]]). */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child, rankAttr) =>
      // normalize FP group keys (-0.0 → 0.0, canonical NaN) the way the
      // optimizer does for Aggregate/Window keys — it does not know this
      // node, and raw UnsafeRow byte-equality would otherwise split
      // -0.0/0.0 into distinct groups (group keys are scalars here; a
      // nested-FP struct key would additionally need recursive handling)
      val ng = g.map(e => e.dataType match {
        case org.apache.spark.sql.types.FloatType |
             org.apache.spark.sql.types.DoubleType =>
          org.apache.spark.sql.GraftColumnBridge.normalizeFloats(e)
        case _ => e
      })
      // the partial phase cannot rank (a row's final rank is unknowable
      // before the merge), so only the final phase appends the column
      val partial = TopKPerGroupExec(ng, o, k, planLater(child), partial = true)
      TopKPerGroupExec(ng, o, k, partial, partial = false, rankAttr) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean,
    rankAttr: Option[Attribute] = None) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val groupE = groupExprs
    val orderE = order
    val childOutput = child.output
    val limit = k
    val rank = if (partial) None else rankAttr
    child.execute().mapPartitions({ it =>
      val groupProj = UnsafeProjection.create(groupE, childOutput)
      // codegen'd total-order comparator over the sort expressions
      val ord = GenerateOrdering.generate(orderE, childOutput)
      // per-group bounded heap: java PQ is a min-heap under the REVERSED
      // ordering, so its head is the WORST retained row — evicted when a
      // better row arrives
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (it.hasNext) {
        val row = it.next()
        val key = groupProj(row) // reused buffer: copy only on first insert
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < limit) {
          heap.add(row.copy())
        } else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      rank match {
        case None =>
          heaps.values().asScala.iterator.flatMap(_.iterator().asScala)
        case Some(attr) =>
          // rank-emitting final phase: drain each heap worst-first into an
          // array filled backwards (best = rank 1) and append the rank —
          // no Window node, no sort beyond the k-element heap drain
          val proj = UnsafeProjection.create(
            childOutput :+ attr, childOutput :+ attr)
          val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow()
          val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
          heaps.values().asScala.iterator.flatMap { heap =>
            val n = heap.size()
            val arr = new Array[InternalRow](n)
            var i = n - 1
            while (i >= 0) { arr(i) = heap.poll(); i -= 1 }
            arr.iterator.zipWithIndex.map { case (r, idx) =>
              rankRow.update(0, idx + 1)
              proj(joined(r, rankRow))
            }
          }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
