package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, GenerateOrdering}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BlockingOperatorWithCodegen, CodegenSupport, SparkPlan, SparkStrategy, UnaryExecNode}
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
  * Both phases participate in WholE-stage codegen as BLOCKING operators
  * (the `SortExec` pattern): the child pipeline's generated loop feeds
  * [[TopKHeaps.insert]] directly — no per-row iterator bridge on the scan
  * side, the hottest path of every ANN tail — and the drain loop hands the
  * surviving g·k rows to the parent pipeline. Falls back to the iterator
  * `doExecute` under codegen-unsupported parents or compile fallback, with
  * identical results ([[TopKHeaps]] is the single implementation of both).
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

/** Per-partition bounded-heap state — the SINGLE implementation backing
  * both execution paths of [[TopKPerGroupExec]] (iterator `doExecute` and
  * whole-stage codegen), so the paths are result-identical by
  * construction. Created per partition (via [[TopKHeapsFactory]]); the
  * group projection and the `GenerateOrdering` comparator compile once per
  * JVM (codegen cache) and bind per instance. */
final class TopKHeaps(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    childOutput: Seq[Attribute],
    k: Int,
    rankAttr: Option[Attribute]) {
  private val groupProj = UnsafeProjection.create(groupExprs, childOutput)
  // codegen'd total-order comparator over the sort expressions
  private val ord = GenerateOrdering.generate(order, childOutput)
  // per-group bounded heap: java PQ is a min-heap under the REVERSED
  // ordering, so its head is the WORST retained row — evicted when a
  // better row arrives
  private val worstFirst = new java.util.Comparator[InternalRow] {
    override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
  }
  private val heaps =
    new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()

  def insert(row: InternalRow): Unit = {
    val key = groupProj(row) // reused buffer: copy only on first insert
    var heap = heaps.get(key)
    if (heap == null) {
      heap = new java.util.PriorityQueue[InternalRow](k, worstFirst)
      heaps.put(key.copy(), heap)
    }
    if (heap.size() < k) {
      heap.add(row.copy())
    } else if (ord.compare(row, heap.peek()) < 0) {
      heap.poll()
      heap.add(row.copy())
    }
  }

  def drain(): Iterator[InternalRow] = {
    import scala.jdk.CollectionConverters._
    rankAttr match {
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
  }

  /** Java-iterator view of [[drain]] for generated code. */
  def drainJava(): java.util.Iterator[InternalRow] = {
    import scala.jdk.CollectionConverters._
    drain().asJava
  }
}

/** Serializable recipe for [[TopKHeaps]] — referenced from generated code
  * (via `addReferenceObj`) and from the `doExecute` closure, so neither
  * path captures the plan tree itself. */
case class TopKHeapsFactory(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    childOutput: Seq[Attribute],
    k: Int,
    rankAttr: Option[Attribute]) {
  def create(): TopKHeaps =
    new TopKHeaps(groupExprs, order, childOutput, k, rankAttr)
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean,
    rankAttr: Option[Attribute] = None)
  extends UnaryExecNode with BlockingOperatorWithCodegen {

  override def output: Seq[Attribute] = child.output ++ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  private def heapsFactory: TopKHeapsFactory =
    TopKHeapsFactory(groupExprs, order, child.output, k,
      if (partial) None else rankAttr)

  override protected def doExecute(): RDD[InternalRow] = {
    val factory = heapsFactory
    child.execute().mapPartitions({ it =>
      val h = factory.create()
      while (it.hasNext) h.insert(it.next())
      h.drain()
    }, preservesPartitioning = true)
  }

  // ——— whole-stage codegen (blocking-operator pattern, as SortExec) ———
  //
  // consume side: the child pipeline's generated row loop calls
  // heaps.insert(row) directly — one monomorphic call per row instead of
  // the WSCG boundary's buffered-iterator bridge (append to queue +
  // hasNext/next virtual calls per row).
  // produce side: on first call, drive the child's produce loop to
  // exhaustion (blocking — needStopCheck is false below us), then drain
  // the surviving g·k rows to the parent with the standard
  // one-row-per-processNext shouldStop protocol (the rank projection
  // reuses its buffer, as SortExec's sorted iterator reuses its row).

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    child.asInstanceOf[CodegenSupport].inputRDDs()

  // doConsume uses ONLY the built row (heaps.insert), never individual
  // input columns — declare so, exactly as SortExec does. Without this,
  // consume() sees groupExprs/order attributes in `references` and ALSO
  // pre-evaluates those child output vars; when the child Project's
  // result vars share subexpression-elimination state, the shared block
  // is then spliced twice into one scope — janino "Redefinition of local
  // variable project_isNull_N", and the whole stage (the hottest insert
  // loop) silently falls back to interpreted (observed on
  // pipeline_curate's host-cap stage; latent since round 12).
  override def usedInputs: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet.empty

  // generated-code name of the per-partition TopKHeaps instance; assigned
  // in doProduce (which codegen always calls before doConsume)
  private var heapsTerm: String = _

  override def doProduce(ctx: CodegenContext): String = {
    val needInit = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN,
      "topkNeedInit", v => s"$v = true;")
    val factory = ctx.addReferenceObj("topkFactory", heapsFactory,
      classOf[TopKHeapsFactory].getName)
    heapsTerm = ctx.addMutableState(classOf[TopKHeaps].getName, "topkHeaps",
      forceInline = true)
    val drained = ctx.addMutableState("java.util.Iterator<InternalRow>",
      "topkDrained", forceInline = true)
    val addInputName = ctx.freshName("addTopKInput")
    val addInput = ctx.addNewFunction(addInputName,
      s"""
         |private void $addInputName() throws java.io.IOException {
         |  ${child.asInstanceOf[CodegenSupport].produce(ctx, this)}
         |}
       """.stripMargin)
    val outputRow = ctx.freshName("topkRow")
    s"""
       |if ($needInit) {
       |  $heapsTerm = $factory.create();
       |  $addInput();
       |  $drained = $heapsTerm.drainJava();
       |  $needInit = false;
       |}
       |while ($limitNotReachedCond $drained.hasNext()) {
       |  InternalRow $outputRow = (InternalRow) $drained.next();
       |  ${consume(ctx, null, outputRow)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override def doConsume(ctx: CodegenContext, input: Seq[ExprCode], row: ExprCode): String =
    s"""
       |${row.code}
       |$heapsTerm.insert((InternalRow) ${row.value});
     """.stripMargin

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
