package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Count of array<long> elements that are members of a constant long set
  * (duplicates counted) — the per-row membership kernel behind the
  * streaming contamination gate: a document's gram hashes are one array
  * in one row, so "how many grams hit the benchmark set" is a MAP-ONLY
  * expression, no explode, no join, no aggregation state. The set ships
  * as a sorted `long[]` reference object (analysis-cheap — see the
  * `typedLit` cost note in ROUND_NOTES) probed by binary search: |set| of
  * ~10⁵–10⁷ benchmark grams costs ~17–23 compares per gram, allocation
  * free, identical in the interpreted and generated paths. Null elements
  * never match; a null array yields null.
  */
case class CountInLongSet(child: Expression, values: Array[Long])
    extends UnaryExpression {

  require(values.nonEmpty, "CountInLongSet needs at least one value")

  // sorted, deduplicated probe table (binary search requires sorted; dedup
  // keeps the "is member" semantics under duplicate inputs)
  private lazy val sorted: Array[Long] = {
    val a = values.clone()
    java.util.Arrays.sort(a)
    var n = 0
    var i = 0
    while (i < a.length) {
      if (n == 0 || a(n - 1) != a(i)) { a(n) = a(i); n += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(a, n)
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"CountInLongSet requires an array<bigint> input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var cnt = 0
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j) &&
          java.util.Arrays.binarySearch(sorted, arr.getLong(j)) >= 0) cnt += 1
      j += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("countInLongSetValues", sorted, "long[]")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $cnt = 0;
         |final int $n = $c.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$c.isNullAt($j) &&
         |      java.util.Arrays.binarySearch($ref, $c.getLong($j)) >= 0) {
         |    $cnt++;
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CountInLongSet =
    copy(child = newChild)
}
