package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of array elements that are members of a small constant string set
  * (duplicates counted) — the native-codegen replacement for
  * `size(filter(toks, t => t.isin(values)))`: Catalyst evaluates HOF
  * lambdas per element through the interpreter, so the marker-scoring
  * filters were the whole cost of the language-ID and stopword queries
  * (5 langs × |tokens| interpreted calls per document). Here the loop is
  * emitted as primitive Java: one pass over the token array, a linear probe
  * over the (≤ a handful of) reference `UTF8String`s, no boxing, no lambda
  * dispatch. Null elements never match; a null array yields null, matching
  * `size(filter(null, …))` under `legacy.sizeOfNull=false`.
  */
case class CountInSet(child: Expression, values: Seq[String])
    extends UnaryExpression {

  require(values.nonEmpty, "CountInSet needs at least one value")

  private lazy val utf8Values: Array[UTF8String] =
    values.map(UTF8String.fromString).toArray

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"CountInSet requires an array<string> input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var cnt = 0
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        var i = 0
        var found = false
        while (i < utf8Values.length && !found) {
          if (utf8Values(i).equals(s)) { cnt += 1; found = true }
          i += 1
        }
      }
      j += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("countInSetValues", utf8Values,
        "org.apache.spark.unsafe.types.UTF8String[]")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $cnt = 0;
         |final int $n = $c.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$c.isNullAt($j)) {
         |    final org.apache.spark.unsafe.types.UTF8String $s = $c.getUTF8String($j);
         |    for (int $i = 0; $i < $ref.length; $i++) {
         |      if ($ref[$i].equals($s)) { $cnt++; break; }
         |    }
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CountInSet =
    copy(child = newChild)
}
