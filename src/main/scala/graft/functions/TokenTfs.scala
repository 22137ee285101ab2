package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document term frequencies in ONE pass:
  * `struct<dl: bigint, tfs: array<struct<term: string, tf: bigint>>>`
  * where `dl` is the kept-token count (java `\s+` split, empty tokens
  * skipped — the same tokenization as [[graft.ext.TextAnalysis.tokens]]
  * followed by the `length > 0` filter) and `tfs` has one entry per
  * DISTINCT kept token with its within-document count, term-sorted.
  *
  * This is the kernel behind [[graft.ext.Retrieval]]'s posting frame:
  * term frequency and document length are PER-DOCUMENT statistics, so
  * computing them by `explode → groupBy(doc, term)` (+ a second
  * `groupBy(doc)` and a doc-grain join for `dl`) shuffles a corpus-sized
  * posting stream twice for what one map-side eval can produce — at
  * 100 TB that is the difference between a map stage and two full
  * exchanges of every (doc, term) pair. Values are identical to the
  * explode/groupBy form (PairEquivalenceSpec-style pin in
  * RetrievalSpec); term order inside a document is sorted for
  * determinism (consumers aggregate, so order never changes results).
  */
case class TokenTfs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("dl", LongType, nullable = false),
    StructField("tfs", ArrayType(StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))),
      containsNull = false), nullable = false)))
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"TokenTfs requires a string input, got ${other.simpleString}")
    }

  @transient private lazy val ws = Pattern.compile("\\s+")

  override protected def nullSafeEval(input: Any): Any = {
    val toks = ws.split(input.asInstanceOf[UTF8String].toString, -1)
    // value type is java.lang.Long (not scala.Long) so the absent-key
    // null is a real reference, matching MisraGriesAggregate's map
    val counts = new java.util.TreeMap[String, java.lang.Long]()
    var dl = 0L
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        dl += 1L
        counts.put(t, counts.getOrDefault(t, 0L) + 1L)
      }
      i += 1
    }
    val entries = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      entries(j) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue))
      j += 1
    }
    new GenericInternalRow(Array[Any](dl, new GenericArrayData(entries)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("tokenTfs", this, getClass.getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)" +
        s" $ref.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): TokenTfs =
    copy(child = newChild)
}
