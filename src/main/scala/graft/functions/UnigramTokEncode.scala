package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi unigram-LM encoding ([[graft.ext.UnigramTok]], Kudo 2018):
  * document-order best-segmentation pieces of every non-empty
  * whitespace word under the fitted piece log-probabilities.
  *
  * Per word: dp(i) = best log-prob of a segmentation of the prefix
  * w[0,i); transitions try pieces w[j,i) for j in
  * [i − maxPieceLen, i) — iterated ASCENDING j with a strictly-greater
  * acceptance, so an exact score tie keeps the LONGER piece ending at
  * i (fixed, engine-independent). A position no piece reaches falls
  * back to the single character at `unkLogProb` — every word encodes.
  *
  * ONE kernel eval per row, piece table broadcast as reference-object
  * state: map-only, zero shuffle at any corpus size (the
  * [[BpeEncode]] deployment shape). */
case class UnigramTokEncode(
    child: Expression,
    pieces: Seq[(String, Double)],
    maxPieceLen: Int,
    unkLogProb: Double)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"UnigramTokEncode requires a string input, got ${other.simpleString}")
    }

  @transient private lazy val ws = Pattern.compile("\\s+")
  @transient private lazy val table: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
    pieces.foreach { case (p, lp) => m.put(p, lp) }
    m
  }

  private def encodeWord(w: String, out: java.util.ArrayList[Any]): Unit = {
    val n = w.length
    val dp = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1) // j of the winning piece w[j, i)
    dp(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (dp(j) != Double.NegativeInfinity) {
          val lp = table.get(w.substring(j, i))
          if (lp != null && dp(j) + lp.doubleValue() > dp(i)) {
            dp(i) = dp(j) + lp.doubleValue()
            back(i) = j
          }
        }
        j += 1
      }
      if (back(i) < 0) {
        // no piece reaches i: the single character at the unk penalty.
        // dp(i-1) is finite by induction (same fallback applied there).
        dp(i) = dp(i - 1) + unkLogProb
        back(i) = i - 1
      }
      i += 1
    }
    // reconstruct in order
    val cuts = new java.util.ArrayDeque[Int]()
    var pos = n
    while (pos > 0) { cuts.push(pos); pos = back(pos) }
    var start = 0
    val it = cuts.iterator()
    while (it.hasNext) {
      val end = it.next()
      out.add(UTF8String.fromString(w.substring(start, end)))
      start = end
    }
  }

  override protected def nullSafeEval(input: Any): Any = {
    val raw = ws.split(input.asInstanceOf[UTF8String].toString, -1)
    val out = new java.util.ArrayList[Any](raw.length * 2)
    var i = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) encodeWord(raw(i), out)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("unigramTokEncode", this, getClass.getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $ref.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): UnigramTokEncode =
    copy(child = newChild)
}
