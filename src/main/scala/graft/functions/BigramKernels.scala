package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Kernels for the bigram stupid-backoff language model
  * ([[graft.ext.TextAnalysis.fitBigramModel]] — Brants et al. 2007,
  * "Large Language Models in Machine Translation").
  *
  * The model works over VOCABULARY-MAPPED tokens: every non-empty
  * whitespace token is replaced by itself when it is in the fitted
  * unigram vocabulary and by the empty-string OOV sentinel otherwise
  * ("" cannot collide with a real token — tokens are `\s+`-split and
  * non-empty by construction). Mapping bounds the bigram state space by
  * (V+1)² regardless of corpus size, which is what makes the fitted
  * model a driver-collectable reference object at 100 TB.
  */

/** All consecutive mapped-token bigrams of a text column, occurrence
  * order, NON-distinct (this feeds a `groupBy(bigram).count()`, unlike
  * [[WordNgrams]] whose distinct set feeds signature stages). Each
  * element is `"m1 m2"` — the single-space join is unambiguous because
  * tokens cannot contain whitespace. Empty tokens from leading
  * whitespace are skipped, matching the `filter(length(token) > 0)`
  * convention of every token-stream consumer in this engine. */
case class MappedBigrams(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"MappedBigrams requires a string input, got ${other.simpleString}")
    }

  @transient private lazy val ws = Pattern.compile("\\s+")
  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val raw = ws.split(input.asInstanceOf[UTF8String].toString, -1)
    // drop empties, map to vocab-or-OOV in one pass
    val mapped = new java.util.ArrayList[String](raw.length)
    var i = 0
    while (i < raw.length) {
      val t = raw(i)
      if (t.nonEmpty) mapped.add(if (vocabSet.contains(t)) t else "")
      i += 1
    }
    val n = mapped.size()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var j = 0
    while (j < n - 1) {
      out(j) = UTF8String.fromString(mapped.get(j) + " " + mapped.get(j + 1))
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("mappedBigrams", this, getClass.getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $ref.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): MappedBigrams =
    copy(child = newChild)
}

/** Per-document bigram stupid-backoff statistics: given the fitted
  * unigram table (token → log-prob, OOV mapped to `oovLogProb`), the
  * bigram table (`"m1 m2"` → ln(c(m1,m2)/cctx(m1))) and the backoff
  * log-penalty, emit `(sum_lp, n_tok, n_hit)`:
  *
  *  - position 0 scores under the unigram model;
  *  - position i ≥ 1 scores `ln(c/cctx)` when the mapped bigram is in
  *    the table (`n_hit` counts these), else
  *    `ln(backoff) + unigram(m_i)`.
  *
  * ONE kernel eval per row, both tables broadcast as reference-object
  * state: the corpus never explodes, joins, or shuffles to be scored —
  * the scale posture that lets a daily 100 TB increment be scored with
  * a persisted model and zero exchanges. */
case class BigramLogProbStats(
    child: Expression,
    vocab: Seq[(String, Double)],
    oovLogProb: Double,
    bigramLogProbs: Seq[(String, Double)],
    logBackoff: Double)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("sum_lp", DoubleType, nullable = false),
    StructField("n_tok", IntegerType, nullable = false),
    StructField("n_hit", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"BigramLogProbStats requires a string input, got ${other.simpleString}")
    }

  @transient private lazy val ws = Pattern.compile("\\s+")
  @transient private lazy val uniTable: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](vocab.size * 2)
    vocab.foreach { case (t, lp) => m.put(t, lp) }
    m
  }
  @transient private lazy val bigramTable: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](bigramLogProbs.size * 2)
    bigramLogProbs.foreach { case (bg, lp) => m.put(bg, lp) }
    m
  }

  private def uniLp(mapped: String): Double = {
    if (mapped.isEmpty) return oovLogProb
    val lp = uniTable.get(mapped)
    if (lp == null) oovLogProb else lp.doubleValue()
  }

  override protected def nullSafeEval(input: Any): Any = {
    val raw = ws.split(input.asInstanceOf[UTF8String].toString, -1)
    var sum = 0.0
    var nTok = 0
    var nHit = 0
    var prev: String = null
    var i = 0
    while (i < raw.length) {
      val t = raw(i)
      if (t.nonEmpty) {
        val m = if (uniTable.containsKey(t)) t else ""
        if (prev == null) {
          sum += uniLp(m) // first token: unigram score
        } else {
          val lp = bigramTable.get(prev + " " + m)
          if (lp != null) { nHit += 1; sum += lp.doubleValue() }
          else sum += logBackoff + uniLp(m)
        }
        prev = m
        nTok += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](sum, nTok, nHit))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("bigramLogProbStats", this, getClass.getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)" +
        s" $ref.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): BigramLogProbStats =
    copy(child = newChild)
}
