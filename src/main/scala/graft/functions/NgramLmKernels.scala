package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Kernels for the hashed n-gram stupid-backoff language model
  * ([[graft.ext.TextAnalysis.fitNgramModel]] — Brants et al. 2007 at its
  * production arity: counts for orders 1..n ≤ 5, no discounting, raw
  * count ratios with a fixed backoff penalty).
  *
  * Grams are keyed by a PORTABLE 56-bit hash — the first 14 hex digits
  * of md5 over the space-joined gram — the same engine-independent key
  * [[graft.ext.TextAnalysis.fingerprint]] uses, so a SQL oracle can
  * replay fit AND scoring value-for-value. Hashing (instead of storing
  * gram strings) is what bounds the shipped model: the per-order tables
  * are capped top-K count maps over 8-byte keys regardless of corpus
  * vocabulary. Collisions merge counts deterministically — identically
  * in every engine that replays the same hash.
  */
object NgramHashing {
  val ws: Pattern = Pattern.compile("\\s+")

  def keptTokens(input: Any): Array[String] = {
    val raw = ws.split(input.asInstanceOf[UTF8String].toString, -1)
    val out = new java.util.ArrayList[String](raw.length)
    var i = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) out.add(raw(i))
      i += 1
    }
    out.toArray(new Array[String](out.size()))
  }

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 7 md5 bytes as a non-negative long — the value of
    * `CAST('0x' || substr(md5(g), 1, 14) AS BIGINT)`. */
  def hash56(s: String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  /** Hash of tokens(from..to) space-joined (inclusive 0-based bounds). */
  def gramHash(toks: Array[String], from: Int, to: Int): Long = {
    val sb = new java.lang.StringBuilder
    var j = from
    while (j <= to) {
      if (j > from) sb.append(' ')
      sb.append(toks(j))
      j += 1
    }
    hash56(sb.toString)
  }
}

/** All order-1..n gram hashes of a text column as
  * `array<struct<o: int, h: bigint>>` — one entry per (position, order
  * that fits), occurrence order, NON-distinct: this feeds the fit-time
  * `groupBy(o, h).count()`. One kernel eval per row — the corpus-sized
  * fit pass is a single explode of (int, long) pairs, never gram
  * strings. */
case class NgramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1 && n <= 8, s"n must be in [1, 8], got $n")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("o", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"NgramHashes requires a string input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val toks = NgramHashing.keptTokens(input)
    val out = new java.util.ArrayList[Any](toks.length * n)
    var i = 0
    while (i < toks.length) {
      var o = 1
      val maxO = math.min(n, i + 1)
      while (o <= maxO) {
        out.add(new GenericInternalRow(
          Array[Any](o, NgramHashing.gramHash(toks, i - o + 1, i))))
        o += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("ngramHashes", this, getClass.getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $ref.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}

/** Per-document hashed stupid-backoff statistics under fitted per-order
  * count tables: emits `(sum_lp, n_tok, n_top)` where position i
  * (0-based, kept tokens) scores at `maxo = min(n, i+1)`:
  *
  *  - order o ≥ 2 "hits" when BOTH the order-o gram hash and its
  *    order-(o−1) context hash (the gram ending one position earlier)
  *    are in their capped tables; the score is `ln(c_o / c_ctx)`;
  *  - each failed level adds one `ln(backoff)` and drops to o−1;
  *  - order 1 always terminates with the add-α hashed unigram
  *    `ln((c₁ + α) / (N + α·(B₁+1)))`, c₁ = 0 when absent/capped away.
  *
  * `n_top` counts positions with maxo ≥ 2 that hit at maxo directly (no
  * backoff step). ONE kernel eval per row, tables broadcast as
  * reference-object state — scoring never explodes, joins, or shuffles
  * at any corpus size. */
case class NgramBackoffLogProbStats(
    child: Expression,
    n: Int,
    tables: Seq[Seq[(Long, Long)]],
    totalTokens: Long,
    b1: Int,
    alpha: Double,
    backoff: Double)
    extends UnaryExpression {
  require(tables.length == n,
    s"need one table per order 1..$n, got ${tables.length}")

  override def dataType: DataType = StructType(Seq(
    StructField("sum_lp", DoubleType, nullable = false),
    StructField("n_tok", IntegerType, nullable = false),
    StructField("n_top", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"NgramBackoffLogProbStats requires a string input, got " +
          other.simpleString)
    }

  @transient private lazy val maps: Array[java.util.HashMap[java.lang.Long, java.lang.Long]] =
    tables.map { t =>
      val m = new java.util.HashMap[java.lang.Long, java.lang.Long](t.size * 2)
      t.foreach { case (h, c) => m.put(h, c) }
      m
    }.toArray
  @transient private lazy val logBackoff = math.log(backoff)
  @transient private lazy val uniDenom = totalTokens + alpha * (b1 + 1)

  override protected def nullSafeEval(input: Any): Any = {
    val toks = NgramHashing.keptTokens(input)
    var sum = 0.0
    var nTop = 0
    var i = 0
    while (i < toks.length) {
      val maxO = math.min(n, i + 1)
      var o = maxO
      var done = false
      while (!done && o >= 2) {
        val cg = maps(o - 1).get(
          java.lang.Long.valueOf(NgramHashing.gramHash(toks, i - o + 1, i)))
        val cc =
          if (cg == null) null
          else maps(o - 2).get(
            java.lang.Long.valueOf(NgramHashing.gramHash(toks, i - o + 1, i - 1)))
        if (cg != null && cc != null) {
          // (maxO − o) failed levels each contribute one backoff penalty;
          // multiply, don't accumulate — the oracle's (maxo−o)·ln(b) form
          sum += (maxO - o) * logBackoff +
            math.log(cg.doubleValue() / cc.doubleValue())
          if (o == maxO) nTop += 1
          done = true
        } else o -= 1
      }
      if (!done) {
        val c1 = maps(0).get(
          java.lang.Long.valueOf(NgramHashing.hash56(toks(i))))
        val c = if (c1 == null) 0.0 else c1.doubleValue()
        sum += (maxO - 1) * logBackoff + math.log((c + alpha) / uniDenom)
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](sum, toks.length, nTop))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("ngramBackoff", this, getClass.getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)" +
        s" $ref.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): NgramBackoffLogProbStats =
    copy(child = newChild)
}
