package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared feature extraction for the DSIR family (`graft.ext.Dsir` —
  * Xie et al. 2023, "Data Selection for Language Models via Importance
  * Resampling"): every word n-gram of order 1..`maxN` over the NON-EMPTY
  * whitespace tokens, hashed into `buckets` by the cross-engine-portable
  * md5-prefix bucket (first 8 md5 hex digits as an unsigned 32-bit int,
  * mod `buckets` — the [[Md5PrefixLong]] idiom, replayable in any engine
  * with md5). MULTISET semantics: every occurrence counts — DSIR's
  * features are bag-of-hashed-ngram COUNTS, unlike the set-semantics
  * [[WordNgrams]] the dedup family uses.
  */
private[functions] trait HashedGramBase { self: UnaryExpression =>
  def maxN: Int
  def buckets: Int

  @transient protected lazy val ws = Pattern.compile("\\s+")

  /** Walk every order-1..maxN gram of the non-empty tokens of `text`,
    * calling `f(bucket)` per occurrence. Returns the gram count. */
  protected final def foreachBucket(text: String)(f: Int => Unit): Int = {
    val raw = ws.split(text, -1)
    var nTok = 0
    var i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) nTok += 1; i += 1 }
    val toks = new Array[String](nTok)
    var j = 0
    i = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) { toks(j) = raw(i); j += 1 }
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder()
    var nFeat = 0
    var order = 1
    while (order <= maxN) {
      var s = 0
      val last = nTok - order
      while (s <= last) {
        sb.setLength(0)
        var k = 0
        while (k < order) {
          if (k > 0) sb.append(' ')
          sb.append(toks(s + k))
          k += 1
        }
        md.reset()
        val digest = md.digest(
          sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 8 hex digits = first 4 digest bytes as an unsigned int —
        // identical to conv(substr(md5(gram), 1, 8), 16, 10) % buckets
        val v = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
          ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
        f((v % buckets).toInt)
        nFeat += 1
        s += 1
      }
      order += 1
    }
    nFeat
  }

  protected final def checkStringInput(name: String): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires a string input, got ${other.simpleString}")
    }
}

/** The FIT half of DSIR: the multiset of hashed-n-gram bucket ids of a
  * document, one array element per gram occurrence. Model fitting
  * explodes this (8 bytes/gram — comparable to the text itself) into the
  * partial-aggregated `groupBy(bucket)` count, so the exchange carries at
  * most `buckets` rows per task regardless of corpus size. */
case class HashedGramBuckets(child: Expression, maxN: Int, buckets: Int)
    extends UnaryExpression with HashedGramBase {
  require(maxN >= 1 && maxN <= 4, s"maxN must be in 1..4, got $maxN")
  require(buckets >= 2, s"buckets must be >= 2, got $buckets")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    checkStringInput("HashedGramBuckets")

  override protected def nullSafeEval(input: Any): Any = {
    val buf = new scala.collection.mutable.ArrayBuffer[Any]()
    foreachBucket(input.asInstanceOf[UTF8String].toString)(b =>
      buf += java.lang.Integer.valueOf(b))
    new GenericArrayData(buf.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("hashedGramBuckets", this, getClass.getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $ref.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): HashedGramBuckets =
    copy(child = newChild)
}

/** The SCORE half of DSIR: Σ `table(bucket(gram))` over every gram
  * occurrence — with `table` = the per-bucket log probability RATIO of a
  * target model over the raw model, the sum is the document's log
  * importance weight λ(x). ONE kernel eval per row, the `buckets`-sized
  * table a broadcast reference object: no explode, no join, no shuffle at
  * any corpus size (the unnest+broadcast-join+re-agg form this replaces
  * shuffles the whole gram stream). Returns `(sum double, n_feat int)`;
  * a gram-less document scores (0.0, 0). */
case class HashedGramLogSum(
    child: Expression,
    maxN: Int,
    buckets: Int,
    table: Seq[Double])
    extends UnaryExpression with HashedGramBase {
  require(maxN >= 1 && maxN <= 4, s"maxN must be in 1..4, got $maxN")
  require(buckets >= 2, s"buckets must be >= 2, got $buckets")
  require(table.length == buckets,
    s"table size ${table.length} != buckets $buckets")

  @transient private lazy val arr: Array[Double] = table.toArray

  override def dataType: DataType = StructType(Seq(
    StructField("sum", DoubleType, nullable = false),
    StructField("n_feat", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    checkStringInput("HashedGramLogSum")

  override protected def nullSafeEval(input: Any): Any = {
    var sum = 0.0
    val n = foreachBucket(input.asInstanceOf[UTF8String].toString)(b =>
      sum += arr(b))
    new GenericInternalRow(Array[Any](sum, n))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("hashedGramLogSum", this, getClass.getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)" +
        s" $ref.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): HashedGramLogSum =
    copy(child = newChild)
}
