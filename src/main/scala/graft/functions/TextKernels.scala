package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text-hashing kernels for the dedup hot paths.
  *
  * Catalyst's higher-order functions (`transform`, `zip_with`, `filter`)
  * evaluate their lambdas through the interpreter — measured as the
  * dominant cost of every signature stage (ROUND_NOTES "hard-won facts").
  * These kernels emit the token/gram/hash loops as a single eval call per
  * row instead, while producing BIT-IDENTICAL values to the expression
  * trees they replace, so every existing oracle stays green:
  *
  *  - [[WordNgrams]]  ≡ the zip_with/slice/concat_ws/array_distinct tree
  *    (distinct word n-grams, first-occurrence order, java `\s+` split)
  *  - [[XxHash64Array]] ≡ `transform(arr, s => xxhash64(s))` (same XXH64,
  *    same seed)
  *  - [[Md5Prefix]]   ≡ `transform(arr, s => conv(substring(md5(s), 1, d),
  *    16, 10))` for d ≤ 15 — the cross-engine-portable hash the DuckDB
  *    oracles recompute (md5 of UTF-8 bytes, first d hex digits as a long)
  *
  * They are scalar one-in/one-out expressions (no shuffle, no state); the
  * loop body is plain JVM code invoked once per row via the interpreted
  * eval path, which profiling shows is ~an order of magnitude faster than
  * per-element interpreted lambda dispatch.
  */
private[functions] object StringArrayCheck {
  def check(name: String, child: Expression): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires an array<string> input, got ${other.simpleString}")
    }
}

/** Distinct word n-grams of a text column, first-occurrence order —
  * byte-identical to `array_distinct(zip_with-join of n split slices)`. */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"WordNgrams requires a string input, got ${other.simpleString}")
    }

  @transient private lazy val ws = Pattern.compile("\\s+")

  override protected def nullSafeEval(input: Any): Any = {
    // Pattern.split matches Spark's split(text, "\\s+") exactly, including
    // the leading empty token for leading whitespace
    val toks = ws.split(input.asInstanceOf[UTF8String].toString, -1)
    val out = toks.length - (n - 1)
    if (out <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < out) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val arr = new Array[Any](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("wordNgrams", this, getClass.getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $ref.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

/** `transform(arr, s => xxhash64(s))` as one native pass (same XXH64 core
  * and default seed as the builtin, so values are interchangeable). */
case class XxHash64Array(child: Expression, seed: Long = 42L)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    StringArrayCheck.check("XxHash64Array", child)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      // null elements hash like the builtin's null-skip (seed carries)
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        out(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
      } else {
        out(i) = seed
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("xxhash64Array", this, getClass.getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $ref.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): XxHash64Array =
    copy(child = newChild)
}

/** First `hexDigits` hex digits of md5 as a long, per array element —
  * value-identical to `conv(substring(md5(s), 1, d), 16, 10)` (d ≤ 15).
  * `skipEmpty` drops zero-length elements first, matching the portable
  * SimHash's `filter(toks, len > 0)` pre-step. */
case class Md5Prefix(child: Expression, hexDigits: Int, skipEmpty: Boolean = false)
    extends UnaryExpression {
  require(hexDigits >= 1 && hexDigits <= 15,
    s"hexDigits must be in [1,15], got $hexDigits")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    StringArrayCheck.check("Md5Prefix", child)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = Md5Prefix.digest.get()
    val m = arr.numElements()
    val out = new java.util.ArrayList[Any](m)
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        if (!(skipEmpty && s.numBytes == 0)) {
          md.reset()
          val digest = md.digest(s.getBytes)
          // value of the first hexDigits hex chars: 4 bits per digit
          var v = 0L
          var d = 0
          while (d < hexDigits) {
            val b = digest(d / 2) & 0xff
            val nibble = if (d % 2 == 0) b >>> 4 else b & 0xf
            v = (v << 4) | nibble
            d += 1
          }
          out.add(v)
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("md5Prefix", this, getClass.getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $ref.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix =
    copy(child = newChild)
}

object Md5Prefix {
  /** MessageDigest is stateful and not thread-safe; one per thread. */
  private[functions] val digest = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))
}

/** Count of positions where two long arrays agree — the MinHash
  * signature-agreement step as one native node, value-identical to
  * `size(filter(zip_with(a, b, (x, y) => x === y), m => m))` for
  * equal-length non-null arrays (the only shape signatures take); the
  * HOF form evaluates both lambdas interpreted per element and allocates
  * two intermediate arrays per pair. NULL on length mismatch (zip_with
  * padding territory — unreachable for fixed-k signatures, null is the
  * conservative answer). */
case class LongArrayMatchCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"LongArrayMatchCount requires (array<long>, array<long>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var c = 0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      if (x.getLong(i) == y.getLong(i)) c += 1
      i += 1
    }
    java.lang.Integer.valueOf(c)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("longArrayMatchCount", this, getClass.getName)
      val r = ctx.freshName("r")
      s"""
         |Object $r = $ref.nullSafeEval($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Integer) $r).intValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayMatchCount =
    copy(left = newLeft, right = newRight)
}

/** One-pass within-document n-gram repetition statistics — the signals
  * behind the published repetition filters for training corpora (Gopher /
  * MassiveText rules: duplicate-n-gram fraction, top-n-gram fraction).
  * Tokenizes with the same java `\s+` split as [[WordNgrams]] (limit −1:
  * leading-whitespace empty token kept), counts every n-gram WITH
  * multiplicity in a local hash map, and returns
  * `struct(n_tokens, n_grams, n_distinct, top_count)` — all ints. The
  * whole computation is one scalar eval per row: zero shuffles at any
  * corpus size, and the exploded-grams `groupBy(doc, gram)` tree it
  * replaces shuffles ~|tokens| rows per document instead.
  * Documents with fewer than n tokens report (n_tokens, 0, 0, 0).
  */
case class NgramRepetitionStats(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_grams", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_count", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"NgramRepetitionStats requires a string input, got ${other.simpleString}")
    }

  @transient private lazy val ws = Pattern.compile("\\s+")

  override protected def nullSafeEval(input: Any): Any = {
    val toks = ws.split(input.asInstanceOf[UTF8String].toString, -1)
    val out = toks.length - (n - 1)
    if (out <= 0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](toks.length, 0, 0, 0))
    val counts = new java.util.HashMap[String, Int](out * 2)
    val sb = new java.lang.StringBuilder()
    var top = 0
    var i = 0
    while (i < out) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      val c = counts.merge(sb.toString, 1, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](toks.length, out, counts.size(), top))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("ngramRepetitionStats", this, getClass.getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)" +
        s" $ref.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): NgramRepetitionStats =
    copy(child = newChild)
}

/** Scalar twin of [[Md5Prefix]]: first `hexDigits` hex digits of md5 of a
  * single string as a long — value-identical to
  * `conv(substring(md5(s), 1, d), 16, 10)` (d ≤ 15). This is the portable
  * sampling gate's hash ([[graft.ops.Sampling]]): the expression-tree form
  * materializes the 32-char hex string and re-parses a substring of it per
  * row; the kernel reads the digit value straight off the digest bytes. */
case class Md5PrefixLong(child: Expression, hexDigits: Int)
    extends UnaryExpression {
  require(hexDigits >= 1 && hexDigits <= 15,
    s"hexDigits must be in [1,15], got $hexDigits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"Md5PrefixLong requires a string input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val md = Md5Prefix.digest.get()
    md.reset()
    val digest = md.digest(input.asInstanceOf[UTF8String].getBytes)
    var v = 0L
    var d = 0
    while (d < hexDigits) {
      val b = digest(d / 2) & 0xff
      val nibble = if (d % 2 == 0) b >>> 4 else b & 0xf
      v = (v << 4) | nibble
      d += 1
    }
    java.lang.Long.valueOf(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("md5PrefixLong", this, getClass.getName)
      s"${ev.value} = (Long) $ref.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixLong =
    copy(child = newChild)
}

/** Whitespace-token count: number of maximal non-whitespace runs — value-
  * identical to `regexp_count(text, '\\S+')`, whose java.util.regex Matcher
  * loop was the dominant CPU of every token-accounting pass (mixtures,
  * weighted sampling, packing budgets). Whitespace is java regex `\s` =
  * `[ \t\n\x0B\f\r]` — ASCII-only, so the kernel scans UTF-8 BYTES
  * directly: every byte of a multi-byte codepoint has the high bit set and
  * can never read as whitespace. One branch per byte, codegen-inline, no
  * allocation. Null text yields null (the regexp_count convention). */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"TokenCount requires a string input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var cnt = 0
    var inTok = false
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      val ws = b == 0x20 || (b >= 0x09 && b <= 0x0d)
      if (!ws && !inTok) cnt += 1
      inTok = !ws
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val ws = ctx.freshName("ws")
      val inTok = ctx.freshName("inTok")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $cnt = 0;
         |boolean $inTok = false;
         |final int $n = $c.numBytes();
         |for (int $i = 0; $i < $n; $i++) {
         |  final byte $b = $c.getByte($i);
         |  final boolean $ws = $b == 0x20 || ($b >= 0x09 && $b <= 0x0d);
         |  if (!$ws && !$inTok) $cnt++;
         |  $inTok = !$ws;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

/** Per-document term frequencies RESTRICTED to a small constant
  * vocabulary — the kernel behind [[graft.ext.Retrieval.tfidfForVocab]].
  * Returns `struct<has_tok: boolean, dl: bigint, tfs: array<bigint>>`
  * where `has_tok` is true iff the document has ≥1 kept token (the
  * collection-statistics membership test), `dl` is the kept-token count
  * (the BM25 document length — ≡ [[TokenTfs]]'s `dl`, so
  * [[graft.ext.Retrieval.bm25TopK]]'s narrow arm needs no full posting
  * stream) and `tfs(i)` counts exact occurrences of `vocab(i)`
  * among kept tokens (java `\s+` split, empties skipped — the
  * [[TokenTfs]] tokenization). For a handful of query terms, building the
  * FULL term→tf map ([[TokenTfs]]) and exploding it materializes a
  * corpus×distinct-terms posting stream only to discard everything
  * outside the vocabulary; this kernel's output is vocab-sized per
  * document no matter how large the corpus row is. Byte-level scan:
  * whitespace is java regex `\s` (ASCII), so multi-byte codepoints can
  * never break a token. */
case class VocabTfs(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  require(vocab.nonEmpty, "VocabTfs needs at least one vocab term")
  require(vocab.distinct.length == vocab.length,
    "vocab contains duplicates — deduplicate it first")

  @transient private lazy val vocabBytes: Array[Array[Byte]] =
    vocab.map(_.getBytes("UTF-8")).toArray

  override def dataType: DataType = StructType(Seq(
    StructField("has_tok", BooleanType, nullable = false),
    StructField("dl", LongType, nullable = false),
    StructField("tfs", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"VocabTfs requires a string input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    val counts = new Array[Long](vocabBytes.length)
    var hasTok = false
    var dl = 0L
    var i = 0
    var tokStart = -1
    def endToken(end: Int): Unit = {
      hasTok = true
      dl += 1L
      val len = end - tokStart
      var v = 0
      while (v < vocabBytes.length) {
        val vb = vocabBytes(v)
        if (vb.length == len) {
          var j = 0
          while (j < len && s.getByte(tokStart + j) == vb(j)) j += 1
          if (j == len) counts(v) += 1L
        }
        v += 1
      }
      tokStart = -1
    }
    while (i < n) {
      val b = s.getByte(i)
      val ws = b == 0x20 || (b >= 0x09 && b <= 0x0d)
      if (ws) { if (tokStart >= 0) endToken(i) }
      else if (tokStart < 0) tokStart = i
      i += 1
    }
    if (tokStart >= 0) endToken(n)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](hasTok, dl, new GenericArrayData(counts)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("vocabTfs", this, getClass.getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) " +
        s"$ref.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): VocabTfs =
    copy(child = newChild)
}

/** Fused quality-feature statistics — ONE byte pass emitting
  * `struct<n_words: int, n_punct: int, n_stop: int>`, value-identical to
  * the three-pass expression tree it replaces
  * ([[graft.ext.TextAnalysis.qualityFeatures]]):
  *  - `n_words` ≡ `size(split(text, "\s+"))` — Spark's split uses java
  *    limit −1 (every empty segment kept), so the size is exactly
  *    (#maximal whitespace runs) + 1, leading/trailing/empty included;
  *  - `n_punct` ≡ `regexp_count(text, "[.,!?;]")` (ASCII char class);
  *  - `n_stop`  ≡ [[CountInSet]] over the non-empty tokens.
  * The tree allocates the token array and runs two regex Matchers per
  * row; the kernel reads UTF-8 bytes once, no allocation (whitespace =
  * java `\s`, ASCII-only, so multi-byte codepoints never split a token).
  */
case class QualityStats(child: Expression, stopWords: Seq[String])
    extends UnaryExpression {

  require(stopWords.nonEmpty, "QualityStats needs at least one stopword")

  @transient private lazy val stopBytes: Array[Array[Byte]] =
    stopWords.map(_.getBytes("UTF-8")).toArray

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"QualityStats requires a string input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var wsRuns = 0
    var punct = 0
    var stop = 0
    var inWs = false
    var tokStart = -1
    def endToken(end: Int): Unit = {
      val len = end - tokStart
      var v = 0
      var found = false
      while (v < stopBytes.length && !found) {
        val vb = stopBytes(v)
        if (vb.length == len) {
          var j = 0
          while (j < len && s.getByte(tokStart + j) == vb(j)) j += 1
          if (j == len) { stop += 1; found = true }
        }
        v += 1
      }
      tokStart = -1
    }
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      val ws = b == 0x20 || (b >= 0x09 && b <= 0x0d)
      if (ws) {
        if (!inWs) wsRuns += 1
        if (tokStart >= 0) endToken(i)
      } else {
        if (tokStart < 0) tokStart = i
        if (b == '.' || b == ',' || b == '!' || b == '?' || b == ';')
          punct += 1
      }
      inWs = ws
      i += 1
    }
    if (tokStart >= 0) endToken(n)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](wsRuns + 1, punct, stop))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("qualityStats", this, getClass.getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) " +
        s"$ref.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): QualityStats =
    copy(child = newChild)
}

/** Per-document unigram language-model statistics — the scoring half of
  * CCNet-style perplexity filtering (Wenzek et al. 2020): given a fitted
  * add-α unigram model (token → log-probability, plus the OOV
  * log-probability), emit `(sum_lp, n_tok, n_oov)` where `sum_lp` totals
  * every non-empty whitespace token's log-probability (OOV tokens
  * contribute `oovLogProb`). ONE kernel eval per row, model broadcast as
  * a reference object: the corpus never shuffles and never explodes —
  * the unnest+join+re-agg form this replaces shuffles the entire token
  * stream. Empty tokens (leading-whitespace artifacts) are skipped.
  * Callers derive the mean log-probability (≈ negative log-perplexity)
  * as `sum_lp / n_tok`.
  */
case class UnigramLogProbStats(
    child: Expression,
    vocab: Seq[(String, Double)],
    oovLogProb: Double)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("sum_lp", DoubleType, nullable = false),
    StructField("n_tok", IntegerType, nullable = false),
    StructField("n_oov", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"UnigramLogProbStats requires a string input, got ${other.simpleString}")
    }

  @transient private lazy val ws = Pattern.compile("\\s+")
  @transient private lazy val table: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](vocab.size * 2)
    vocab.foreach { case (t, lp) => m.put(t, lp) }
    m
  }

  override protected def nullSafeEval(input: Any): Any = {
    val toks = ws.split(input.asInstanceOf[UTF8String].toString, -1)
    var sum = 0.0
    var nTok = 0
    var nOov = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        nTok += 1
        val lp = table.get(t)
        if (lp == null) { nOov += 1; sum += oovLogProb }
        else sum += lp.doubleValue()
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](sum, nTok, nOov))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("unigramLogProbStats", this, getClass.getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)" +
        s" $ref.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): UnigramLogProbStats =
    copy(child = newChild)
}

/** Unicode normalization (NFC/NFKC/NFD/NFKD) of a string — Spark has no
  * built-in normalizer, and the HOF-free curation chain needs one before
  * any hashing/dedup stage (visually-identical strings with different
  * combining-character encodings otherwise hash apart). Wraps
  * `java.text.Normalizer` with an `isNormalized` fast path: already-NFC
  * text (all-ASCII in particular) pays one scan and zero allocation.
  * Value-identical to DuckDB's `nfc_normalize` for the NFC form (both
  * implement UAX #15).
  */
case class NfcNormalize(child: Expression, form: String = "NFC")
    extends UnaryExpression {
  require(Seq("NFC", "NFKC", "NFD", "NFKD").contains(form),
    s"form must be one of NFC/NFKC/NFD/NFKD, got $form")

  @transient private lazy val nf = java.text.Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"NfcNormalize requires a string input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, nf)) input
    else UTF8String.fromString(java.text.Normalizer.normalize(s, nf))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("nfcNormalize", this, getClass.getName)
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String)" +
        s" $ref.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Boilerplate-line removal: drops every line (exact `\n` segments) whose
  * md5-prefix hash is a member of a constant sorted set, preserving all
  * other lines (empty lines always survive — they are structure, not
  * content, and are never candidates in the fit pass either). The set is
  * the corpus-frequent-lines table collected by
  * [[graft.ext.TextAnalysis.removeBoilerplateLines]] (CCNet-style: a line
  * appearing in >= minDf documents is template chrome, not prose). ONE
  * kernel eval per row — split, binary-search each line, rejoin — so the
  * rewrite stage is map-only: the corpus text never shuffles, and the
  * probe table ships once per executor as a reference object exactly like
  * [[CountInLongSet]]. An EMPTY set is legal and returns the input
  * unchanged (no frequent lines found at the chosen threshold).
  */
case class RemoveLinesInLongSet(
    child: Expression, hashes: Array[Long], hexDigits: Int)
    extends UnaryExpression {
  require(hexDigits >= 1 && hexDigits <= 15,
    s"hexDigits must be in [1,15], got $hexDigits")

  private lazy val sorted: Array[Long] = {
    val a = hashes.clone()
    java.util.Arrays.sort(a)
    var n = 0
    var i = 0
    while (i < a.length) {
      if (n == 0 || a(n - 1) != a(i)) { a(n) = a(i); n += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(a, n)
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"RemoveLinesInLongSet requires a string input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    if (sorted.isEmpty) return input
    val s = input.asInstanceOf[UTF8String].toString
    val lines = s.split("\n", -1)
    val md = Md5Prefix.digest.get()
    val kept = new java.lang.StringBuilder(s.length)
    var first = true
    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      val drop = line.nonEmpty && {
        md.reset()
        val digest = md.digest(line.getBytes("UTF-8"))
        var v = 0L
        var d = 0
        while (d < hexDigits) {
          val b = digest(d / 2) & 0xff
          v = (v << 4) | (if (d % 2 == 0) b >>> 4 else b & 0xf)
          d += 1
        }
        java.util.Arrays.binarySearch(sorted, v) >= 0
      }
      if (!drop) {
        if (!first) kept.append('\n')
        kept.append(line)
        first = false
      }
      i += 1
    }
    UTF8String.fromString(kept.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("removeLinesInLongSet", this, getClass.getName)
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String)" +
        s" $ref.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): RemoveLinesInLongSet =
    copy(child = newChild)
}

/** Raw and DEFLATE-compressed byte counts of a string — the zlib
  * compression-ratio quality signal (Dolma/RedPajama-class heuristic: a
  * document that compresses far better than prose is boilerplate or
  * repetition; far worse is binary junk or high-entropy noise). One
  * native eval per row, no shuffle; returns
  * struct(raw_bytes: long, deflate_bytes: long) so callers do the ratio
  * arithmetic (and its rounding) in plain SQL. Sizes only — no engine
  * ships compressed bytes around. Level is zlib's (1-9, default 6);
  * `deflate_bytes` of an empty string is the 2-byte zlib header+trailer
  * cost, raw_bytes 0 — callers guard the division.
  *
  * Determinism: the LENGTH of a DEFLATE stream at a fixed level is a
  * pure function of the input for a given zlib build; goldens pinning it
  * are container-scoped the same way the xxhash64 goldens are
  * JVM-scoped.
  */
case class DeflateSizes(child: Expression, level: Int = 6)
    extends UnaryExpression {
  require(level >= 1 && level <= 9, s"deflate level must be in [1,9], got $level")

  override def dataType: DataType = StructType(Seq(
    StructField("raw_bytes", LongType, nullable = false),
    StructField("deflate_bytes", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"DeflateSizes requires a string input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val d = DeflateSizes.deflater(level).get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = DeflateSizes.buffer.get()
    var compressed = 0L
    while (!d.finished()) compressed += d.deflate(buf)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bytes.length.toLong, compressed))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("deflateSizes", this, getClass.getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)" +
        s" $ref.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): DeflateSizes =
    copy(child = newChild)
}

object DeflateSizes {
  /** Deflater holds native zlib state and is not thread-safe; one per
    * (thread, level). The JVM frees them with the thread (end() is an
    * optimization we trade for reuse across rows). */
  private val deflaters =
    new java.util.concurrent.ConcurrentHashMap[Int, ThreadLocal[java.util.zip.Deflater]]()
  private[functions] def deflater(level: Int): ThreadLocal[java.util.zip.Deflater] =
    deflaters.computeIfAbsent(level, l =>
      ThreadLocal.withInitial(() => new java.util.zip.Deflater(l)))
  private[functions] val buffer: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](64 * 1024))
}

/** Maximum agreeing-position count between a document's MinHash
  * signature and a BENCHMARK signature set, with candidates restricted
  * to signatures sharing at least one band (by 64-bit band-slice hash —
  * the same candidate rule as the cross-corpus banded pair join in
  * [[graft.ext.Dedup.minHashCrossPairs]]) — the per-row fold of that
  * join for the streaming gate: every signature of a document lives in
  * that document's own row, so the whole candidate+verify step is ONE
  * map-only eval against a reference index built lazily per expression
  * instance from the benchmark signatures. A slice-hash collision adds
  * a spurious candidate whose similarity is then verified exactly — the
  * output differs from exhaustive search only if a collision pair alone
  * clears the caller's threshold (~2⁻⁶⁴ per pair, the join path's own
  * collision budget). Returns 0 for a doc with no banded candidate.
  *
  * Memory (the reason for this layout): benchmark signatures are stored
  * FLAT as one primitive `Array[Long]` (`numSigs × sigLen` — 8 B per
  * hash, no boxing; this is what Java-serializes with the plan), and the
  * per-instance lazy index is two parallel primitive arrays
  * (slice-hash keys + signature ordinals, sorted, binary-searched) at
  * 12 B per (sig, band) entry — no HashMap entry / boxed-key overhead.
  * At [[graft.streaming.FuzzyContaminationGate.MaxBenchmarkSigs]] sigs
  * (2²⁰) × 32 hashes × 8 bands: flat 256 MB + index 96 MB.
  */
case class MaxBandedSigAgreement(
    child: Expression,
    benchSigsFlat: Array[Long],
    sigLen: Int,
    bands: Int,
    rowsPerBand: Int)
    extends UnaryExpression {
  require(bands > 0 && rowsPerBand > 0, "bands and rowsPerBand must be positive")
  require(sigLen == bands * rowsPerBand,
    s"sigLen ($sigLen) must equal bands*rowsPerBand (${bands * rowsPerBand})")
  require(benchSigsFlat.length % sigLen == 0,
    s"flat benchmark array (${benchSigsFlat.length}) is not a multiple of sigLen ($sigLen)")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"MaxBandedSigAgreement requires array<bigint>, got ${other.simpleString}")
    }

  private def mix64(z0: Long): Long = { // splitmix64 finalizer
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def sliceHash(a: Array[Long], off: Int, band: Int): Long = {
    var h = mix64(band.toLong)
    var i = 0
    while (i < rowsPerBand) { h = mix64(h ^ a(off + i)); i += 1 }
    h
  }

  /** (sorted slice-hash keys, parallel signature ordinals). Built once
    * per deserialized expression instance, read-only afterwards. */
  @transient private lazy val index: (Array[Long], Array[Int]) = {
    val numSigs = benchSigsFlat.length / sigLen
    val n = numSigs * bands
    val keys = new Array[Long](n)
    val sigIdx = new Array[Int](n)
    var i = 0
    var p = 0
    while (i < numSigs) {
      var b = 0
      while (b < bands) {
        keys(p) = sliceHash(benchSigsFlat, i * sigLen + b * rowsPerBand, b)
        sigIdx(p) = i
        p += 1
        b += 1
      }
      i += 1
    }
    sortParallel(keys, sigIdx, 0, n - 1)
    (keys, sigIdx)
  }

  /** dual-array quicksort (median-of-3, insertion below 16): keeps the
    * index fully primitive — java.util.Arrays cannot co-sort a payload. */
  private def sortParallel(k: Array[Long], v: Array[Int], lo0: Int, hi0: Int): Unit = {
    var lo = lo0
    var hi = hi0
    while (hi - lo >= 16) {
      val mid = lo + (hi - lo) / 2
      // median-of-3 pivot
      val piv = {
        val a = k(lo); val b = k(mid); val c = k(hi)
        if (a < b) { if (b < c) b else if (a < c) c else a }
        else { if (a < c) a else if (b < c) c else b }
      }
      var i = lo
      var j = hi
      while (i <= j) {
        while (k(i) < piv) i += 1
        while (k(j) > piv) j -= 1
        if (i <= j) {
          val tk = k(i); k(i) = k(j); k(j) = tk
          val tv = v(i); v(i) = v(j); v(j) = tv
          i += 1; j -= 1
        }
      }
      // recurse into the smaller half, loop on the larger (O(log n) stack)
      if (j - lo < hi - i) { sortParallel(k, v, lo, j); lo = i }
      else { sortParallel(k, v, i, hi); hi = j }
    }
    var i = lo + 1
    while (i <= hi) {
      val tk = k(i); val tv = v(i)
      var j = i - 1
      while (j >= lo && k(j) > tk) { k(j + 1) = k(j); v(j + 1) = v(j); j -= 1 }
      k(j + 1) = tk; v(j + 1) = tv
      i += 1
    }
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = arr.numElements()
    if (k != sigLen) return 0 // no equal-length candidate can exist
    val sig = new Array[Long](k)
    var i = 0
    while (i < k) { sig(i) = arr.getLong(i); i += 1 }
    val (keys, sigIdx) = index
    var best = 0
    val seen = new java.util.HashSet[Integer]() // candidate ordinals already verified
    var b = 0
    while (b < bands) {
      val key = sliceHash(sig, b * rowsPerBand, b)
      var pos = java.util.Arrays.binarySearch(keys, key)
      if (pos >= 0) {
        while (pos > 0 && keys(pos - 1) == key) pos -= 1 // run start
        while (pos < keys.length && keys(pos) == key) {
          val cand = sigIdx(pos)
          if (seen.add(cand)) {
            val off = cand * sigLen
            var mc = 0
            var p = 0
            while (p < k) { if (benchSigsFlat(off + p) == sig(p)) mc += 1; p += 1 }
            if (mc > best) best = mc
          }
          pos += 1
        }
      }
      b += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("maxBandedSigAgreement", this, getClass.getName)
      s"${ev.value} = ((java.lang.Integer) $ref.nullSafeEval($c)).intValue();"
    })

  override protected def withNewChildInternal(newChild: Expression): MaxBandedSigAgreement =
    copy(child = newChild)
}

/** 128-bit rolling hashes of every n-token window of a text — the
  * candidate core of ExactSubstr-style span dedup (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better": repeated
  * ≥n-token substrings across a corpus are training-loss poison). Tokens
  * are java `\s+` splits; each token is XXH64-hashed under two seeds and
  * each stream rolls polynomially (wraparound 64-bit, distinct odd
  * bases) — O(tokens) per document regardless of n, one eval per row,
  * zero shuffles. Output index i (0-based) is the window starting at
  * token i; documents with fewer than n tokens yield an empty array.
  * Two independent 64-bit streams because a corpus-scale window count
  * (10¹⁰⁺) makes single-64-bit birthday collisions — which would
  * silently delete an innocent span — a real event, the
  * [[graft.ext.Dedup.fingerprint128]] argument at span grain.
  */
case class TokenWindowHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 2, s"window length must be >= 2 tokens, got $n")

  private val B1 = 0x9E3779B97F4A7C15L // distinct odd bases
  private val B2 = 0xC2B2AE3D27D4EB4FL

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"TokenWindowHashes requires a string input, got ${other.simpleString}")
    }

  @transient private lazy val ws = Pattern.compile("\\s+")

  override protected def nullSafeEval(input: Any): Any = {
    // Pattern.split(..., -1) matches Spark's split()/DuckDB's
    // string_split_regex exactly, trailing empty tokens included
    val toks = ws.split(input.asInstanceOf[UTF8String].toString, -1)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val t1 = new Array[Long](toks.length)
    val t2 = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      val u = UTF8String.fromString(toks(i))
      t1(i) = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      t2(i) = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 1042L)
      i += 1
    }
    // pow = B^(n-1) (wraparound), rolling: h' = (h - t_out*pow)*B + t_in
    var pow1 = 1L; var pow2 = 1L
    i = 1
    while (i < n) { pow1 *= B1; pow2 *= B2; i += 1 }
    var h1 = 0L; var h2 = 0L
    i = 0
    while (i < n) { h1 = h1 * B1 + t1(i); h2 = h2 * B2 + t2(i); i += 1 }
    val out = new Array[Any](m)
    val row0 = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](h1, h2))
    out(0) = row0
    var k = 0
    while (k < m - 1) {
      h1 = (h1 - t1(k) * pow1) * B1 + t1(k + n)
      h2 = (h2 - t2(k) * pow2) * B2 + t2(k + n)
      out(k + 1) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](h1, h2))
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("tokenWindowHashes", this, getClass.getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $ref.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): TokenWindowHashes =
    copy(child = newChild)
}

/** Rewrite a text dropping every token whose (1-based) position falls in
  * any window [s, s+n) for a start s in `starts` — the removal half of
  * span dedup. Kept tokens re-join with single spaces (the rewrite
  * normalizes whitespace in MODIFIED documents, the
  * [[graft.ext.Dedup.dropRepeatedParagraphs]] precedent); callers apply
  * it only to documents that actually have dropped spans. One eval per
  * row; `starts` is the per-document SORTED start list (a handful of
  * values — repeated spans are the exception, not the rule).
  */
case class RemoveTokenRanges(left: Expression, right: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(n >= 1, s"window length must be >= 1, got $n")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"RemoveTokenRanges requires (string, array<bigint>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  @transient private lazy val ws = Pattern.compile("\\s+")

  override protected def nullSafeEval(text: Any, starts: Any): Any = {
    // same -1-limit split as TokenWindowHashes: positions must agree
    val toks = ws.split(text.asInstanceOf[UTF8String].toString, -1)
    val arr = starts.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val sb = new java.lang.StringBuilder
    var first = true
    var j = 0 // index of the first range that could still cover tpos
    var i = 0
    while (i < toks.length) {
      val tpos = i + 1 // 1-based, matching the span positions
      while (j < m && !arr.isNullAt(j) && arr.getLong(j) + n <= tpos) j += 1
      val covered = j < m && !arr.isNullAt(j) &&
        arr.getLong(j) <= tpos && tpos < arr.getLong(j) + n
      if (!covered) {
        if (!first) sb.append(' ')
        sb.append(toks(i))
        first = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("removeTokenRanges", this, getClass.getName)
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String)" +
        s" $ref.nullSafeEval($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RemoveTokenRanges =
    copy(left = newLeft, right = newRight)
}

/** All ordered pairs (a < b, binary UTF8 order) of a string-array column,
  * emitted as one `array<struct<a,b>>` per row — the pair-expansion
  * kernel for [[graft.ext.Dedup.sourceOverlap]]'s per-gram source sets.
  * The HOF formulation (`explode(arr)` + `explode(filter(arr, x > a))`)
  * evaluates its lambda interpreted per element and re-allocates a
  * filtered array per outer element — measured as the dominant cost of
  * the pair stage; this emits the sort + double loop as one eval call
  * with identical output pairs. The input is treated as a SET: null
  * elements are skipped, duplicates collapse (the strict `<` order never
  * pairs equals), and fewer than two distinct elements yield an empty
  * array. `includeSelf = true` additionally emits one `(s, s)` struct per
  * DISTINCT member (before its strict pairs, in sorted order) — the
  * single-generate form that lets [[graft.ext.Dedup.sourceOverlap]]
  * derive per-source gram counts and pair counts from ONE aggregate
  * instead of a second corpus gram pass. */
case class OrderedPairs(child: Expression, includeSelf: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("a", StringType, nullable = false),
      StructField("b", StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"OrderedPairs requires array<string>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val buf = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) buf.add(arr.getUTF8String(i))
      i += 1
    }
    buf.sort(null) // UTF8String is Comparable: binary order, = Spark `<`
    // dedup after sort: the strict `<` pair order never pairs equals, so
    // duplicate elements (a non-set input) must collapse exactly as the
    // HOF `filter(arr, x > a)` formulation collapses them
    var w = 0
    var r = 0
    while (r < buf.size()) {
      if (w == 0 || !buf.get(r).equals(buf.get(w - 1))) {
        buf.set(w, buf.get(r)); w += 1
      }
      r += 1
    }
    while (buf.size() > w) buf.remove(buf.size() - 1)
    val m = buf.size()
    if (m == 0 || (m < 2 && !includeSelf))
      return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m * (m - 1) / 2 + (if (includeSelf) m else 0))
    var k = 0
    i = 0
    while (i < m) {
      if (includeSelf) {
        out(k) =
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](buf.get(i), buf.get(i)))
        k += 1
      }
      var j = i + 1
      while (j < m) {
        out(k) =
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](buf.get(i), buf.get(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("orderedPairs", this, getClass.getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $ref.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): OrderedPairs =
    copy(child = newChild)
}
