package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE encode core shared by every consumer of a fitted merge list
  * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
  * Subword Units"). One implementation behind the kernel AND any
  * driver-side use, so they cannot drift.
  *
  * A word's symbol sequence is its characters plus the `</w>`
  * end-of-word marker as a separate final symbol; encoding repeatedly
  * merges the adjacent pair with the LOWEST merge rank (the order the
  * merges were learned), sweeping left-to-right within a pass, until no
  * adjacent pair is in the table. Symbols never contain whitespace
  * (words are `\s+`-split), so the `"a b"` single-space pair key is
  * unambiguous. */
object BpeCore {
  val Eow = "</w>"

  /** rank table: "left right" → merge index (lower = earlier = applied
    * first). */
  def rankTable(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      // first occurrence wins — duplicate merges cannot lower a rank
      if (!m.containsKey(a + " " + b)) m.put(a + " " + b, i)
    }
    m
  }

  /** Greedy BPE encode of one word (no cache). */
  def encodeWord(word: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    var syms = new java.util.ArrayList[String](word.length + 1)
    var ci = 0
    while (ci < word.length) {
      // surrogate-pair-safe: one symbol per code point
      val cp = word.codePointAt(ci)
      syms.add(new String(Character.toChars(cp)))
      ci += Character.charCount(cp)
    }
    syms.add(Eow)
    var done = false
    while (!done && syms.size() >= 2) {
      // find the lowest-rank adjacent pair
      var bestRank = Int.MaxValue
      var bestA: String = null
      var bestB: String = null
      var i = 0
      while (i < syms.size() - 1) {
        val r = ranks.get(syms.get(i) + " " + syms.get(i + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestA = syms.get(i); bestB = syms.get(i + 1)
        }
        i += 1
      }
      if (bestA == null) done = true
      else {
        // merge every occurrence of (bestA, bestB), left to right
        val next = new java.util.ArrayList[String](syms.size())
        var j = 0
        while (j < syms.size()) {
          if (j < syms.size() - 1 && syms.get(j) == bestA &&
              syms.get(j + 1) == bestB) {
            next.add(bestA + bestB); j += 2
          } else { next.add(syms.get(j)); j += 1 }
        }
        syms = next
      }
    }
    val out = new Array[String](syms.size())
    var k = 0
    while (k < out.length) { out(k) = syms.get(k); k += 1 }
    out
  }
}

/** BPE-encode a text column under a fitted merge list: every non-empty
  * whitespace token is greedily merged per [[BpeCore]]; the result is
  * the document-order concatenation of all words' subword tokens
  * (each word's final subword carries the `</w>` marker). ONE kernel
  * eval per row, merge table broadcast as reference-object state —
  * map-only at any corpus size, which is what makes corpus-wide token
  * accounting under a real subword vocabulary a scan, not a shuffle.
  *
  * Words repeat heavily in natural text, so encoded words are memoized
  * per kernel instance in a bounded cache (cleared at `cacheCap`
  * entries — bounded memory on adversarial unique-word streams, the
  * same discipline subword-nmt's `apply_bpe` cache lacks). */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"BpeEncode requires a string input, got ${other.simpleString}")
    }

  private val cacheCap = 1 << 16

  @transient private lazy val ws = Pattern.compile("\\s+")
  @transient private lazy val ranks = BpeCore.rankTable(merges)
  // the compiled plan's reference object is shared across concurrent
  // tasks of a stage — the memo cache must be per-thread (the Md5Prefix
  // ThreadLocal pattern), not a shared HashMap
  @transient private lazy val cache:
      ThreadLocal[java.util.HashMap[String, Array[String]]] =
    ThreadLocal.withInitial(() =>
      new java.util.HashMap[String, Array[String]](1024))

  override protected def nullSafeEval(input: Any): Any = {
    val toks = ws.split(input.asInstanceOf[UTF8String].toString, -1)
    val memo = cache.get()
    val out = new java.util.ArrayList[Any](toks.length * 2)
    var i = 0
    while (i < toks.length) {
      val w = toks(i)
      if (w.nonEmpty) {
        var enc = memo.get(w)
        if (enc == null) {
          enc = BpeCore.encodeWord(w, ranks)
          if (memo.size() >= cacheCap) memo.clear()
          memo.put(w, enc)
        }
        var j = 0
        while (j < enc.length) { out.add(UTF8String.fromString(enc(j))); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("bpeEncode", this, getClass.getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $ref.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
