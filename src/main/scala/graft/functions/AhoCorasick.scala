package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-phrase matcher — Aho & Corasick 1975 ("Efficient string
  * matching: an aid to bibliographic search"): ONE automaton pass per
  * document finds every occurrence of every phrase, versus one
  * `regexp_count`/`contains` pass PER PHRASE for the naive chain. The
  * production blocklists this exists for (toxicity phrase lists,
  * compliance terms) hold 10³–10⁵ phrases — at that width the chain is
  * 10³–10⁵ corpus scans and the automaton is still one.
  *
  * Returns `(n_hits, n_phrases_hit)`: total occurrence count (ALL
  * occurrences, overlapping included — end-position semantics) and the
  * number of DISTINCT phrases present. Matching is case-sensitive over
  * UTF-16 code units (callers lowercase upstream for case-insensitive
  * lists). The automaton builds once per executor from the phrase list
  * riding the task binary (same reference-object pattern as
  * [[UnigramLogProbStats]]).
  */
case class AhoCorasickStats(child: Expression, phrases: Seq[String])
    extends UnaryExpression {
  require(phrases.nonEmpty, "phrase list must be non-empty")
  require(phrases.forall(_.nonEmpty), "phrases must be non-empty strings")

  override def dataType: DataType = StructType(Seq(
    StructField("n_hits", LongType, nullable = false),
    StructField("n_phrases_hit", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"AhoCorasickStats requires a string input, got ${other.simpleString}")
    }

  /** goto tries, failure links, and per-node merged output lists —
    * standard BFS construction. */
  @transient private lazy val automaton: (
      Array[java.util.HashMap[Character, Integer]], // goto
      Array[Int],                                   // fail
      Array[Array[Int]]) = {                        // outputs (phrase ids)
    val goto = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val ownOut = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    phrases.zipWithIndex.foreach { case (p, pid) =>
      var s = 0
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i)
        val nxt = goto(s).get(c)
        if (nxt == null) {
          goto += new java.util.HashMap[Character, Integer]()
          ownOut += Nil
          goto(s).put(c, goto.length - 1)
          s = goto.length - 1
        } else s = nxt
        i += 1
      }
      ownOut(s) = pid :: ownOut(s)
    }
    val n = goto.length
    val fail = new Array[Int](n)
    val out = new Array[List[Int]](n)
    out(0) = ownOut(0)
    val queue = new java.util.ArrayDeque[Int]()
    goto(0).forEach((_, v) => { fail(v) = 0; queue.add(v) })
    while (!queue.isEmpty) {
      val u = queue.poll()
      out(u) = ownOut(u) ++ out(fail(u))
      goto(u).forEach { (c, v) =>
        var f = fail(u)
        while (f != 0 && goto(f).get(c) == null) f = fail(f)
        val t = goto(f).get(c)
        fail(v) = if (t != null && t != v) t else 0
        queue.add(v)
      }
    }
    (goto.toArray, fail, out.map(l => if (l == null) Array.empty[Int] else l.toArray))
  }

  override protected def nullSafeEval(input: Any): Any = {
    val (goto, fail, out) = automaton
    val text = input.asInstanceOf[UTF8String].toString
    var nHits = 0L
    val seen = new Array[Boolean](phrases.length)
    var nPhrases = 0
    var s = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      var nxt = goto(s).get(c)
      while (nxt == null && s != 0) { s = fail(s); nxt = goto(s).get(c) }
      s = if (nxt == null) 0 else nxt
      val o = out(s)
      var j = 0
      while (j < o.length) {
        nHits += 1L
        val pid = o(j)
        if (!seen(pid)) { seen(pid) = true; nPhrases += 1 }
        j += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nHits, nPhrases))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("ahoCorasick", this, getClass.getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)" +
        s" $ref.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): AhoCorasickStats =
    copy(child = newChild)
}
