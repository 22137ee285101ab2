package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Single-pass multi-benchmark contamination attribution kernel: given one
  * document's gram-hash array, return the benchmark documents whose gram
  * sets it covers at ≥ `minFraction`, as `array<struct<bench_id: bigint,
  * overlap: double>>` — the posting-automaton analogue of
  * [[AhoCorasickStats]] for hashed grams (binary search over one sorted
  * posting table instead of a goto/fail trie, since grams are already
  * 64-bit hashes).
  *
  * Replaces the gram-level shuffle-hash join + corpus×bench pair exchange
  * of [[graft.ext.Dedup.contaminationAttribution]] for BOUNDED benchmarks
  * (eval suites — the reference's decontamination-report shape): every
  * (doc, bench) pair completes INSIDE one row's evaluation because the
  * whole posting table rides along, so the only exchange left in the plan
  * is the final |bench|-bounded aggregate. The posting table is built
  * from a guarded driver collect (same boundedness class as
  * [[graft.streaming.ContaminationGate]]'s gram set) — callers with a
  * corpus-sized "benchmark" must stay on the join form.
  *
  * The table rides a `Broadcast` handle, not plan constants: a multi-MB
  * reference object would serialize into every job's task binary and
  * deserialize per task (measured 60–90 ms deser per stage at sf0.1); the
  * broadcast ships once per executor — exactly how a 1000-executor run
  * wants a bounded side distributed. (An all-in-plan one-row-sidecar
  * variant was A/B-measured SLOWER end-to-end — its posting
  * distinct + size-join + one-row-fold chain costs 6 extra stages per
  * run; see PLANS.md round 16.)
  *
  * Per-doc scratch counters are per-thread and reset via a touched list,
  * so per-row cost is O(|doc grams| · log |postings| + hits) with zero
  * per-row allocation beyond the survivor output.
  *
  * @param table broadcast posting table (sorted grams ∥ bench indices,
  *              bench ids ∥ per-bench gram-set sizes)
  */
case class BenchOverlap(
    child: Expression,
    table: org.apache.spark.broadcast.Broadcast[BenchOverlap.PostingTable],
    minFraction: Double)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("bench_id", LongType, nullable = false),
    StructField("overlap", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"BenchOverlap requires an array<bigint> input, got ${other.simpleString}")
    }

  // broadcast value resolved once per deserialized instance, not per row
  // (TorrentBroadcast.value is a synchronized cache lookup)
  @transient private lazy val postings0: BenchOverlap.PostingTable = table.value

  // (counts, touched) sized to the bench count; per-thread because one
  // expression instance can be referenced from several local-mode tasks
  @transient private lazy val scratch =
    new ThreadLocal[(Array[Int], Array[Int])] {
      override def initialValue(): (Array[Int], Array[Int]) = {
        val n = postings0.benchIds.length
        (new Array[Int](n), new Array[Int](n))
      }
    }

  override protected def nullSafeEval(input: Any): Any = {
    val t0 = postings0
    val grams = t0.grams; val benchIdx = t0.benchIdx
    val benchIds = t0.benchIds; val nb = t0.nb
    val arr = input.asInstanceOf[ArrayData]
    val (counts, touched) = scratch.get()
    var nTouched = 0
    val nGrams = arr.numElements()
    var g = 0
    while (g < nGrams) {
      if (!arr.isNullAt(g)) {
        val h = arr.getLong(g)
        var i = java.util.Arrays.binarySearch(grams, h)
        if (i >= 0) {
          // walk to the run's start (duplicates = one posting per bench)
          while (i > 0 && grams(i - 1) == h) i -= 1
          while (i < grams.length && grams(i) == h) {
            val b = benchIdx(i)
            if (counts(b) == 0) { touched(nTouched) = b; nTouched += 1 }
            counts(b) += 1
            i += 1
          }
        }
      }
      g += 1
    }
    var nOut = 0
    var t = 0
    while (t < nTouched) { // count survivors before allocating the output
      val b = touched(t)
      if (counts(b) >= nb(b) * minFraction) nOut += 1
      t += 1
    }
    val out = new Array[Any](nOut)
    var o = 0
    t = 0
    while (t < nTouched) {
      val b = touched(t)
      if (counts(b) >= nb(b) * minFraction) {
        out(o) = new GenericInternalRow(
          Array[Any](benchIds(b), counts(b).toDouble / nb(b)))
        o += 1
      }
      counts(b) = 0 // reset for the next row
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("benchOverlap", this, getClass.getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $ref.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): BenchOverlap =
    copy(child = newChild)
}

object BenchOverlap {
  /** Broadcast payload: sorted posting grams ∥ bench indices, plus the
    * bench-id / set-size lookup arrays. */
  final case class PostingTable(
      grams: Array[Long],
      benchIdx: Array[Int],
      benchIds: Array[Long],
      nb: Array[Int]) {
    require(grams.length == benchIdx.length, "posting arrays must be parallel")
    require(benchIds.length == nb.length, "bench arrays must be parallel")
  }
}
