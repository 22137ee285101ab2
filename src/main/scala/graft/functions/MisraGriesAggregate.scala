package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter summary state: at most `capacity` counters
  * plus the cumulative decrement `delta` (the undercount bound: every
  * retained token's TRUE count lies in [count, count + delta]). */
final class MisraGriesState(
    val counts: java.util.HashMap[String, Long],
    var delta: Long)

/** Misra–Gries heavy-hitters as a mergeable typed imperative aggregate —
  * the approximate corpus-vocabulary path for when the exact
  * explode → groupBy(token) count ([[graft.ext.TextAnalysis.topTokens]])
  * is too expensive: a 100 TB corpus has billions of distinct tokens,
  * and the exact form shuffles one row per distinct token while this
  * summary shuffles ONE `capacity`-entry buffer per partition (classic
  * streaming summary, Misra & Gries 1982; mergeability per Agarwal et
  * al. 2012 "Mergeable Summaries": merge = counter-wise add, then
  * subtract the (capacity+1)-th largest count and drop non-positives).
  *
  * Guarantees (asserted in SketchSpec): a retained token's true count is
  * in [count, count + delta]; any token whose true count exceeds delta
  * is guaranteed retained; with capacity ≥ distinct tokens the summary
  * is EXACT (delta 0). The result is input-ORDER-dependent in the ties
  * (like any MG implementation), so it is a spec'd/smoked operator, not
  * an oracle query.
  *
  * Input: one array<string> of tokens per row (empty strings skipped,
  * the [[graft.ext.TextAnalysis.topTokens]] filter); output:
  * array<struct<token, count_lo, max_undercount>> sorted count desc,
  * token asc.
  */
case class MisraGriesTopK(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesState] {

  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("count_lo", LongType, nullable = false),
    StructField("max_undercount", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"MisraGriesTopK requires array<string>, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): MisraGriesState =
    new MisraGriesState(new java.util.HashMap[String, Long](capacity * 2), 0L)

  private def add(b: MisraGriesState, token: String, by: Long): Unit = {
    val cur = b.counts.get(token)
    if (cur != 0L || b.counts.containsKey(token)) {
      b.counts.put(token, cur + by)
    } else if (b.counts.size() < capacity) {
      b.counts.put(token, by)
    } else {
      // decrement-all by min(by, smallest counter-tick): classic MG does
      // one unit at a time; batching by 1 here keeps the invariant simple
      // (by is 1 for updates; merges go through mergeState instead)
      var remaining = by
      while (remaining > 0) {
        if (b.counts.size() < capacity) { add(b, token, remaining); remaining = 0 }
        else {
          val it = b.counts.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
          }
          b.delta += 1L
          remaining -= 1
        }
      }
    }
  }

  override def update(b: MisraGriesState, input: InternalRow): MisraGriesState = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val m = arr.numElements()
      var i = 0
      while (i < m) {
        if (!arr.isNullAt(i)) {
          val s = arr.getUTF8String(i)
          if (s.numBytes > 0) add(b, s.toString, 1L)
        }
        i += 1
      }
    }
    b
  }

  override def merge(b: MisraGriesState, o: MisraGriesState): MisraGriesState = {
    // counter-wise add, then restore the capacity bound by subtracting the
    // (capacity+1)-th largest count from every counter (Agarwal et al.
    // 2012) — the subtraction joins the undercount budget
    val it = o.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = b.counts.get(e.getKey)
      b.counts.put(e.getKey, cur + e.getValue)
    }
    b.delta += o.delta
    if (b.counts.size() > capacity) {
      val vals = new java.util.ArrayList[Long](b.counts.values())
      java.util.Collections.sort(vals, java.util.Collections.reverseOrder[Long]())
      val cut = vals.get(capacity) // (capacity+1)-th largest
      val it2 = b.counts.entrySet().iterator()
      while (it2.hasNext) {
        val e = it2.next()
        if (e.getValue <= cut) it2.remove() else e.setValue(e.getValue - cut)
      }
      b.delta += cut
    }
    b
  }

  override def eval(b: MisraGriesState): Any = {
    val entries = new java.util.ArrayList(b.counts.entrySet())
    java.util.Collections.sort(entries,
      new java.util.Comparator[java.util.Map.Entry[String, Long]] {
        override def compare(
            a: java.util.Map.Entry[String, Long],
            c: java.util.Map.Entry[String, Long]): Int = {
          val byCount = java.lang.Long.compare(c.getValue, a.getValue)
          if (byCount != 0) byCount else a.getKey.compareTo(c.getKey)
        }
      })
    val out = new Array[Any](entries.size())
    var i = 0
    while (i < entries.size()) {
      val e = entries.get(i)
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue, b.delta))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: MisraGriesState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.delta)
    out.writeInt(b.counts.size())
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // NOT writeUTF: its 64 KiB modified-UTF-8 limit would crash the
      // partial-aggregate shuffle on whitespace-free blobs (base64,
      // minified JS) that web corpora routinely contain as one "token"
      val keyBytes = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(keyBytes.length)
      out.write(keyBytes)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val delta = in.readLong()
    val n = in.readInt()
    val m = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val keyBytes = new Array[Byte](len)
      in.readFully(keyBytes)
      m.put(new String(keyBytes, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    new MisraGriesState(m, delta)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesTopK =
    copy(child = newChildren.head)
}
