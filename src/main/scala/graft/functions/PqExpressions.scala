package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou et al. 2011, "Product Quantization
  * for Nearest Neighbor Search") for the IVF-PQ ANN path
  * ([[graft.ext.Similarity.ivfPqTopK]]).
  *
  * The codebook matrix (M subspaces × K sub-centroids × D/M dims) rides
  * as a reference object like the IVF centroids; candidates are encoded
  * to M small ints + one stored norm, which is what crosses every
  * exchange — at 100 TB the 4·D-byte vectors never shuffle, the ~M-byte
  * codes do (the compression IS the scale story). Scoring is ADC
  * (asymmetric distance computation): the query×sub-centroid lookup
  * table is built ONCE per (query, posting-shard) kernel call and
  * amortized over every candidate in the shard.
  */

/** PQ-encode a float vector: for each of the M equal subspaces, the id
  * of the L2-nearest sub-centroid (ties to the smaller id — the
  * [[NearestCentroids]] convention). Returns `array<int>` of length M.
  * Null vector / null element / dimension mismatch → NULL. */
case class PqCodes(child: Expression, codebooks: Seq[Seq[Seq[Float]]])
    extends UnaryExpression {
  require(codebooks.nonEmpty, "codebooks must be non-empty")
  require(codebooks.forall(_.nonEmpty), "every subspace needs >= 1 centroid")

  private val m = codebooks.length
  private val dsub = codebooks.head.head.length

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    FloatArrayCheck.check("pq_codes", Seq(child))

  @transient private lazy val cbs: Array[Array[Array[Float]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  // |c|² per sub-centroid, summed left-to-right like NearestCentroids
  @transient private lazy val c2: Array[Array[Double]] =
    codebooks.map(_.map(c => c.map(x => x.toDouble * x.toDouble).sum).toArray)
      .toArray

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != m * dsub) return null
    val out = new Array[Any](m)
    var mi = 0
    while (mi < m) {
      val base = mi * dsub
      val cb = cbs(mi)
      var best = -1
      var bestD = Double.MaxValue
      var k = 0
      while (k < cb.length) {
        val c = cb(k)
        var s = 0.0
        var j = 0
        while (j < dsub) {
          if (v.isNullAt(base + j)) return null
          s += v.getFloat(base + j).toDouble * c(j).toDouble
          j += 1
        }
        val d = c2(mi)(k) - 2.0 * s
        if (d < bestD) { bestD = d; best = k }
        k += 1
      }
      out(mi) = best
      mi += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("pqCodes", this, getClass.getName)
      val r = ctx.freshName("r")
      s"""
         |Object $r = $ref.nullSafeEval($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

/** ADC top-k over one posting shard: children are
  * `(query_id, query_vec, query_norm, entries)` where `entries` is
  * `array<struct<id bigint, codes array<int>, norm double>>` — a
  * (cell, shard) posting row's candidates. Builds the M×K lookup table
  * `LUT[m][k] = q_m · c_{m,k}` once, approximates each candidate's dot
  * as `Σ_m LUT[m][code_m]`, converts to cosine with the candidate's
  * STORED true norm, skips the query's own id, and returns the shard's
  * top `k` as `array<struct<neighbor_id bigint, cosine double>>`
  * ordered (cosine desc, id asc) — the same total order the global
  * bounded-heap rank applies, so per-shard pruning can never disagree
  * with the final ranking. */
case class PqAdcTopK(
    first: Expression, second: Expression, third: Expression,
    fourth: Expression,
    codebooks: Seq[Seq[Seq[Float]]], k: Int)
    extends QuaternaryExpression {
  require(k >= 1, s"k must be positive, got $k")
  require(codebooks.nonEmpty, "codebooks must be non-empty")

  private val m = codebooks.length
  private val dsub = codebooks.head.head.length

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = first.dataType == LongType &&
      FloatArrayCheck.check("pq_adc_topk", Seq(second)).isSuccess &&
      third.dataType == DoubleType &&
      (fourth.dataType match {
        case ArrayType(StructType(fields), _) => fields.length == 3 &&
          fields(0).dataType == LongType &&
          (fields(1).dataType match {
            case ArrayType(IntegerType, _) => true
            case _ => false
          }) &&
          fields(2).dataType == DoubleType
        case _ => false
      })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "pq_adc_topk requires (bigint, array<float>, double, " +
        s"array<struct<bigint, array<int>, double>>), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString}, ${fourth.dataType.simpleString})")
  }

  @transient private lazy val cbs: Array[Array[Array[Float]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  override protected def nullSafeEval(
      qid: Any, qv: Any, qn: Any, ents: Any): Any = {
    val v = qv.asInstanceOf[ArrayData]
    if (v.numElements() != m * dsub) return null
    val queryId = qid.asInstanceOf[Long]
    val qNorm = qn.asInstanceOf[Double]
    // degenerate-vector guard: a zero-norm query has no defined cosine
    // against anything — return null (the row contributes no matches)
    // rather than ±Inf/NaN, which would either rank first or be silently
    // dropped by the NaN-rejecting heap comparator
    if (qNorm <= 0.0) return null
    // LUT[m][k] = q_m · c_{m,k} — once per call, amortized over the shard
    val lut = new Array[Array[Double]](m)
    var mi = 0
    while (mi < m) {
      val base = mi * dsub
      val cb = cbs(mi)
      val row = new Array[Double](cb.length)
      var k2 = 0
      while (k2 < cb.length) {
        val c = cb(k2)
        var s = 0.0
        var j = 0
        while (j < dsub) {
          if (v.isNullAt(base + j)) return null
          s += v.getFloat(base + j).toDouble * c(j).toDouble
          j += 1
        }
        row(k2) = s
        k2 += 1
      }
      lut(mi) = row
      mi += 1
    }
    // bounded selection: keep the k best (cosine desc, id asc)
    val entries = ents.asInstanceOf[ArrayData]
    val n = entries.numElements()
    val heapIds = new Array[Long](k)
    val heapCos = new Array[Double](k)
    var size = 0
    var i = 0
    while (i < n) {
      val e = entries.getStruct(i, 3)
      val id = e.getLong(0)
      val entryNorm = e.getDouble(2)
      // zero-norm stored candidates are skipped: their ADC cosine would
      // be ±Inf (ranked first) or NaN (never inserted) — neither is a
      // meaningful similarity, and brute force yields NaN for them too
      if (id != queryId && entryNorm > 0.0) {
        val codes = e.getArray(1)
        val norm = entryNorm
        var dot = 0.0
        var mj = 0
        while (mj < m) { dot += lut(mj)(codes.getInt(mj)); mj += 1 }
        val cos = dot / (qNorm * norm)
        // insert if better than the current worst (or heap not full)
        if (size < k) {
          heapIds(size) = id; heapCos(size) = cos; size += 1
          if (size == k) sortDesc(heapIds, heapCos, size)
        } else if (better(cos, id, heapCos(size - 1), heapIds(size - 1))) {
          // replace worst, re-position by insertion
          var p = size - 1
          while (p > 0 && better(cos, id, heapCos(p - 1), heapIds(p - 1))) {
            heapCos(p) = heapCos(p - 1); heapIds(p) = heapIds(p - 1); p -= 1
          }
          heapCos(p) = cos; heapIds(p) = id
        }
      }
      i += 1
    }
    if (size < k) sortDesc(heapIds, heapCos, size)
    val out = new Array[Any](size)
    var oi = 0
    while (oi < size) {
      out(oi) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](heapIds(oi), heapCos(oi)))
      oi += 1
    }
    new GenericArrayData(out)
  }

  /** (cosA, idA) strictly better than (cosB, idB) under
    * (cosine desc, id asc). */
  private def better(ca: Double, ia: Long, cb: Double, ib: Long): Boolean =
    ca > cb || (ca == cb && ia < ib)

  private def sortDesc(ids: Array[Long], cos: Array[Double], n: Int): Unit = {
    // insertion sort — n ≤ k, called once per fill
    var i = 1
    while (i < n) {
      val ci = cos(i); val ii = ids(i)
      var p = i - 1
      while (p >= 0 && better(ci, ii, cos(p), ids(p))) {
        cos(p + 1) = cos(p); ids(p + 1) = ids(p); p -= 1
      }
      cos(p + 1) = ci; ids(p + 1) = ii
      i += 1
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) => {
      val ref = ctx.addReferenceObj("pqAdcTopK", this, getClass.getName)
      val r = ctx.freshName("r")
      s"""
         |Object $r = $ref.nullSafeEval($a, $b, $c, $d);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): PqAdcTopK =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}
