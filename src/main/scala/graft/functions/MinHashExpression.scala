package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

private[functions] object LongArrayCheck {
  /** These kernels read Tungsten long slots directly; reject non-long
    * array children at analysis time instead of producing garbage. */
  def check(name: String, child: Expression): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires an array<bigint> input, got ${other.simpleString}")
    }
}

/** Native k-permutation MinHash kernel (SURVEY §7.3 option (b)).
  *
  * Input: the array of raw 64-bit shingle hashes for one document. Output:
  * `array<long>` of length k where slot i = min over shingles of
  * `pmod(a_i · pmod(h, p) + b_i, p)`; an empty (or all-null) shingle array
  * yields the sentinel `p` in every slot.
  *
  * This replaces k interpreted `transform`/`array_min` higher-order calls
  * — Catalyst evaluates HOF lambdas per element through the interpreter, so
  * the k×|shingles| multiply-mod inner loop was the whole cost of the
  * signature stage (measured ~2 s of the 3 s LSH query at sf0.1). Here the
  * loop is emitted as primitive Java in `doGenCode`: one pass over the
  * hash array, k running minima in a local long[], no boxing. Bit-exact
  * with the HOF form: Java long multiplication wraps identically to
  * Spark's non-ANSI `*`, and the double-pmod matches `pmod` on both the
  * pre-reduced hash and the permuted value.
  */
case class MinHashSigs(
    child: Expression,
    coeffA: Seq[Long],
    coeffB: Seq[Long],
    p: Long) extends UnaryExpression {

  require(coeffA.length == coeffB.length && coeffA.nonEmpty,
    "coefficient vectors must be non-empty and equal-length")

  private lazy val aArr = coeffA.toArray
  private lazy val bArr = coeffB.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    LongArrayCheck.check("MinHashSigs", child)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = aArr.length
    val out = Array.fill(k)(p)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        var h = arr.getLong(j) % p
        if (h < 0) h += p
        var i = 0
        while (i < k) {
          var v = (aArr(i) * h + bArr(i)) % p
          if (v < 0) v += p
          if (v < out(i)) out(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val k = aArr.length
      s"""
         |long[] $out = new long[$k];
         |java.util.Arrays.fill($out, ${p}L);
         |int $n = $c.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$c.isNullAt($j)) {
         |    long $h = $c.getLong($j) % ${p}L;
         |    if ($h < 0) $h += ${p}L;
         |    for (int $i = 0; $i < $k; $i++) {
         |      long $v = ($aRef[$i] * $h + $bRef[$i]) % ${p}L;
         |      if ($v < 0) $v += ${p}L;
         |      if ($v < $out[$i]) $out[$i] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

/** Native SimHash kernel: fold an array of token hashes into a `bits`-wide
  * signature — per bit i, count +1/−1 by the token's bit i, emit 1 iff the
  * sum is positive.
  *
  * Turns SimHash from an explode + `bits` conditional-sum AGGREGATE (a
  * full shuffle on the doc id, with `bits` aggregation buffers per group)
  * into a zero-shuffle per-row map — the structurally right shape at scale:
  * signatures become embarrassingly parallel, and the only shuffle left in
  * near-dup search is the band-bucket join. Bit-exact with the aggregate
  * form for docs with ≥1 token (empty docs never reach either path —
  * callers filter them, matching the GROUP-BY-drop semantics).
  */
case class SimHashBits(child: Expression, bits: Int) extends UnaryExpression {

  require(bits > 0 && bits <= 64, s"bits must be in 1..64, got $bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    LongArrayCheck.check("SimHashBits", child)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val cnt = new Array[Long](bits)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = arr.getLong(j)
        var i = 0
        while (i < bits) {
          cnt(i) += (if (((h >> i) & 1L) == 1L) 1L else -1L)
          i += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < bits) {
      if (cnt(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |long[] $cnt = new long[$bits];
         |int $n = $c.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$c.isNullAt($j)) {
         |    long $h = $c.getLong($j);
         |    for (int $i = 0; $i < $bits; $i++) {
         |      $cnt[$i] += ((($h >> $i) & 1L) == 1L) ? 1L : -1L;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  if ($cnt[$i] > 0) $sig |= (1L << $i);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}
