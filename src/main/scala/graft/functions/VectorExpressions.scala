package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Shared input validation: the float kernels read Tungsten float slots
  * directly, so a non-float array child must be rejected at analysis time —
  * silently reading 4 bytes of a double slot would produce garbage. */
private[functions] object FloatArrayCheck {
  def check(name: String, children: Seq[Expression]): TypeCheckResult = {
    val bad = children.find {
      case c => c.dataType match {
        case ArrayType(FloatType, _) => false
        case _ => true
      }
    }
    bad match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<float> inputs, got ${c.dataType.simpleString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }
}

/** Native Catalyst expressions for embedding math (SURVEY §7.3 option (b):
  * custom `Expression` where the built-in surface is slow).
  *
  * `aggregate(zip_with(...))` higher-order functions evaluate their lambdas
  * interpreted — each element allocates and bounces through
  * `InterpretedEvaluator`. These expressions emit a tight primitive loop
  * via `doGenCode`, reading the float arrays directly from Tungsten
  * `ArrayData` — no boxing, no lambda dispatch. Accumulation is in array
  * order in float64, bit-identical to the HOF form (and the DuckDB oracle).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // NULL semantics deliberately mirror the HOF aggregate/zip_with idiom so
  // VectorizeDotProducts is a bit-exact rewrite: unequal lengths (zip_with
  // pads with nulls) or any null element make the whole result NULL.
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    FloatArrayCheck.check("fvec_dot", Seq(left, right))

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < x.numElements()) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** Dot product of a float array with a DOUBLE array (the hyperplane-LSH
  * projection shape: float embeddings against literal Gaussian planes,
  * which must stay double so oracle SQL re-derives identical signs).
  * Same null/length semantics and float64 array-order accumulation as
  * [[FloatVecDot]] and the HOF `aggregate(zip_with(x.cast(double) * y))`
  * form it replaces. */
case class FloatDoubleVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"fvec_dot_d requires (array<float>, array<double>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < x.numElements()) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getDouble(i)
      i += 1
    }
    s
  }

  // NOT an inlined loop like FloatVecDot's: the LSH signature evaluates
  // numBits×numTables of these per row (32 in the stock config), and 32
  // inlined 64-iteration loops push the generated method past HotSpot's
  // huge-method bytecode limit — the JIT then refuses to compile it and
  // the WHOLE stage runs as interpreted bytecode (measured 2.7× slowdown
  // on the broadcast build). One virtual call per dot keeps the generated
  // method tiny while the loop runs in this class's JIT-compiled eval.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("fvecDotD", this, getClass.getName)
      val r = ctx.freshName("r")
      s"""
         |Object $r = $ref.nullSafeEval($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) $r).doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDoubleVecDot =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of a float array, same codegen rationale as [[FloatVecDot]]. */
case class FloatVecNorm(child: Expression)
    extends UnaryExpression {

  // null elements make the result NULL, matching the HOF aggregate form
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    FloatArrayCheck.check("fvec_norm", Seq(child))

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    while (i < x.numElements()) {
      if (x.isNullAt(i)) return null
      val v = x.getFloat(i).toDouble
      s += v * v
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $v = (double) $a.getFloat($i);
         |  $s += $v * $v;
         |}
         |if (!${ev.isNull}) { ${ev.value} = java.lang.Math.sqrt($s); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FloatVecNorm =
    copy(child = newChild)
}

/** The `take` nearest centroid ids of a float vector, by squared-distance
  * argmin — the IVF assignment/probe step ([[graft.ext.Similarity.ivfTopK]])
  * as ONE expression node.
  *
  * Bit-identical to the composed form it replaces
  * (`array_min`/`array_sort` over `numCells` structs of
  * `lit(c2) − 2.0·FloatVecDot(v, typedLit(c))`):
  * `dist_i = c2_i − 2.0·Σ v[j]·c_i[j]` with per-element float→double
  * widening, array-order accumulation, `c2_i` pre-summed from the float
  * centroid exactly as the literal was, and ties broken by smaller cell
  * id. The composed form carried numCells×dim literal doubles through
  * TWO plan subtrees — Catalyst re-analyzed ~100 KB of expression tree on
  * every (non-memoizable — Lloyd training runs at construction) benchmark
  * repetition, and the struct array allocated per row; here the centroid
  * matrix rides along as ONE reference object and each row is a tight
  * primitive loop. Null vector / null element / dimension mismatch → NULL
  * (clean-embedding pipelines never hit it; mirrors the dot kernels).
  *
  * Returns `array<int>` of cell ids, nearest first.
  */
case class NearestCentroids(child: Expression, centroids: Seq[Seq[Float]], take: Int)
    extends UnaryExpression {
  require(centroids.nonEmpty, "centroids must be non-empty")
  require(take >= 1 && take <= centroids.length,
    s"take must be in [1, ${centroids.length}], got $take")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    FloatArrayCheck.check("nearest_centroids", Seq(child))

  @transient private lazy val cents: Array[Array[Float]] =
    centroids.map(_.toArray).toArray
  // |c|² summed left-to-right from the float values — the same arithmetic
  // the plan-build Scala `c.map(x => x.toDouble * x.toDouble).sum` did
  @transient private lazy val c2: Array[Double] =
    centroids.map(c => c.map(x => x.toDouble * x.toDouble).sum).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = cents(0).length
    if (v.numElements() != dim) return null
    val dists = new Array[Double](cents.length)
    var ci = 0
    while (ci < cents.length) {
      val c = cents(ci)
      var s = 0.0
      var j = 0
      while (j < dim) {
        if (v.isNullAt(j)) return null
        s += v.getFloat(j).toDouble * c(j).toDouble
        j += 1
      }
      dists(ci) = c2(ci) - 2.0 * s
      ci += 1
    }
    // partial selection sort over (dist, cell): nearest `take` cells,
    // ties to the smaller cell id — array_sort/array_min struct order
    val out = new Array[Any](take)
    val used = new Array[Boolean](cents.length)
    var k = 0
    while (k < take) {
      var best = -1
      var i = 0
      while (i < cents.length) {
        if (!used(i) && (best < 0 || dists(i) < dists(best))) best = i
        i += 1
      }
      used(best) = true
      out(k) = best
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("nearestCentroids", this, getClass.getName)
      val r = ctx.freshName("r")
      s"""
         |Object $r = $ref.nullSafeEval($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

/** Registers the native functions on a session (idempotent) so they are
  * usable from `expr("fvec_dot(a, b)")` / SQL. */
object VectorFunctions {
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.registerFunction(
      FunctionIdentifier("fvec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "fvec_dot"),
      (children: Seq[Expression]) => FloatVecDot(children(0), children(1)))
    registry.registerFunction(
      FunctionIdentifier("fvec_norm"),
      new ExpressionInfo(classOf[FloatVecNorm].getName, "fvec_norm"),
      (children: Seq[Expression]) => FloatVecNorm(children.head))
  }
}

/** `SparkSessionExtensions` injector — wire the engine's native functions
  * at session build time:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or: .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("fvec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "fvec_dot"),
      (children: Seq[Expression]) => FloatVecDot(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("fvec_norm"),
      new ExpressionInfo(classOf[FloatVecNorm].getName, "fvec_norm"),
      (children: Seq[Expression]) => FloatVecNorm(children.head)))
    // auto-accelerate the declarative HOF dot-product idiom
    ext.injectOptimizerRule(_ => VectorizeDotProducts)
    // plan the custom bounded-heap top-k operator (graft.plans.TopKPerGroup)
    // on extension-built sessions; ops.TopK.enable covers ad-hoc sessions
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
