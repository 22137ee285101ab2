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
