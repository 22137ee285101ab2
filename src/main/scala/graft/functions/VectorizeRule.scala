package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the interpreted higher-order-function
  * dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0, (acc, v) -> acc + v) }}}
  *
  * into the codegen'd [[FloatVecDot]] when `a`/`b` are float arrays — same
  * float64 array-order accumulation, so the rewrite is semantics-preserving
  * bit-for-bit (ScaleOpsSpec asserts max-abs-diff == 0.0 between the two
  * forms). This is the SURVEY §7.3 case (c) seam: user code can stay in the
  * declarative HOF surface and still get the tight primitive loop.
  *
  * Matching is deliberately conservative: exact Literal(0.0) zero, a merge
  * lambda that is a bare `acc + v`, an identity finish lambda, and both
  * multiply operands being casts of the zip_with lambda variables.
  */
object VectorizeDotProducts extends Rule[LogicalPlan] {

  private def isIdentityFinish(e: Expression): Boolean = e match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }

  private def castOf(e: Expression): Option[NamedLambdaVariable] = e match {
    case c: Cast if c.dataType == DoubleType =>
      c.child match {
        case v: NamedLambdaVariable => Some(v)
        case _ => None
      }
    case v: NamedLambdaVariable if v.dataType == DoubleType => Some(v)
    case _ => None
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case agg @ ArrayAggregate(
          ZipWith(left, right, LambdaFunction(mul: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(add: Add, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          finish)
        if isFloatArray(left) && isFloatArray(right) && isIdentityFinish(finish) => {
      val mulVars = (castOf(mul.left), castOf(mul.right))
      val addVars = (add.left, add.right)
      val mulMatches = mulVars match {
        case (Some(a), Some(b)) =>
          Set(a.exprId, b.exprId) == Set(x.exprId, y.exprId)
        case _ => false
      }
      val addMatches = addVars match {
        case (l: NamedLambdaVariable, r: NamedLambdaVariable) =>
          Set(l.exprId, r.exprId) == Set(acc.exprId, v.exprId)
        case _ => false
      }
      if (mulMatches && addMatches) FloatVecDot(left, right) else agg
    }
  }
}
