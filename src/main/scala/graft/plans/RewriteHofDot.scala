package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the declarative higher-order-function dot
  * product — `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0,
  * (acc, v) -> acc + v)` — into the native codegen'd [[FloatDot]].
  *
  * Users (or generated SQL) writing the idiomatic `functions._` form get the
  * ~10×-per-pair fast path without changing their code. Matching is strictly
  * structural and conservative: any deviation (different lambda bodies,
  * non-zero seed, a finish function that isn't identity) is left untouched.
  */
object RewriteHofDot extends Rule[LogicalPlan] {

  private def isVec(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** x * y over exactly the two lambda variables (in either order, with or
    * without numeric casts).
    */
  private def isMulOfVars(body: Expression, v1: NamedLambdaVariable, v2: NamedLambdaVariable): Boolean = {
    def strip(e: Expression): Expression = e match {
      case Cast(c, DoubleType, _, _) => strip(c)
      case other => other
    }
    body match {
      case Multiply(l, r, _) =>
        val (sl, sr) = (strip(l), strip(r))
        (sl.semanticEquals(v1) && sr.semanticEquals(v2)) ||
          (sl.semanticEquals(v2) && sr.semanticEquals(v1))
      case _ => false
    }
  }

  private def isAddOfVars(body: Expression, acc: NamedLambdaVariable, el: NamedLambdaVariable): Boolean =
    body match {
      case Add(l, r, _) =>
        (l.semanticEquals(acc) && r.semanticEquals(el)) ||
          (l.semanticEquals(el) && r.semanticEquals(acc))
      case _ => false
    }

  private def isZero(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case _ => false
  }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(v: NamedLambdaVariable), _) => body.semanticEquals(v)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(
            ZipWith(a, b, LambdaFunction(mulBody, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            zero,
            LambdaFunction(addBody, Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
            finish)
          if isVec(a) && isVec(b) && isZero(zero) &&
            isMulOfVars(mulBody, x, y) && isAddOfVars(addBody, acc, el) &&
            isIdentity(finish) =>
        FloatDot(a, b)
    }
}
