package graft.plans

import graft.functions.DotProductF
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: recognize the portable higher-order-function dot
  * product —
  * {{{ aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0, (acc, v) -> acc + v) }}}
  * — and replace it with the codegen'd [[DotProductF]] primitive loop
  * (~4× faster, bit-identical accumulation order).
  *
  * This is the "let Catalyst optimize" contract applied to our own
  * library: callers write the declarative portable form; sessions with
  * [[GraftExtensions]] installed execute the native expression. The match
  * is deliberately conservative — any structural deviation falls through
  * untouched.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private object PairwiseProduct {
    /** Matches zip_with(a, b, (x, y) -> double(x) * double(y)). */
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ZipWith(a, b,
        LambdaFunction(
          Multiply(Cast(x: NamedLambdaVariable, DoubleType, _, _),
                   Cast(y: NamedLambdaVariable, DoubleType, _, _), _),
          Seq(ax: NamedLambdaVariable, ay: NamedLambdaVariable), _))
        if x.exprId == ax.exprId && y.exprId == ay.exprId &&
          isFloatArray(a) && isFloatArray(b) => Some((a, b))
      case _ => None
    }
  }

  private def isNumArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** A lambda operand, possibly widened: `x` or `CAST(x AS DOUBLE)` —
    * the optimizer elides the cast on double-element arrays, so both
    * spellings of the same portable fold must match. */
  private object Operand {
    def unapply(e: Expression): Option[NamedLambdaVariable] = e match {
      case v: NamedLambdaVariable => Some(v)
      case Cast(v: NamedLambdaVariable, DoubleType, _, _) => Some(v)
      case _ => None
    }
  }

  /** Matches zip_with(a, b, (x, y) -> x * y) over any float/double array
    * combination (operands possibly cast-widened). */
  private object PairwiseProductAny {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ZipWith(a, b,
        LambdaFunction(Multiply(Operand(x), Operand(y), _),
          Seq(ax: NamedLambdaVariable, ay: NamedLambdaVariable), _))
        if x.exprId == ax.exprId && y.exprId == ay.exprId &&
          isNumArray(a) && isNumArray(b) => Some((a, b))
      case _ => None
    }
  }

  /** Matches zip_with(a, b, (x, y) -> (x - y) * (x - y)) — the portable
    * squared-L2 fold — over any float/double array combination. */
  private object PairwiseDistSq {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ZipWith(a, b,
        LambdaFunction(
          Multiply(Subtract(Operand(x1), Operand(y1), _),
                   Subtract(Operand(x2), Operand(y2), _), _),
          Seq(ax: NamedLambdaVariable, ay: NamedLambdaVariable), _))
        if x1.exprId == ax.exprId && x2.exprId == ax.exprId &&
          y1.exprId == ay.exprId && y2.exprId == ay.exprId &&
          isNumArray(a) && isNumArray(b) => Some((a, b))
      case _ => None
    }
  }

  private object SumFold {
    /** Matches the (0.0, (acc, v) -> acc + v, identity) aggregate shape. */
    def unapply(agg: ArrayAggregate): Option[Expression] = agg match {
      case ArrayAggregate(arg, Literal(0.0, DoubleType),
        LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _),
          Seq(aacc: NamedLambdaVariable, av: NamedLambdaVariable), _),
        LambdaFunction(fin: NamedLambdaVariable, Seq(fa: NamedLambdaVariable), _))
        if acc.exprId == aacc.exprId && v.exprId == av.exprId &&
          fin.exprId == fa.exprId => Some(arg)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg: ArrayAggregate =>
        agg match {
          case SumFold(PairwiseProduct(a, b)) => DotProductF(a, b)
          case SumFold(PairwiseProductAny(a, b)) => graft.functions.DotA(a, b)
          case SumFold(PairwiseDistSq(a, b)) => graft.functions.DistSqA(a, b)
          case _ => agg
        }
    }
}

/** Session extensions entry point:
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteDotProduct)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // library-level registration of the bounded top-k aggregate, so
    // extension-configured sessions get `smallest_k` in SQL without the
    // per-query temp-function hook (AggExpressions.register).
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("smallest_k"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.SmallestK].getName, "smallest_k"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.SmallestK(exprs.head, exprs(1))))
    // generalized codegen folds (mixed float/double arrays) — the k-means
    // tier's hot path; RewriteDotProduct's float-only pattern can't catch
    // these, so they're first-class functions instead
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("dot_a"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.DotA].getName, "dot_a"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.DotA(exprs.head, exprs(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("dist_sq_a"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.DistSqA].getName, "dist_sq_a"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.DistSqA(exprs.head, exprs(1))))
  }
}
