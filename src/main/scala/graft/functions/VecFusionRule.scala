package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Kernel-fusion optimizer rule: rewrites the idiomatic higher-order-
  * function dot product / norm over `array<float>` columns,
  *
  * {{{
  *   aggregate(zip_with(transform(a, _.cast(double)),
  *                      transform(b, _.cast(double)), _ * _), 0.0, _ + _)
  *   sqrt(aggregate(transform(transform(a, _.cast(double)), x => x*x),
  *                  0.0, _ + _))
  * }}}
  *
  * into the codegen'd [[VecDot]]/[[VecNorm]] kernels. The two forms are
  * bit-identical by construction — both accumulate left-to-right in
  * double after per-element float→double widening, and both null out on
  * null elements or length mismatch (FunctionsSpec pins the
  * equivalence; the DuckDB oracle pins both against a third engine) —
  * so the rewrite is purely physical: one static call per row inside
  * whole-stage codegen instead of per-element interpreted lambdas.
  *
  * Users who write the declarative HOF form get kernel speed without
  * knowing the kernels exist — the Catalyst way: declare the intent,
  * let a rule pick the implementation. Injected by [[GraftExtensions]]
  * (`injectOptimizerRule`) and by [[GraftFunctions.register]] via
  * `spark.experimental.extraOptimizations` for pre-existing sessions.
  */
object VecFusionRule extends Rule[LogicalPlan] {

  /** `transform(arr, x -> cast(x as double))` over array<float> → arr */
  private object DoubledFloatArray {
    def unapply(e: Expression): Option[Expression] = e match {
      case t: ArrayTransform =>
        (t.argument.dataType, t.function) match {
          case (ArrayType(FloatType, _),
              LambdaFunction(c: Cast, Seq(v: NamedLambdaVariable), _))
            if c.dataType == DoubleType &&
              c.child.isInstanceOf[NamedLambdaVariable] &&
              c.child.asInstanceOf[NamedLambdaVariable].exprId == v.exprId =>
            Some(t.argument)
          case _ => None
        }
      case _ => None
    }
  }

  /** `(l, r) -> l * r` with both operands being the lambda's own
    * variables, in declaration order. */
  private def isPairwiseMultiply(f: Expression): Boolean = f match {
    case LambdaFunction(m: Multiply,
        Seq(l: NamedLambdaVariable, r: NamedLambdaVariable), _) =>
      (m.left, m.right) match {
        case (ml: NamedLambdaVariable, mr: NamedLambdaVariable) =>
          ml.exprId == l.exprId && mr.exprId == r.exprId
        case _ => false
      }
    case _ => false
  }

  /** `x -> x * x` squaring lambda. */
  private def isSquare(f: Expression): Boolean = f match {
    case LambdaFunction(m: Multiply, Seq(v: NamedLambdaVariable), _) =>
      (m.left, m.right) match {
        case (ml: NamedLambdaVariable, mr: NamedLambdaVariable) =>
          ml.exprId == v.exprId && mr.exprId == v.exprId
        case _ => false
      }
    case _ => false
  }

  /** `(acc, x) -> acc + x` merge lambda. */
  private def isSumMerge(f: Expression): Boolean = f match {
    case LambdaFunction(a: Add,
        Seq(acc: NamedLambdaVariable, x: NamedLambdaVariable), _) =>
      (a.left, a.right) match {
        case (al: NamedLambdaVariable, ar: NamedLambdaVariable) =>
          al.exprId == acc.exprId && ar.exprId == x.exprId
        case _ => false
      }
    case _ => false
  }

  /** identity finish lambda `acc -> acc`. */
  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable,
        Seq(d: NamedLambdaVariable), _) => v.exprId == d.exprId
    case _ => false
  }

  private def isZeroD(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case _ => false
  }

  /** sum-fold over an array expression: aggregate(arr, 0.0, _+_). */
  private object SumFold {
    def unapply(e: Expression): Option[Expression] = e match {
      case agg: ArrayAggregate
        if isZeroD(agg.zero) && isSumMerge(agg.merge) &&
          isIdentity(agg.finish) => Some(agg.argument)
      case _ => None
    }
  }

  /** Full dot pattern → the two raw float-array operands. */
  private object DotPattern {
    def unapply(e: Expression): Option[(Expression, Expression)] =
      e match {
        case SumFold(z: ZipWith) if isPairwiseMultiply(z.function) =>
          (z.left, z.right) match {
            case (DoubledFloatArray(a), DoubledFloatArray(b)) =>
              Some((a, b))
            case _ => None
          }
        case _ => None
      }
  }

  /** Full norm pattern → the raw float-array operand. */
  private object NormPattern {
    def unapply(e: Expression): Option[Expression] = e match {
      case s: Sqrt => s.child match {
        case SumFold(t: ArrayTransform) if isSquare(t.function) =>
          t.argument match {
            case DoubledFloatArray(a) => Some(a)
            case _ => None
          }
        case _ => None
      }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotPattern(a, b) => VecDot(a, b)
      case NormPattern(a) => VecNorm(a)
    }
}
