package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite comparisons on the DERIVED epoch-ms column
  * (`ts div 1000000`) into range predicates on the raw nanosecond column,
  * so they reach parquet `PushedFilters` and prune row groups.
  *
  * [[graft.operators.TsOps]] does this rewrite by hand for the operator
  * API; this rule extends it to free-form SQL over the `ts` view
  * (`SELECT ... FROM ts WHERE t >= X`), where users write predicates
  * against `t` and Catalyst pushes `(ts div 1000000) >= X` down to the
  * scan — a shape the parquet reader cannot translate.
  *
  * Exactness: Spark's `div` is TRUNCATING integer division. For a literal
  * bound `v >= 1` the rewrites below are exact for ALL inputs including
  * negative timestamps (truncation and floor differ only below zero, which
  * `v >= 1` excludes from both sides):
  *   trunc(ts/M) >= v  <=>  ts >= v*M
  *   trunc(ts/M) >  v  <=>  ts >= (v+1)*M
  *   trunc(ts/M) <  v  <=>  ts <  v*M
  *   trunc(ts/M) <= v  <=>  ts <  (v+1)*M
  *   trunc(ts/M) ==  v <=>  ts >= v*M AND ts < (v+1)*M
  * Bounds with `v < 1` or near Long overflow are left untouched.
  */
object PushMillisDivPredicates extends Rule[LogicalPlan] {

  private val M = 1000000L
  // (v+1)*M must not overflow
  private val MaxV = Long.MaxValue / M - 2

  private object MsDiv {
    def unapply(e: Expression): Option[Expression] = e match {
      case IntegralDivide(child, Literal(M, LongType), _) if child.dataType == LongType =>
        Some(child)
      case _ => None
    }
  }

  private object Bound {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) if v >= 1L && v <= MaxV => Some(v)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case GreaterThanOrEqual(MsDiv(ts), Bound(v)) => GreaterThanOrEqual(ts, Literal(v * M))
    case GreaterThan(MsDiv(ts), Bound(v))        => GreaterThanOrEqual(ts, Literal((v + 1) * M))
    case LessThan(MsDiv(ts), Bound(v))           => LessThan(ts, Literal(v * M))
    case LessThanOrEqual(MsDiv(ts), Bound(v))    => LessThan(ts, Literal((v + 1) * M))
    case EqualTo(MsDiv(ts), Bound(v)) =>
      And(GreaterThanOrEqual(ts, Literal(v * M)), LessThan(ts, Literal((v + 1) * M)))
    // flipped operand order (literal on the left)
    case GreaterThanOrEqual(Bound(v), MsDiv(ts)) => LessThan(ts, Literal((v + 1) * M))
    case GreaterThan(Bound(v), MsDiv(ts))        => LessThan(ts, Literal(v * M))
    case LessThan(Bound(v), MsDiv(ts))           => GreaterThanOrEqual(ts, Literal((v + 1) * M))
    case LessThanOrEqual(Bound(v), MsDiv(ts))    => GreaterThanOrEqual(ts, Literal(v * M))
  }
}
