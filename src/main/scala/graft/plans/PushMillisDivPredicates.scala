package graft.plans

import java.time.ZoneOffset

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Optimizer rule: rewrite comparisons on the DERIVED epoch-ms column into
  * range predicates on the raw stored time column, so they reach parquet
  * `PushedFilters` and prune row groups.
  *
  * [[graft.operators.TsOps]] does this rewrite by hand for the operator
  * API; this rule extends it to free-form SQL over the `ts` view
  * (`SELECT ... FROM ts WHERE t >= X`), where users write predicates
  * against `t` — a derived shape the parquet reader cannot translate.
  *
  * Two derived shapes exist, one per reading of the parquet
  * TIMESTAMP(NANOS) column (see [[graft.model.TimeCols]]):
  *
  * '''Epoch-ns long''' (`nanosAsLong` readers): `t = ts div 1000000`.
  * Spark's `div` is TRUNCATING integer division; for a literal bound
  * `v >= 1` the rewrites below are exact for ALL inputs including negative
  * timestamps (truncation and floor differ only below zero, which `v >= 1`
  * excludes from both sides):
  *   trunc(ts/M) >= v  <=>  ts >= v*M
  *   trunc(ts/M) >  v  <=>  ts >= (v+1)*M
  *   trunc(ts/M) <  v  <=>  ts <  v*M
  *   trunc(ts/M) <= v  <=>  ts <  (v+1)*M
  *   trunc(ts/M) ==  v <=>  ts >= v*M AND ts < (v+1)*M
  * Bounds with `v < 1` or near Long overflow are left untouched.
  *
  * '''Timestamp_ntz''' (the shipped Spark 4.1.2):
  * `t = unix_millis(cast(ts as timestamp))`. `unix_millis` FLOOR-divides
  * internal micros by 1000, so with `us` the ntz column's micros value:
  *   floor(us/1000) >= v  <=>  us >= v*1000
  *   floor(us/1000) >  v  <=>  us >= (v+1)*1000
  *   floor(us/1000) <  v  <=>  us <  v*1000
  *   floor(us/1000) <= v  <=>  us <  (v+1)*1000
  *   floor(us/1000) == v  <=>  v*1000 <= us < (v+1)*1000
  * exact for ALL v (floor, not trunc). The ntz→ltz cast is the identity
  * on internal micros only under a fixed zero-offset session zone, so the
  * rewrite fires only when the cast's resolved timezone normalizes to
  * UTC — every session in this engine pins UTC.
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

  private def isUtc(tz: Option[String]): Boolean =
    try java.time.ZoneId.of(tz.getOrElse(conf.sessionLocalTimeZone))
      .normalized() == ZoneOffset.UTC
    catch { case _: java.time.DateTimeException => false }

  /** `unix_millis(cast(<ntz> as timestamp))` under a UTC session. */
  private object NtzMs {
    def unapply(e: Expression): Option[Expression] = e match {
      case UnixMillis(Cast(ts, TimestampType, tz, _))
          if ts.dataType == TimestampNTZType && isUtc(tz) => Some(ts)
      case _ => None
    }
  }

  /** Millisecond literal bound safe to scale to micros. */
  private object MsBound {
    private val Max = Long.MaxValue / 1000L - 2
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) if v >= -Max && v <= Max => Some(v)
      case _ => None
    }
  }

  private def ntz(us: Long): Literal = Literal(us, TimestampNTZType)

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

    // ntz reading: unix_millis(cast(ts)) cmp v  ->  ts cmp ntz-micros bound
    case GreaterThanOrEqual(NtzMs(ts), MsBound(v)) => GreaterThanOrEqual(ts, ntz(v * 1000L))
    case GreaterThan(NtzMs(ts), MsBound(v))        => GreaterThanOrEqual(ts, ntz((v + 1) * 1000L))
    case LessThan(NtzMs(ts), MsBound(v))           => LessThan(ts, ntz(v * 1000L))
    case LessThanOrEqual(NtzMs(ts), MsBound(v))    => LessThan(ts, ntz((v + 1) * 1000L))
    case EqualTo(NtzMs(ts), MsBound(v)) =>
      And(GreaterThanOrEqual(ts, ntz(v * 1000L)), LessThan(ts, ntz((v + 1) * 1000L)))
    case GreaterThanOrEqual(MsBound(v), NtzMs(ts)) => LessThan(ts, ntz((v + 1) * 1000L))
    case GreaterThan(MsBound(v), NtzMs(ts))        => LessThan(ts, ntz(v * 1000L))
    case LessThan(MsBound(v), NtzMs(ts))           => GreaterThanOrEqual(ts, ntz((v + 1) * 1000L))
    case LessThanOrEqual(MsBound(v), NtzMs(ts))    => GreaterThanOrEqual(ts, ntz(v * 1000L))
  }
}
