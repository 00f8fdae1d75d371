package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Pushdown enabler for the nanosecond-timestamp ingest path.
  *
  * `events.ts` arrives as raw int64 nanos (see [[graft.Tables.load]]) and
  * is converted with `timestamp_micros(ts div 1000)`. A predicate written
  * against the converted column —
  * `timestamp_micros(ts div 1000) >= TIMESTAMP '…'` — cannot reach the
  * parquet scan: the conversion sits between the filter and the relation,
  * so at scale the scan decodes every row before filtering.
  *
  * This rule rewrites such comparisons into equivalent raw-long
  * comparisons (`ts >= nanos(…)`), which are scan-eligible. Truncating
  * division makes the bounds exact for non-negative epochs:
  *   ts div 1000 >= m  ⇔  ts >= m*1000
  *   ts div 1000 >  m  ⇔  ts >= (m+1)*1000
  *   ts div 1000 <= m  ⇔  ts <  (m+1)*1000
  *   ts div 1000 <  m  ⇔  ts <  m*1000
  *   ts div 1000 =  m  ⇔  m*1000 <= ts < (m+1)*1000
  * Rewrites are guarded to positive-epoch literals (m > 0) where those
  * equivalences hold under truncation, and to multiplications that cannot
  * overflow. Registered via `spark.experimental.extraOptimizations`
  * (runs after filters have been pushed through the conversion Project,
  * so the matched Filter sits directly on the relation).
  */
object NanoTsFilterPushdown extends Rule[LogicalPlan] {

  private val MaxMicros = Long.MaxValue / 1000 - 1

  // matches timestamp_micros(<long expr> div 1000)
  private object ConvertedTs {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(IntegralDivide(child, Literal(1000L, LongType), _))
          if child.dataType == LongType =>
        Some(child)
      case _ => None
    }
  }

  private object TsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(m: Long, TimestampType) if m > 0 && m < MaxMicros => Some(m)
      case _ => None
    }
  }

  private def nanos(m: Long): Literal = Literal(m * 1000L, LongType)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GreaterThanOrEqual(ConvertedTs(ts), TsLit(m)) => GreaterThanOrEqual(ts, nanos(m))
      case GreaterThan(ConvertedTs(ts), TsLit(m)) => GreaterThanOrEqual(ts, nanos(m + 1))
      case LessThanOrEqual(ConvertedTs(ts), TsLit(m)) => LessThan(ts, nanos(m + 1))
      case LessThan(ConvertedTs(ts), TsLit(m)) => LessThan(ts, nanos(m))
      case EqualTo(ConvertedTs(ts), TsLit(m)) =>
        And(GreaterThanOrEqual(ts, nanos(m)), LessThan(ts, nanos(m + 1)))
      // mirrored literal-first forms
      case GreaterThanOrEqual(TsLit(m), ConvertedTs(ts)) => LessThan(ts, nanos(m + 1))
      case GreaterThan(TsLit(m), ConvertedTs(ts)) => LessThan(ts, nanos(m))
      case LessThanOrEqual(TsLit(m), ConvertedTs(ts)) => GreaterThanOrEqual(ts, nanos(m))
      case LessThan(TsLit(m), ConvertedTs(ts)) => GreaterThanOrEqual(ts, nanos(m + 1))
    }
}
