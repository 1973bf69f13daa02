package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, MaxBy}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import graft.functions.NativeExpressions.ArgMaxByOrd

/** Catalyst optimizer rule: rewrite the built-in `max_by(value, ord)`
  * aggregate into graft's ArgMaxByOrd.
  *
  * Why: MaxBy is a DeclarativeAggregate whose buffer holds the ordering
  * value as an untyped field, so HashAggregateExec rejects it and the
  * whole aggregation silently falls back to SortAggregate — a full sort
  * of EVERY partition of the input before the partial agg. At 100 TB
  * that sort is the difference between a one-pass shuffle-light fold and
  * a cluster-wide sort. ArgMaxByOrd is a TypedImperativeAggregate, which
  * plans under ObjectHashAggregateExec: hash-based, partial-aggregating,
  * no sorts (see EventsQueries.latestState, which uses it directly —
  * this rule extends the same fix to any PLAIN `max_by` a library user
  * writes).
  *
  * Semantics preserved: both implementations ignore rows with a null
  * ordering and keep the first-encountered winner on ties. The rewrite
  * fires only for the buffer-copyable types ArgMaxByOrd supports, and
  * only inside Aggregate nodes (window frames sort anyway — nothing to
  * win there). `min_by` is NOT rewritten: inverting an ordering is
  * type-fragile (string orderings can't negate; -0.0/NaN flip subtly).
  *
  * Registered via `spark.experimental.extraOptimizations` in
  * GraftSession.ensureRuntimeConfs — runtime-settable, so it self-heals
  * onto vanilla sessions exactly like the nanosAsLong conf.
  */
object RewriteMaxBy extends Rule[LogicalPlan] {

  private def supported(dt: DataType): Boolean = dt match {
    case LongType | DoubleType | IntegerType | StringType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate =>
      agg.transformExpressions {
        case ae @ AggregateExpression(MaxBy(v, o), _, false, _, _)
            if supported(v.dataType) && supported(o.dataType) =>
          ae.copy(aggregateFunction = ArgMaxByOrd(v, Seq(o)))
      }
  }
}
