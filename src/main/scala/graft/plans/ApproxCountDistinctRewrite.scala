package graft.plans

import graft.expr.KmvSketchAgg
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Floor, GetStructField}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{LongType, StringType}

/** Opt-in approximate-query-processing rewrite: when
  * `spark.graft.approxCountDistinct` is true, every
  * `COUNT(DISTINCT col)` in an aggregation is replaced by the KMV
  * sketch estimate (`graft.expr.KmvSketchAgg`, k from
  * `spark.graft.approxCountDistinct.k`, default 64), floored back to
  * BIGINT so the aggregate's schema is unchanged.
  *
  * Why: at 100 TB an exact distinct count forces a shuffle of every
  * distinct value per group; the sketch ships ≤ k longs per group per
  * partition and is deterministic (md5-ordered k-minima), so the
  * answer is reproducible run-to-run and engine-to-engine — unlike
  * HLL-based `approx_count_distinct`. The rewrite is strictly opt-in
  * (conf default false) and value-preserving below k distinct values
  * (the sketch is exact there by construction).
  *
  * This is the engine's tier-(c) surface — a `Rule[LogicalPlan]`
  * users can inject either through `GraftExtensions`
  * (spark.sql.extensions) or per-session via
  * `spark.experimental.extraOptimizations` (wired by `Graft.tune`, so
  * it works on any session). Type discipline: COUNT DISTINCT yields
  * BIGINT non-null; `floor(estimate)::bigint` does too, so downstream
  * operators resolve identically and the rewrite is legal
  * post-analysis.
  */
object ApproxCountDistinctRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.approxCountDistinct"
  val ConfK = "spark.graft.approxCountDistinct.k"

  private def enabled: Boolean =
    SQLConf.get.getConfString(ConfKey, "false").toBoolean
  private def k: Int = SQLConf.get.getConfString(ConfK, "64").toInt

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(
              Count(Seq(child)), Complete, true, _, _) =>
            // optimizer rules bypass ResolveTimeZone, so the injected
            // Cast must carry the session zone itself — timestamp
            // children would otherwise hit timeZoneId.get at runtime
            val sketch = ae.copy(
              aggregateFunction = KmvSketchAgg(
                Cast(child, StringType,
                  Some(SQLConf.get.sessionLocalTimeZone)), k),
              isDistinct = false)
            // struct field 1 = kmv_estimate; floor → BIGINT preserves
            // COUNT DISTINCT's type (and its exactness below k)
            Cast(Floor(GetStructField(sketch, 1, Some("kmv_estimate"))),
              LongType)
        }
    }
}
