package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Guardrail `Rule[LogicalPlan]`: fail FAST on unconditioned cross joins.
  *
  * At 100 TB a cartesian product is almost never survivable — it is the
  * single most common way an analyst query takes down a shared cluster,
  * and it fails SLOWLY: the job runs for hours shuffling n·m rows before
  * anyone notices. Spark's own `spark.sql.crossJoin.enabled` safety was
  * removed in 3.x, so the platform default is "allowed, silently". With
  * `spark.graft.failOnCartesian=true` this rule throws AT PLANNING TIME
  * instead — seconds, not hours, with the offending join in the message.
  *
  * Deliberately ALLOWED even when enabled:
  *  - joins with any condition (equi or not — a non-equi condition is a
  *    range/interval join, which the binned operators handle; only the
  *    fully unconditioned product is the footgun this guards), and
  *  - explicitly broadcast-hinted products: `df.join(broadcast(tiny),
  *    lit(true))` is the engine's own bounded-cohort scoring pattern
  *    (mutualNearest, hardNegatives) — the hint is the caller saying
  *    "one side is small by construction", which is exactly the claim
  *    the guard exists to extract.
  *
  * Injected by [[graft.GraftExtensions]] into the user-provided
  * optimizer batch — hints are resolved onto `Join.hint` by then, and a
  * throwing rule costs nothing when the flag is off (one conf read). */
object CartesianGuard extends Rule[LogicalPlan] {
  val ConfKey = "spark.graft.failOnCartesian"

  private def broadcastHinted(j: Join): Boolean =
    j.hint.leftHint.exists(_.strategy.isDefined) ||
      j.hint.rightHint.exists(_.strategy.isDefined)

  /** A join is a product when it has NO condition or a trivially-true
    * one: no optimizer rule folds `ON true` to None, so `join(df,
    * lit(true))` would otherwise slip the guard and run the n·m
    * nested loop anyway. A CONDITIONED Cross-typed join is deliberately
    * allowed — `crossJoin(b).where(a.x === b.y)` keeps joinType Cross
    * after predicate pushdown but plans as an ordinary equi join. */
  private def unconditioned(j: Join): Boolean = j.condition match {
    case None => true
    case Some(c) => c.foldable && (c.eval() match {
      case b: java.lang.Boolean => b.booleanValue
      case _ => false
    })
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(ConfKey, "false").toBoolean) {
      plan.foreach {
        case j: Join if unconditioned(j) && !broadcastHinted(j) =>
          throw new IllegalStateException(
            s"$ConfKey: unconditioned ${j.joinType} join (cartesian product) " +
              s"between ${j.left.nodeName} and ${j.right.nodeName}. A cartesian " +
              "at cluster scale fails slowly; this guard fails it at planning " +
              "time. Add a join condition, broadcast() the provably-small side, " +
              s"or set $ConfKey=false for this session.")
        case _ =>
      }
    }
    plan
  }
}
