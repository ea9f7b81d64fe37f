package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Structural fingerprint of a physical plan: the operator counts that a
  * silent planner regression moves — a broadcast flipping to a shuffle
  * join, a new Exchange, a window appearing where a map-side path used to
  * run, a join degenerating to nested-loop. The gate's plan-shape CI
  * (`PlanShapeSpec`) snapshots these per query and asserts CEILINGS, so
  * AQE/stats variance below the recorded shape stays green while a
  * regression above it goes red.
  *
  * Counts come from `queryExecution.executedPlan` — the PREPARED physical
  * plan (after `EnsureRequirements` inserts Exchanges; `sparkPlan` would
  * count none). With AQE on, that plan is an `AdaptiveSparkPlanExec` leaf
  * whose deterministic pre-runtime tree hangs off `initialPlan`; the walk
  * in [[of]] unwraps those wrappers, subqueries included. AQE's runtime
  * re-plan only ever REMOVES work relative to the initial plan (SMJ→BHJ,
  * coalesced partitions), so ceilings asserted on it are sound.
  */
object PlanShape {

  /** One plan's operator counts. Field order is the JSON column order. */
  case class Counts(shuffles: Int, broadcasts: Int, sorts: Int, windows: Int,
                    shuffleJoins: Int, nestedLoops: Int) {
    /** Every count at-or-under the ceiling (the CI predicate). */
    def fitsWithin(c: Counts): Boolean =
      shuffles <= c.shuffles && broadcasts <= c.broadcasts &&
        sorts <= c.sorts && windows <= c.windows &&
        shuffleJoins <= c.shuffleJoins && nestedLoops <= c.nestedLoops
    /** Human-readable diff vs a ceiling, for assertion messages. */
    def overages(c: Counts): Seq[String] = {
      def over(n: String, a: Int, b: Int) =
        if (a > b) Some(s"$n: $a > ceiling $b") else None
      Seq(over("shuffles", shuffles, c.shuffles),
        over("broadcasts", broadcasts, c.broadcasts),
        over("sorts", sorts, c.sorts),
        over("windows", windows, c.windows),
        over("shuffleJoins", shuffleJoins, c.shuffleJoins),
        over("nestedLoops", nestedLoops, c.nestedLoops)).flatten
    }
  }

  /** Count shape-relevant operators in `df`'s prepared physical plan
    * (subqueries included). `shuffleJoins` = sort-merge + shuffled-hash
    * (the shapes a lost broadcast degrades INTO); `nestedLoops` = BNLJ +
    * cartesian (the shapes a lost equi-join degrades into).
    *
    * Exchanges are inserted by the `EnsureRequirements` prepare phase, so
    * counting must run over `executedPlan`, not `sparkPlan` — and with AQE
    * on, `executedPlan` is a leaf `AdaptiveSparkPlanExec` wrapper whose
    * real tree hangs off `initialPlan` (deterministic pre-runtime; never
    * triggers execution). The walk unwraps every adaptive node it meets,
    * including adaptively-planned subqueries. */
  def of(df: DataFrame): Counts = {
    val nodes = allNodes(df.queryExecution.executedPlan)
    def n(pf: PartialFunction[SparkPlan, Unit]): Int = nodes.count(pf.isDefinedAt)
    Counts(
      shuffles = n { case _: ShuffleExchangeExec => () },
      broadcasts = n { case _: BroadcastExchangeExec => () },
      sorts = n { case _: SortExec => () },
      windows = n { case _: WindowExec => () },
      shuffleJoins = n { case _: SortMergeJoinExec => ()
                         case _: ShuffledHashJoinExec => () },
      nestedLoops = n { case _: BroadcastNestedLoopJoinExec => ()
                        case _: CartesianProductExec => () })
  }

  private def allNodes(p: SparkPlan): Seq[SparkPlan] =
    p.collectWithSubqueries { case x => x }.flatMap {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a +: allNodes(a.initialPlan)
      case x => Seq(x)
    }
}
