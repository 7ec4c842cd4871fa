package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, Expand, Generate, Join, LocalRelation, LogicalPlan, OneRowRelation, Union}
import org.apache.spark.sql.catalyst.plans.logical.UnaryNode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W1/W2 — competition rank with ties, null-measure rows unranked
  * (reference app.py:605-646: rows with no supervisions are excluded from
  * the ranking universe and appended with posicion=None).
  *
  * Scale note: the rank window is unpartitioned, which funnels the ranked
  * set through one task. That is correct here by construction — ranking is
  * only ever applied to aggregated frames whose cardinality is the number
  * of groups/branches (tens to thousands), never to fact rows — and it is
  * ENFORCED, not just documented: the input plan must carry an aggregation
  * (Aggregate/Deduplicate) below the window, a statically bounded row
  * count (`maxRows`, e.g. a LIMIT), or only local-literal leaves. Ranking
  * a raw fact scan throws instead of silently funneling the table through
  * one task.
  */
object Ranking {

  /** Is the plan's OUTPUT cardinality dim-bounded? A recursive check on
    * the root, not an `exists` over the whole tree — a fact scan joined
    * to an aggregated dim contains an Aggregate somewhere below but still
    * outputs fact cardinality, and must be rejected. Bounded roots:
    * aggregation/dedup, a statically known maxRows (LIMIT, literal data),
    * joins/unions of bounded inputs, and cardinality-preserving unary
    * nodes (Project/Filter/Sort/hints/…) over a bounded child; Generate
    * (explode) and Expand (cube/rollup/grouping sets) multiply rows and
    * are excluded — Expand is unreachable as a bounded root in today's
    * analyzed plans (it sits under Aggregate), but the guard must stay
    * conservative if plan shapes change.
    */
  private def dimBounded(plan: LogicalPlan): Boolean = plan match {
    case _: Aggregate | _: Deduplicate => true
    case _ if plan.maxRows.isDefined => true
    case _: LocalRelation | _: OneRowRelation => true
    case j: Join => dimBounded(j.left) && dimBounded(j.right)
    case u: Union => u.children.forall(dimBounded)
    case _: Generate | _: Expand => false
    case u: UnaryNode => dimBounded(u.child)
    case _ => false
  }

  def rankWithNullsUnranked(df: DataFrame, measure: String, out: String = "posicion"): DataFrame = {
    require(dimBounded(df.queryExecution.analyzed),
      "rankWithNullsUnranked input is neither aggregated nor statically bounded — " +
        "an unpartitioned rank window over fact rows funnels the table through one " +
        "task; aggregate (or LIMIT) to dim cardinality first")
    val w = Window.orderBy(col(measure).desc)
    val ranked = df
      .filter(col(measure).isNotNull)
      .withColumn(out, rank().over(w))
    val unranked = df
      .filter(col(measure).isNull)
      .withColumn(out, lit(null).cast("int"))
    ranked.unionByName(unranked)
  }
}
