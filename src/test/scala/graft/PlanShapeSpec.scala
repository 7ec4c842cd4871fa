package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}

import graft.queries.TextOps

/** Plan-shape assertions for the hot pair-generation paths: the things
  * `.explain` review caught once, pinned so they stay caught. A cartesian
  * or nested-loop join sneaking into a candidate-pair query is the
  * difference between probe_fraction × n²/2^bits and a full n² at 100 TB.
  */
class PlanShapeSpec extends SparkTestBase {

  private def collectPlan(p: SparkPlan): Seq[SparkPlan] = p.collect { case n => n }

  test("t15 candidate generation is an equi hash join, never cartesian") {
    val plan = TextOps.t15CosineNearDup(spark, sf()).queryExecution.sparkPlan
    val nodes = collectPlan(plan)
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "t15 plan contains a cartesian product")
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "t15 plan contains a nested-loop join")
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "t15 bucket join is not a broadcast hash join")
  }

  test("t15 pair filter (vec_a < vec_b) evaluates inside the join, not after") {
    // as a join condition it prunes rows during probe; as a post-join
    // filter every candidate materializes first
    val plan = TextOps.t15CosineNearDup(spark, sf()).queryExecution.sparkPlan
    val bhj = plan.collectFirst { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty)
    assert(bhj.get.condition.nonEmpty,
      "vec_a < vec_id was not pushed into the hash join condition")
  }

  test("t15's per-pair cosine projection stays inside whole-stage codegen") {
    // the difference between the native DotProduct kernel and an
    // interpreted formulation measured 105 s vs 5 s at sf0.1 — pin that
    // the hot projection actually compiles (AQE off: WSCG nodes are only
    // visible in the non-adaptive executedPlan)
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = TextOps.t15CosineNearDup(spark, sf()).queryExecution.executedPlan
      val codegenWithDot = plan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec
          if w.toString.contains("dot_product") => w
      }
      assert(codegenWithDot.nonEmpty,
        "per-pair dot_product projection is outside whole-stage codegen")
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }

  test("t06 minhash band join is an equi join (bucketed, not all-pairs)") {
    val plan = TextOps.t06MinhashPairs(spark, sf()).queryExecution.sparkPlan
    val nodes = collectPlan(plan)
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]))
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
  }
}
