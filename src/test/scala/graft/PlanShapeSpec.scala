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

  // These specs assert the UNCACHED plan shape. Another suite may have
  // populated the shared cosine pair cache, whose persisted frame Spark's
  // CacheManager would substitute (InMemoryRelation) into any matching
  // fresh plan — dropping the join nodes these tests inspect.
  private def coldT15() = {
    TextOps.invalidatePairCache()
    TextOps.t15CosineNearDup(spark, sf())
  }

  test("t15 candidate generation is an equi hash join, never cartesian") {
    val plan = coldT15().queryExecution.sparkPlan
    val nodes = collectPlan(plan)
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "t15 plan contains a cartesian product")
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "t15 plan contains a nested-loop join")
    // the guard's oversized-codes anti-join broadcasts (≤ 2^bits rows);
    // the candidate join itself is shuffle-hash (broadcast-trap pin)
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "t15 skew-guard anti-join is not a broadcast hash join")
    assert(nodes.exists(_.isInstanceOf[org.apache.spark.sql.execution.joins.ShuffledHashJoinExec]),
      "t15 candidate join is not a shuffle-hash join")
  }

  test("t15 pair filter (vec_a < vec_b) evaluates inside the join, not after") {
    // as a join condition it prunes rows during probe; as a post-join
    // filter every candidate materializes first (the candidate join is
    // shuffle-hash since the broadcast-trap pin; the remaining broadcast
    // joins are the guard's anti-join, which rightly has no condition)
    val plan = coldT15().queryExecution.sparkPlan
    val shj = plan.collectFirst {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(shj.nonEmpty, "candidate join is not shuffle-hash")
    assert(shj.get.condition.nonEmpty,
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
      val plan = coldT15().queryExecution.executedPlan
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

  // ---- no corpus-derived side may sit under a BroadcastExchange ----
  // Generate (explode) keeps its child's size estimate, so the planner
  // cannot see explosion factors and happily elects an exploded
  // corpus-derived frame for broadcast: measured OOM at the sf1.0
  // rehearsal the moment corpus × masks outgrew the driver heap
  // (SCALE.md round 10). These pins hold the fix: banded self-joins and
  // wide-code probe joins are shuffle-hash, and nothing downstream of a
  // Generate is ever the build side of a broadcast.

  private def broadcastOverGenerate(p: SparkPlan): Seq[SparkPlan] =
    p.collect {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
        if b.collectFirst { case g: org.apache.spark.sql.execution.GenerateExec => g }.nonEmpty => b
    }

  test("t15 at a wide-code dial auto-switches to narrow probe + shuffle-hash") {
    TextOps.invalidatePairCache()
    // 10-bit codes, radius 4 → 386 masks > NarrowProbeMaskThreshold
    val plan = TextOps.t15CosineNearDup(spark, sf(), 10, TextOps.PairRadius)
      .queryExecution.sparkPlan
    assert(plan.collectFirst {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }.nonEmpty, "wide-dial candidate join is not shuffle-hash")
    assert(broadcastOverGenerate(plan).isEmpty,
      "an exploded (corpus × masks) frame sits under a BroadcastExchange")
    TextOps.invalidatePairCache()
  }

  test("embedding INCREMENT pair join never broadcasts the exploded probe side past the budget") {
    // the round-11 sf1.0 decade run at bits=10 OOM'd the driver here:
    // t15's own pin (previous test) did not cover EmbIndex's increment
    // path, whose batch × 386-mask probe frame sat under a Generate and
    // got elected for broadcast. Past ProbeBroadcastMaxBytes (forced
    // here with budget 0 — the production regime, where batch × masks
    // does not fit) the increment must carry the narrow-probe +
    // shuffle-hash shape with no Generate-hidden broadcast.
    import graft.queries.EmbIndex
    import org.apache.spark.sql.functions.col
    val emb = graft.core.Tables.embeddings(spark, sf())
    val idx = EmbIndex.codedOf(emb.filter(col("vec_id") < 250), 10)
    val bat = EmbIndex.codedOf(emb.filter(col("vec_id") >= 250), 10)
    val plan = EmbIndex.incrementCosinePairsOf(idx, bat, 10, TextOps.PairRadius,
      TextOps.EmbBucketCap, probeBroadcastMaxBytes = 0L).queryExecution.sparkPlan
    assert(plan.collectFirst {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }.nonEmpty, "wide-dial increment pair join is not shuffle-hash")
    assert(broadcastOverGenerate(plan).isEmpty,
      "the increment's exploded (batch × masks) probe frame sits under a BroadcastExchange")
  }

  test("increment pair join strategy is invisible in the results (broadcast vs shuffle-hash)") {
    // under the budget the probe frame broadcasts EXPLICITLY (a small
    // increment against a huge index moves zero corpus bytes); the gate
    // may only change the join strategy, never a row
    import graft.queries.EmbIndex
    import org.apache.spark.sql.functions.col
    val emb = graft.core.Tables.embeddings(spark, sf())
    val idx = EmbIndex.codedOf(emb.filter(col("vec_id") < 250), 10)
    val bat = EmbIndex.codedOf(emb.filter(col("vec_id") >= 250), 10)
    def run(budget: Long) =
      EmbIndex.incrementCosinePairsOf(idx, bat, 10, TextOps.PairRadius,
        TextOps.EmbBucketCap, probeBroadcastMaxBytes = budget)
    assert(run(Long.MaxValue).collect().toSeq == run(0L).collect().toSeq)
  }

  test("t06/t07 banded self-joins never broadcast the exploded corpus side") {
    val docs = graft.core.Tables.documents(spark, sf())
    for (df <- Seq(TextOps.minhashPairsOf(docs), TextOps.simhashPairsOf(docs))) {
      val plan = df.queryExecution.sparkPlan
      assert(plan.collectFirst {
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }.nonEmpty, "banded self-join is not shuffle-hash")
      assert(broadcastOverGenerate(plan).isEmpty,
        "a banded corpus frame sits under a BroadcastExchange")
    }
  }

  test("t08 attaches shingle arrays to pairs via shuffle, never broadcast") {
    TextOps.invalidatePairCache()
    val plan = TextOps.t08NgramJaccard(spark, sf()).queryExecution.sparkPlan
    val shjs = plan.collect {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    // two attach joins (sh_a, sh_b) + the upstream band self-join
    assert(shjs.size >= 2,
      s"expected the two shingle-attach joins as shuffle-hash, found ${shjs.size}")
    TextOps.invalidatePairCache()
  }

  test("t14 IVF assignment is a map-side argmin: no window over an expanded frame") {
    // Round 5's formulation crossJoined every corpus vector with the k
    // centroids and picked the argmin with row_number() over a window
    // partitioned by vec_id — an n×k row expansion pushed through an
    // exchange (k-fold shuffle amplification of the corpus table at
    // 100 TB). The fixed plan scores all k centroids per row inside a
    // single projection (transform + array_min over a 1-row broadcast
    // centroid array), so the ONLY window left is the top-k over the
    // probed candidates, and the only nested-loop join is the 1-row
    // centroid-array attach.
    val plan = TextOps.t14AnnIvf(spark, sf()).queryExecution.sparkPlan
    val nodes = collectPlan(plan)
    val windows = nodes.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.size === 1,
      s"expected exactly the top-k window, found ${windows.size}")
    assert(windows.head.partitionSpec.map(_.sql).exists(_.contains("query_id")),
      "the surviving window must be the per-query top-k, not per-vector assignment")
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "t14 plan contains a cartesian product")
    // the centroid-array attach is the one permitted nested-loop join and
    // its broadcast side is a global (groupless) aggregate — at most 1 row
    nodes.collect { case j: BroadcastNestedLoopJoinExec => j }.foreach { j =>
      val oneRowSide = Seq(j.left, j.right).exists(_.collectFirst {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
          if a.groupingExpressions.isEmpty => a
      }.nonEmpty)
      assert(oneRowSide,
        "nested-loop join whose broadcast side is not the 1-row centroid array")
    }
  }
}
