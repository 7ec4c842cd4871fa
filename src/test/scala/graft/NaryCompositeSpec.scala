package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.queries.{IvfModel, TextOps}

/** N-ary composite filtered ANN — the declared-attribute generalization
  * of the t52 family, driven at a THREE-attribute conjunction
  * (categorical label, binned-numeric n_chars, categorical-string lang)
  * through [[TextOps.compositeFilteredTopKOf]]. Pins: the same
  * pushed-scan plan shape as t52 (partition-pruned list scan with ALL
  * conjuncts pushed to the parquet reader), both crossover branches
  * against exact references, the registered conjunction dispatching on
  * its EXACT persisted survivor count, the independence fallback for an
  * unregistered predicate, and that a non-default declared set lands in
  * its own suffixed tables (never clobbering the t52 deployment's).
  */
class NaryCompositeSpec extends SparkTestBase {

  import graft.functions.{Rounding => R, VectorOps => V}

  private def attrs3: Seq[IvfModel.CompAttr] =
    IvfModel.DefaultCompAttrs :+ IvfModel.CatAttr("lang", StringType,
      (s, dir) => graft.core.Tables.documents(s, dir)
        .select(col("doc_id").as("vec_id"), col("lang")))

  private val preds3: Seq[IvfModel.CompPred] = Seq(
    IvfModel.CatEq("label", TextOps.FilterLabel),
    IvfModel.RangeGe("n_chars", 100L),
    IvfModel.CatEq("lang", "en"))

  private def universe3 = {
    val emb = graft.core.Tables.embeddings(spark, sf())
      .select(col("vec_id"), V.toDouble(col("embedding")).as("emb"), col("label"))
    val docs = graft.core.Tables.documents(spark, sf())
      .select(col("doc_id").as("vec_id"), col("n_chars"), col("lang"))
    emb.join(docs, Seq("vec_id"))
  }

  private def pred3Col = preds3.map(_.condition).reduce(_ && _)

  private def brute3 = {
    val u = universe3
    val queries = u.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    u.filter(pred3Col)
      .crossJoin(queries).filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        R.halfUp(V.cosine(col("q_emb"), col("emb")), 6).as("cosine"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= 5)
  }

  test("3-attr conjunction holds on every probe hit; brute branch == exact composite top-5") {
    val probed = TextOps.compositeFilteredTopKOf(spark, sf(), preds3, attrs3, bruteFloor = 0)
    val bad = probed.join(universe3.select(col("vec_id"), col("label"), col("n_chars"), col("lang")),
        Seq("vec_id"))
      .filter(!(col("label") === TextOps.FilterLabel &&
        col("n_chars") >= 100L && col("lang") === "en")).count()
    assert(bad === 0, "3-attr probe returned a candidate outside the conjunction")
    val brute = TextOps.compositeFilteredTopKOf(spark, sf(), preds3, attrs3,
        bruteFloor = Long.MaxValue)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = brute3
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute === expect, "below the floor, the N-ary crossover must be the exact composite top-5")
  }

  test("3-attr list scan is partition-pruned, all three predicates pushed, tables suffixed") {
    val table = IvfModel.compTableFor(IvfModel.CompAttrListsTable, attrs3)
    assert(table !== IvfModel.CompAttrListsTable,
      "non-default declared set must land in its own suffixed table")
    val df = TextOps.compositeFilteredTopKOf(spark, sf(), preds3, attrs3, bruteFloor = 0)
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains(table)) => s
    }
    assert(scans.nonEmpty, "probe does not scan the 3-attr composite list table")
    assert(scans.exists(_.partitionFilters.nonEmpty),
      "3-attr list scan carries no partition filters — the probe reads every cell")
    for (attr <- Seq("label", "n_chars", "lang"))
      assert(scans.exists(_.dataFilters.exists(_.references.exists(_.name == attr))),
        s"$attr predicate did not reach the list scan — candidates are filtered post-read")
    // and the default deployment's table is untouched by the 3-attr build:
    // the t52 lists keep their own name and schema
    assert(IvfModel.compAttrLists(spark, sf()).columns.toSeq ===
      Seq("vec_id", "emb", "label", "n_chars", "cluster"))
  }

  test("registered 3-attr conjunction dispatches on its exact survivor count; fallback stays conservative") {
    IvfModel.ensureCompAttrLists(spark, sf(), attrs = attrs3, registered = Seq(preds3))
    val lists = IvfModel.compAttrLists(spark, sf(), attrs3)
    val live = lists.filter(pred3Col).count()
    assert(live > 0, "fixture broken: no survivors at the 3-attr predicate")
    val bound = IvfModel.compSurvivorBoundOf(spark, sf(), preds3, attrs3, Seq(preds3))
    assert(bound === live,
      "registered 3-attr predicate did not dispatch on its exact persisted count")

    // an UNREGISTERED predicate over the same generation falls back to the
    // min-over-attributes independence bound: conservative (>= true), and
    // capped by each categorical conjunct's own exact count
    val other: Seq[IvfModel.CompPred] = Seq(
      IvfModel.CatEq("label", TextOps.FilterLabel),
      IvfModel.RangeGe("n_chars", 128L),
      IvfModel.CatEq("lang", "en"))
    val otherBound = IvfModel.compSurvivorBoundOf(spark, sf(), other, attrs3, Seq(preds3))
    val otherLive = lists.filter(other.map(_.condition).reduce(_ && _)).count()
    val langN = lists.filter(col("lang") === "en").count()
    val labelN = lists.filter(col("label") === TextOps.FilterLabel).count()
    assert(otherBound >= otherLive, "independence fallback under-counts — unsafe dispatch")
    assert(otherBound <= math.min(langN, labelN),
      "fallback looser than a categorical conjunct's exact count — stats not consulted")

    // RangeLt bounds from the same histogram (bin-aligned boundary → exact)
    val ltBound = IvfModel.compSurvivorBoundOf(spark, sf(),
      Seq(IvfModel.RangeLt("n_chars", 256L)), attrs3, Seq(preds3))
    val ltLive = lists.filter(col("n_chars") < 256L).count()
    assert(ltBound === ltLive, "bin-aligned RangeLt histogram bound should be exact")

    // an undeclared attribute is a declaration error, not a silent zero
    assertThrows[IllegalArgumentException] {
      IvfModel.compSurvivorBoundOf(spark, sf(),
        Seq(IvfModel.CatEq("source", "web")), attrs3, Seq(preds3))
    }
  }
}
