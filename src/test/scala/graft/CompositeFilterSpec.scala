package graft

import org.apache.spark.sql.functions._

import graft.queries.{IvfModel, TextOps}

/** t52 — composite (multi-attribute, equality + range) filtered ANN and
  * its crossover: the conjunctive generalization of the t49/t50 family.
  * Pins predicate membership, exact cosines, the recall floor vs the
  * composite-filtered brute force, the plan shape (partition-pruned list
  * scan with BOTH predicates pushed to the parquet reader), both
  * crossover branches against their references, and the O(1) jobless
  * dispatch bound's conservativeness (true survivors ≤ bound ≤ each
  * attribute's own count).
  */
class CompositeFilterSpec extends SparkTestBase {

  import graft.functions.{Rounding => R, VectorOps => V}

  private def predicatedUniverse = {
    val emb = graft.core.Tables.embeddings(spark, sf())
      .select(col("vec_id"), V.toDouble(col("embedding")).as("emb"), col("label"))
    val docs = graft.core.Tables.documents(spark, sf())
      .select(col("doc_id").as("vec_id"), col("n_chars"))
    emb.join(docs, Seq("vec_id"))
  }

  private def bruteComposite = {
    val u = predicatedUniverse
    val queries = u.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    u.filter(col("label") === TextOps.FilterLabel &&
        col("n_chars") >= TextOps.FilterMinChars)
      .crossJoin(queries).filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        R.halfUp(V.cosine(col("q_emb"), col("emb")), 6).as("cosine"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= 5)
  }

  test("t52: conjunction holds on every hit, cosines exact, recall floor vs composite brute force") {
    val t52 = TextOps.t52AnnFilteredComposite(spark, sf())
    val bad = t52.join(predicatedUniverse.select(col("vec_id"), col("label"), col("n_chars")),
        Seq("vec_id"))
      .filter(col("label") =!= TextOps.FilterLabel ||
        col("n_chars") < TextOps.FilterMinChars).count()
    assert(bad === 0, "composite probe returned a candidate outside the conjunction")
    val brute = bruteComposite
    val joined = t52.select(col("query_id"), col("vec_id"), col("cosine"))
      .join(brute.select(col("query_id"), col("vec_id"), col("cosine").as("bf")),
        Seq("query_id", "vec_id"))
    assert(joined.filter(col("cosine") =!= col("bf")).count() === 0)
    def pset(df: org.apache.spark.sql.DataFrame) = df.select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (bf, got) = (pset(brute), pset(t52))
    val recall = (bf intersect got).size.toDouble / bf.size
    info(f"composite filtered recall@5 vs composite brute force: $recall%.2f " +
      f"(label=${TextOps.FilterLabel} AND n_chars>=${TextOps.FilterMinChars}, " +
      f"nProbe=${IvfModel.NProbe}/${IvfModel.K})")
    // the conjunction is ~2x more selective than t49's single label, so
    // the same probe fraction covers a thinner universe — the floor the
    // t49 spec pins (0.7) still holds on this corpus
    assert(recall >= 0.7, f"composite filtered recall collapsed: $recall%.2f")
  }

  test("t52: list scan is partition-pruned AND both predicates are pushed to the scan") {
    val df = TextOps.t52AnnFilteredComposite(spark, sf())
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains(IvfModel.CompAttrListsTable)) => s
    }
    assert(scans.nonEmpty, "probe does not scan the composite attributed list table")
    assert(scans.exists(_.partitionFilters.nonEmpty),
      "composite list scan carries no partition filters — the probe reads every cell")
    for (attr <- Seq("label", "n_chars"))
      assert(scans.exists(_.dataFilters.exists(_.references.exists(_.name == attr))),
        s"$attr predicate did not reach the list scan — candidates are filtered post-read")
  }

  test("compositeFilteredTopK crossover: probe branch == t52; brute branch == exact composite top-5") {
    val probed = TextOps.compositeFilteredTopK(spark, sf(), bruteFloor = 0)
      .collect().map(_.toSeq).toSeq
    val t52 = TextOps.t52AnnFilteredComposite(spark, sf()).collect().map(_.toSeq).toSeq
    assert(probed === t52, "above the floor, compositeFilteredTopK must serve exactly the t52 probe")
    val brute = TextOps.compositeFilteredTopK(spark, sf(), bruteFloor = Long.MaxValue)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = bruteComposite
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute === expect, "below the floor, compositeFilteredTopK must be the exact composite top-5")
  }

  test("composite dispatch bound: conservative, tight per attribute, jobless when warm") {
    IvfModel.ensureCompAttrLists(spark, sf())
    val bound = IvfModel.compSurvivorBound(spark, sf(),
      TextOps.FilterLabel, TextOps.FilterMinChars)
    val lists = IvfModel.compAttrLists(spark, sf())
    val live = lists.filter(col("label") === TextOps.FilterLabel &&
      col("n_chars") >= TextOps.FilterMinChars).count()
    val labelN = lists.filter(col("label") === TextOps.FilterLabel).count()
    val rangeN = lists.filter(col("n_chars") >= TextOps.FilterMinChars).count()
    info(s"composite survivors: true=$live bound=$bound label=$labelN range>=$rangeN")
    assert(live > 0, "fixture broken: no composite survivors at the registered predicate")
    // the bound must dominate the true count (safe brute dispatch) and
    // never exceed either attribute's own survivor count (it is a min)
    assert(bound >= live, "dispatch bound under-counts — brute dispatch would mis-fire")
    // the registered conjunction's EXACT survivor count is persisted at
    // build time and preferred over the independence bound — for the
    // served predicate the dispatch statistic IS the true count
    assert(bound === live,
      "registered predicate did not dispatch on its exact persisted survivor count")
    // (the range side may over-count by at most the rows of the one bin
    // straddling the threshold, so only the exact label side is a hard
    // upper cap on the min)
    assert(bound <= labelN, "bound looser than the exact label count — stats not consulted")
    // warm dispatch: zero Spark jobs (same contract as attrLabelCount)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.range(10).toDF().queryExecution.toRdd.count()
      val deadline = System.currentTimeMillis() + 5000
      while (jobs.get() == 0 && System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(jobs.get() > 0, "listener calibration failed — cannot assert joblessness")
      jobs.set(0)
      assert(IvfModel.compSurvivorBound(spark, sf(),
        TextOps.FilterLabel, TextOps.FilterMinChars) === bound)
      Thread.sleep(1000)
      assert(jobs.get() === 0,
        s"warm composite dispatch launched ${jobs.get()} Spark job(s) — not O(1)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
