package graft

import org.apache.spark.sql.functions._

import graft.pipelines.{ClusterState, Curation, IncrementalCuration}

/** The LONG-HORIZON increment soak (round-12 item 5/8): 20 sequential
  * batches through the clustered incremental-curation lifecycle with the
  * maintenance cadence applied ([[IncrementalCuration.Maintenance]]) —
  * the loop a real deployment runs for months, which the 1-2-batch
  * parity specs cannot exercise. Pins: (a) maintenance fires exactly on
  * cadence and measures drift each time; (b) injected state corruption
  * is REPAIRED at the next reconcile point; (c) after 20 batches the
  * settled state (exact-hash table AND cluster assignment) equals a
  * from-scratch rebuild over the whole corpus; (d) state stays
  * O(corpus) and the warehouse's version count stays bounded by the
  * vacuum retention. The sf1.0-scale wall-clock table lives in SCALE.md
  * (tools/SoakRun); this spec is the semantic contract.
  */
class SoakSpec extends SparkTestBase {

  import spark.implicits._

  // 10 near-dup families spread ACROSS batches (so increments keep
  // linking new members to settled clusters) + per-batch unique docs.
  private def docText(family: Int, variant: Int): String =
    s"family $family shares this long and very distinctive sentence body " +
      s"with every sibling but ends differently variant$variant"

  private def batchDocs(b: Int): Seq[(Long, String)] = {
    val base = b * 20L
    val dups = (0 until 10).map(f =>
      (base + f, docText(f, b))) // one new member of each family per batch
    val uniq = (10 until 20).map(i =>
      (base + i, s"batch $b unique document number $i about topic ${b * 31 + i} " +
        s"with plenty of ordinary filler words to pass the quality gates easily"))
    dups ++ uniq
  }

  test("20-batch soak: cadence fires, corruption repaired, final state == from-scratch rebuild, bounded") {
    val wh = graft.etl.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("graft_soak_").toString)
    val t = Curation.Thresholds()
    val seedDocs = batchDocs(0).toDF("doc_id", "text")
    IncrementalCuration.seed(wh, seedDocs, t, clustered = true)

    var seen = seedDocs
    val reports = scala.collection.mutable.ListBuffer.empty[(Int, ClusterState.MaintainReport)]
    var corrupted = false
    for (b <- 1 to 20) {
      val batch = batchDocs(b).toDF("doc_id", "text")
      // inject a wrong label after batch 7's ingest: the NEXT reconcile
      // (batch 10) must measure it as drift and repair it. The victim is
      // a SINGLETON (batch-0 unique doc 15) — a family member would heal
      // through the very next increment (its component gains members
      // every batch, and the propagation relabels the whole component),
      // which is exactly why cap-crossing drift needs the reconcile: it
      // lives on rows no increment's neighborhood revisits
      val (curated, audit, rep) = IncrementalCuration.ingestWithMaintenance(
        wh, batch,
        IncrementalCuration.Maintenance(b, every = 5, reconcileDocs = Some(seen)),
        t, clustered = true)
      // materialize the outputs (the documented consume-before-next contract)
      curated.queryExecution.toRdd.count()
      audit.queryExecution.toRdd.count()
      rep.foreach(r => reports += b -> r)
      seen = seen.unionByName(batch)
      if (b == 7 && !corrupted) {
        val st = ClusterState.read(wh).collect()
        val mangled = st.map(r => (r.getLong(0), r.getLong(1)))
          .map { case (d, c) => if (d == 15L) (d, 999999L) else (d, c) }
          .toSeq.toDF("doc_id", "cluster")
        ClusterState.seedAssignment(wh, mangled)
        corrupted = true
      }
    }
    // (a) cadence: maintenance ran exactly at batches 5, 10, 15, 20,
    // each run measured drift (reconcileDocs was supplied)
    assert(reports.map(_._1).toList === List(5, 10, 15, 20))
    assert(reports.forall(_._2.drift.isDefined))
    // (b) the injected corruption shows up as nonzero drift at batch 10
    // and nowhere after (repaired by that reconcile)
    val driftAt = reports.map { case (b, r) => b -> r.drift.get }.toMap
    assert(driftAt(10) >= 1L, s"injected corruption not measured: $driftAt")
    assert(driftAt(15) === 0L && driftAt(20) === 0L,
      s"drift persisted past its reconcile: $driftAt")
    // (c) final state == from-scratch rebuild over the full corpus
    val fresh = graft.etl.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("graft_soak_fresh_").toString)
    IncrementalCuration.seed(fresh, seen, t, clustered = true)
    def hashState(w: graft.etl.Warehouse) =
      w.read(IncrementalCuration.HashTable, IncrementalCuration.HashSchema)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(hashState(wh) === hashState(fresh),
      "soaked exact-dedup state diverged from a from-scratch rebuild")
    def clusterSets(w: graft.etl.Warehouse) = ClusterState.clusters(w)
      .groupBy(col("cluster")).agg(sort_array(collect_list(col("doc_id"))).as("m"))
      .select(col("m")).collect().map(_.getSeq[Long](0)).toSet
    assert(clusterSets(wh) === clusterSets(fresh),
      "soaked cluster membership diverged from a from-scratch rebuild")
    // (d) state is O(corpus): one hash row per distinct content, one
    // cluster row per doc
    val n = seen.count()
    assert(hashState(wh).size <= n)
    assert(ClusterState.read(wh).count() <= n)
    // ...and the vacuumed warehouse holds a bounded version window per
    // table (retainLast = 3 at each maintain)
    val root = new java.io.File(wh.dir)
    val versions = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.contains(".__v"))
      .groupBy(_.getName.takeWhile(_ != '.'))
    versions.foreach { case (table, vs) =>
      assert(vs.length <= 4, s"$table holds ${vs.length} versions after vacuum")
    }
  }
}
