package graft

import org.apache.spark.sql.functions._

import graft.pipelines.Curation

class CurationSpec extends SparkTestBase {
  import spark.implicits._

  test("curation drops short, exact-dup, and near-dup docs, audited") {
    val base = "the quick brown fox jumps over the lazy dog and keeps running far away"
    val docs = Seq(
      (1L, base),                          // survives (canonical)
      (2L, base),                          // exact dup of 1 -> dropped
      (3L, base + " tonight"),             // near dup of 1 -> dropped
      (4L, "too short"),                   // quality drop
      (5L, "completely different content about spark engines and columnar execution at scale"),
      (6L, Seq.fill(25)("buy now click").mkString(" "))) // looping text: rep_ratio ≈ 0.96
      .toDF("doc_id", "text")
    val (curated, audit) = Curation.curate(spark, docs)
    val kept = curated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 5L))
    val a = audit.collect().head
    assert(a.getAs[Long]("input_docs") === 6)
    assert(a.getAs[Long]("dropped_quality") === 2)
    assert(a.getAs[Long]("dropped_exact_dup") === 1)
    assert(a.getAs[Long]("dropped_near_dup") === 1)
    assert(a.getAs[Long]("curated_docs") === 2)
  }

  test("curate() is fully lazy: zero jobs until the caller acts") {
    // the round-1 pipeline ran 4 eager count() actions inside curate(),
    // i.e. ~4 corpus scans per audit row at 100 TB. The audit must derive
    // from the same lazy lineage: building (curated, audit) runs NOTHING,
    // and the caller pays exactly its own actions (AQE then splits those
    // into multiple scheduler jobs, so the action count — not the raw job
    // count — is the meaningful invariant).
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val tracker = spark.sparkContext.statusTracker
    val before = tracker.getJobIdsForGroup(null).length
    val (curated, audit) = Curation.curate(spark, docs)
    assert(tracker.getJobIdsForGroup(null).length === before,
      "curate() must not run eager actions")
    assert(curated.collect().nonEmpty)
    assert(audit.collect().length === 1)
  }

  test("curation over the corpus conserves counts in the audit") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val (curated, audit) = Curation.curate(spark, docs)
    val a = audit.collect().head
    assert(a.getAs[Long]("input_docs") ===
      a.getAs[Long]("dropped_quality") + a.getAs[Long]("dropped_exact_dup") +
        a.getAs[Long]("dropped_near_dup") + a.getAs[Long]("curated_docs"))
    assert(curated.count() === a.getAs[Long]("curated_docs"))
    assert(curated.columns.contains("n_tokens")) // metadata survives
  }
}
