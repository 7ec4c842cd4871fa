package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.etl.Warehouse
import graft.queries.BandIndex

/** INCREMENTAL curation — the flagship composition (quality → exact dedup
  * → near-dup removal, [[Curation]]) applied per ingest batch WITHOUT
  * re-scanning the settled corpus, the way the reference ETL syncs daily
  * increments against checkpointed state (etl_sync.py:356-385) instead of
  * re-pulling everything.
  *
  * Persisted state, both in one warehouse:
  *  - `curation_hashes` (content_hash, keep_id): the exact-stage
  *    survivors' content hashes — a batch doc whose hash is settled is an
  *    exact duplicate without touching the corpus.
  *  - the [[BandIndex]] over the settled exact-survivors' texts — the
  *    near-dup stage probes it for batch-neighborhood pairs
  *    (partition-pruned, union-capped) instead of re-banding the corpus.
  *
  * FIRST-WON semantics, stated not hidden: a settled survivor never drops
  * retroactively. A full recluster of (settled ∪ batch) could prefer a
  * batch doc with a SMALLER id over a settled survivor (exact stage keeps
  * the minimum id); the incremental pipeline keeps the first-seen
  * survivor instead — exactly the reference's idempotent-upsert posture,
  * and identical to the full pipeline whenever batch ids are larger than
  * settled ids (the append-only normal case; spec-pinned). The skew cap's
  * union-crossing caveat carries over from [[BandIndex]] (reconcile with
  * a periodic [[seed]]).
  *
  * Replay-safe at every crash point: a re-ingested batch re-derives the
  * same tags (its own settled hash entries read as "I am the survivor",
  * not "I am a duplicate"), the hash append skips hashes already settled,
  * and the band append repairs at (doc_id, band) granularity — so
  * at-least-once orchestration (or [[ClusterState.maintainFromStream]]'s
  * foreachBatch shape) is effectively exactly-once here too.
  */
object IncrementalCuration {

  val HashTable = "curation_hashes"

  val HashSchema: StructType = StructType(Seq(
    StructField("content_hash", StringType), StructField("keep_id", LongType)))

  private def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()

  /** Full build: run the batch pipeline over the whole settled corpus
    * (pairwise near-dup mode — the incremental drop rule), persist the
    * exact-survivor hash table and band index, return (curated, audit)
    * MATERIALIZED (the handle's cache pin is released before returning).
    */
  def seed(wh: Warehouse, docs: DataFrame,
           t: Curation.Thresholds = Curation.Thresholds()): (DataFrame, DataFrame) = {
    val run = Curation.curateHandle(docs, t)
    try {
      val surv = run.tagged.filter(col("stage").isin("near_dup", "kept"))
      wh.rewrite(HashTable,
        surv.select(col("content_hash"), col("doc_id").as("keep_id")))
      BandIndex.seed(wh, surv.select(col("doc_id"), col("text")))
      (cut(run.curated), cut(run.audit))
    } finally run.close()
  }

  /** Curate ONE ingest batch against the persisted state: batch-sized
    * signal scan, hash-join against the settled hash table (the only
    * settled data the exact stage reads — one column-pruned pass),
    * band-index probe for the near-dup stage, then append the batch's
    * exact survivors to both artifacts. Returns (curatedBatch, auditRow)
    * with the same columns and stage semantics as [[Curation.curate]].
    */
  def ingest(wh: Warehouse, batchDocs: DataFrame,
             t: Curation.Thresholds = Curation.Thresholds()): (DataFrame, DataFrame) = {
    val settled = wh.read(HashTable, HashSchema)
    // batch-sized and referenced by every stage below: one eager cut
    val staged = cut(Curation.withSignals(batchDocs, t)
      .join(settled.withColumnRenamed("keep_id", "settled_keep"),
        Seq("content_hash"), "left"))

    // exact stage against state: a settled hash wins outright (unless it
    // is OUR OWN entry — the replay case); otherwise the batch's minimum
    // quality-ok id per hash wins, as in the full pipeline
    val keepId = min(when(col("q_ok") && col("settled_keep").isNull, col("doc_id")))
      .over(Window.partitionBy(col("content_hash")))
    val staged2 = staged.withColumn("exact_ok",
      col("q_ok") && coalesce(
        col("settled_keep") === col("doc_id"),
        col("doc_id") === keepId,
        lit(false)))

    // near-dup stage: batch survivors band THEMSELVES and probe the
    // settled-survivor index — union-capped batch-neighborhood pairs,
    // est-jaccard semantics identical to the full pipeline (k/16 is an
    // exact binary fraction, so the probe's 4-digit rounding is identity)
    val surv = staged2.filter(col("exact_ok"))
    val pairs = BandIndex.incrementPairsOf(
      BandIndex.banded(wh),
      BandIndex.bandedOf(surv.select(col("doc_id"), col("text"))),
      t.maxBandBucket)
      .filter(col("est_jaccard") >= t.nearDupJaccard)
    // first-won: only BATCH members drop (a pair whose larger id is a
    // settled doc is ignored — the settled survivor stands)
    val toDrop = pairs.select(col("doc_b").as("doc_id")).distinct()
      .join(surv.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .withColumn("near_dup", lit(true))

    val tagged = staged2
      .join(toDrop, Seq("doc_id"), "left")
      .withColumn("stage",
        when(!col("q_ok"), "quality")
          .when(!col("exact_ok"), "exact_dup")
          .when(col("near_dup"), "near_dup")
          .otherwise("kept"))
      .drop("q_ok", "exact_ok", "near_dup")

    val curated = tagged.filter(col("stage") === "kept")
      .drop("stage", "sh", "settled_keep")
    val audit = tagged.agg(
      count(lit(1)).as("input_docs"),
      count(when(col("stage") === "quality", 1)).as("dropped_quality"),
      count(when(col("stage") === "exact_dup", 1)).as("dropped_exact_dup"),
      count(when(col("stage") === "near_dup", 1)).as("dropped_near_dup"),
      count(when(col("stage") === "kept", 1)).as("curated_docs"))
    val (curatedOut, auditOut) = (cut(curated), cut(audit))

    // advance the state: hashes not yet settled (a replayed batch's own
    // entries are), bands at (doc_id, band) repair granularity
    wh.appendLive(HashTable,
      staged2.filter(col("exact_ok") && col("settled_keep").isNull)
        .select(col("content_hash"), col("doc_id").as("keep_id")))
    BandIndex.appendBatch(wh,
      staged2.filter(col("exact_ok")).select(col("doc_id"), col("text")))
    (curatedOut, auditOut)
  }

  // ---------------------------------------------------------------- t41
  /** The incremental lifecycle as a registered, ORACLE-CHECKED query:
    * [[seed]] on the low-id half of the corpus (ids ≤ max/2 — the
    * append-only shape, under which incremental == full EXACTLY), then
    * [[ingest]] of the high-id half against the persisted hash table and
    * band index, returning the batch's audit row. The oracle replays the
    * FULL t35 staging over the whole corpus in DuckDB and counts only
    * the batch slice — "one batch through persisted state tags exactly
    * like the full pipeline" IS the claim, proved per driver round
    * through the warehouse + hash-compare, not only in specs
    * (IncrementalCurationSpec pins the same parity per-doc).
    *
    * Each invocation re-seeds both artifacts (versioned rewrites — fresh
    * generations, so repeat Verify/Bench runs replay identically and a
    * previous invocation's appends never leak into the seed). The 1-row
    * max-id read is the only driver-side value, used to derive the same
    * split the oracle computes with a scalar subquery.
    */
  def t41IncrementalCuration(s: SparkSession, dir: String): DataFrame = {
    import graft.queries.IvfModel
    val docs = graft.core.Tables.documents(s, dir)
    val splitId = docs.agg(max(col("doc_id"))).head.getLong(0) / 2
    val wh = Warehouse(s, new java.io.File(
      IvfModel.warehouseFor(s, dir).dir, "t41_inccur").toString)
    seed(wh, docs.filter(col("doc_id") <= splitId))
    ingest(wh, docs.filter(col("doc_id") > splitId))._2
  }

  /** t35's staging over the WHOLE corpus, counters over the batch slice
    * only — the full-pipeline tags the incremental run must reproduce.
    */
  lazy val t41Sql: String =
    s"WITH ${Curation.stagingSqlCtes(Curation.Thresholds())}\n" +
      Curation.auditSelectSql(
        "\nWHERE doc_id > (SELECT CAST(floor(max(doc_id) / 2) AS BIGINT) FROM documents)")
}
