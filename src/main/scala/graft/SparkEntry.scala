package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{QualityOps, Relational, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry: `Relational` covers the reference's operator inventory
  * (SURVEY.md §2) over the testdata star schema; `TextOps` covers the
  * training-data pipeline extensions (dedup / similarity / text analysis)
  * over `documents` + `embeddings`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q04JoinChain(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.all ++ TextOps.all ++ QualityOps.all +
      ("q28_sessionize" -> (graft.streaming.Sessionize.query _)) +
      ("t35_curation_audit" -> (graft.pipelines.Curation.t35CurationAudit _)) +
      ("t37_cluster_increment" -> (graft.pipelines.ClusterState.t37ClusterIncrement _)) +
      ("t38_curation_multisignal" -> (graft.pipelines.Curation.t38CurationMultiSignal _)) +
      // explicit lambda, not eta-expansion: the method has default params
      ("t40_embed_cluster_increment" -> ((s: SparkSession, d: String) =>
        graft.pipelines.ClusterState.t40EmbedClusterIncrement(s, d,
          TextOps.DialBits,
          TextOps.DialPairRadius, TextOps.DialEmbCap))) +
      ("t41_incremental_curation" ->
        (graft.pipelines.IncrementalCuration.t41IncrementalCuration _)) +
      ("t42_incremental_multisignal" ->
        (graft.pipelines.IncrementalCuration.t42IncrementalMultiSignal _)) +
      ("t43_incremental_clustered" ->
        (graft.pipelines.IncrementalCuration.t43IncrementalClustered _)) +
      ("t44_frame_sample" -> (graft.multimodal.BinaryAssets.t44FrameSample _)) +
      ("t45_asset_meta" -> (graft.multimodal.BinaryAssets.t45AssetMeta _)) +
      ("t53_ngram_lm" -> (graft.queries.QualityOps.t53NgramLm _)) +
      // t55 = t40 on the banded (OR-amplification) pair source through
      // the persisted BandEmbIndex — the measured scale path for the
      // embedding lifecycle (SCALE.md round 13); dials shared with t54
      ("t55_banded_cluster_increment" -> ((s: SparkSession, d: String) =>
        graft.pipelines.ClusterState.t55BandedClusterIncrement(s, d,
          TextOps.DialBandTables, TextOps.DialBandBits,
          TextOps.DialBandRadius, TextOps.DialEmbCap)))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. COMPLETE — every registered query has a
    * hash-checked oracle, none fall back to the driver's weaker
    * rows-only check: hash-seed-dependent ops (MinHash/SimHash/
    * fingerprint) replay the same md5-derived hashes in SQL, and
    * fitted-artifact ops (IVF/PQ) replay against the persisted parquet
    * artifacts both engines read.
    */
  def oracleSql: Map[String, String] =
    oracleSqlFor(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))

  /** Same map with the corpus dir threaded explicitly — t14's SQL embeds
    * the per-corpus persisted-centroid path, and the dir it derives from
    * must be the one the queries actually ran against, not JVM-global
    * state. Verify calls this with its own sfDir argument.
    */
  def oracleSqlFor(dir: String): Map[String, String] =
    Relational.oracles ++ TextOps.oraclesFor(dir) ++ QualityOps.oracles +
      // q32's IN list is DISCOVERED from the same dir listing the Spark
      // side reads — both sides shift together when the corpus grows
      ("q32_catalog" -> Relational.q32SqlFor(dir)) +
      ("q28_sessionize" -> graft.streaming.Sessionize.oracleSql) +
      ("t35_curation_audit" -> graft.pipelines.Curation.t35Sql) +
      // t37's claim IS "increment == full recluster": the oracle replays
      // t13's full transitive closure over the WHOLE corpus, while the
      // Spark side goes seed(part A) → index-probed advance(part B)
      // through the persisted warehouse
      ("t37_cluster_increment" -> TextOps.t13Sql) +
      ("t38_curation_multisignal" -> graft.pipelines.Curation.t38Sql) +
      // t40's claim is t37's on the embedding side: increment == full
      // recluster, so the oracle is t34's whole-corpus closure
      ("t40_embed_cluster_increment" -> TextOps.t34Sql) +
      // t41's claim is "one batch through persisted state tags exactly
      // like the full pipeline": full t35 staging, batch-slice counters
      ("t41_incremental_curation" -> graft.pipelines.IncrementalCuration.t41Sql) +
      // t42 = t41 with both signals: t15 chain unioned into the pairwise
      // drop set, survivor-gated, batch-slice counters
      ("t42_incremental_multisignal" -> graft.pipelines.IncrementalCuration.t42Sql) +
      // t43 = the clustered multi-signal corner: t38's closure, batch slice
      ("t43_incremental_clustered" -> graft.pipelines.IncrementalCuration.t43Sql) +
      // t44 reads binary payloads from the persisted asset parquet through
      // the partition-batched codec path; the oracle reads the SAME
      // parquet (blob lengths + the generator's header arithmetic)
      ("t44_frame_sample" -> graft.multimodal.BinaryAssets.t44SqlFor(dir)) +
      // t45 = the decoded-metadata frame over ALL kinds (t44 covers only
      // the video slice) — image/audio header decode + format mapping
      ("t45_asset_meta" -> graft.multimodal.BinaryAssets.t45SqlFor(dir)) +
      // t53 scores the corpus against ITS OWN persisted 5-gram LM: the
      // oracle reads the same model parquet (integer micro-nat
      // log-probs computed once at fit time — no cross-engine libm),
      // so the replay is a join plus integer sums
      ("t53_ngram_lm" -> graft.queries.QualityOps.t53Sql(dir)) +
      // t55's claim is t40's on the banded family: increment through
      // the persisted banded index == full t54 recluster, so the oracle
      // is the whole-corpus banded closure
      ("t55_banded_cluster_increment" -> TextOps.t55Sql)
}
