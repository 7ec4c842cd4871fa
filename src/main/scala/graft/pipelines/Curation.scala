package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{NativeHashes => NH, NativeText => NT, TextFunctions => TF}

/** End-to-end corpus curation — the composition a training-data pipeline
  * actually runs, built from the library's operators:
  *
  *   quality filter → exact dedup (hash-groupBy survivor)
  *     → near-dup removal (MinHash-LSH candidates → keep min doc per pair
  *       component) → per-doc metadata out
  *
  * One scan computes every per-doc signal (token stats + content hash +
  * shingle hashes) so the corpus is read once; the only shuffles are the
  * two dedup joins. Returns the curated corpus plus a one-row audit of
  * how many documents each stage removed — no silent drops.
  */
object Curation {

  case class Thresholds(minTokens: Int = 10, maxStopwordRatio: Double = 0.6,
                        nearDupJaccard: Double = 0.5)

  def curate(spark: SparkSession, docs: DataFrame,
             t: Thresholds = Thresholds()): (DataFrame, DataFrame) = {
    // single scan: every per-doc signal at once
    val signals = docs
      .withColumn("toks", TF.tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_stop", TF.stopwordCount(col("toks"), Seq("the", "a")))
      .withColumn("stop_ratio",
        when(col("n_tokens") > 0, col("n_stop").cast("double") / col("n_tokens")).otherwise(1.0))
      .withColumn("content_hash", md5(col("text")))
      .withColumn("sh", NT.shingleHashes(col("text"), 3))
      .drop("toks", "n_stop")

    val total = docs.count()

    // stage 1: quality
    val quality = signals.filter(
      col("n_tokens") >= t.minTokens && col("stop_ratio") <= t.maxStopwordRatio)
    val nQuality = quality.count()

    // stage 2: exact dedup — min doc_id survives per content hash
    val exactSurvivors = quality
      .withColumn("keep_id", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("content_hash"))))
      .filter(col("doc_id") === col("keep_id"))
      .drop("keep_id")
    val nExact = exactSurvivors.count()

    // stage 3: near-dup — MinHash-LSH candidates above the jaccard
    // threshold; the larger doc_id of each pair is dropped (transitive
    // chains: t13's clustering is the full treatment; pairwise greater-id
    // drop is the streaming-friendly approximation)
    val sigs = exactSurvivors
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), NH.minhashSignature(col("sh"), 16).as("sig"))
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(TF.bandKeys(col("sig"), 4, 4)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_key"))
    val a = banded.select(col("band"), col("band_key"), col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("band_key"), col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    val toDrop = a.join(b, Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        TF.estJaccard(col("sig_a"), col("sig_b")).as("j"))
      .filter(col("j") >= t.nearDupJaccard)
      .select(col("doc_b").as("doc_id")).distinct()

    val curated = exactSurvivors
      .join(toDrop, Seq("doc_id"), "left_anti")
      .drop("sh")
    val nFinal = curated.count()

    val spark2 = spark
    import spark2.implicits._
    val audit = Seq((total, total - nQuality, nQuality - nExact, nExact - nFinal, nFinal))
      .toDF("input_docs", "dropped_quality", "dropped_exact_dup", "dropped_near_dup", "curated_docs")
    (curated, audit)
  }
}
