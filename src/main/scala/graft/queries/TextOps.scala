package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.functions.{NativeHashes => NH, NativeText => NT, TextFunctions => TF, VectorOps => V}

/** Training-data pipeline operators over `documents` and `embeddings`:
  * deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard), text
  * analysis (token stats, quality scoring, language profiling,
  * fingerprinting) and similarity search (brute-force cosine top-k).
  *
  * Scale notes are inline — these are the operators that must survive
  * 100 TB: everything is a distributed scan + hash-shuffle on a derived
  * key; no driver-side loops, no cross join of the full corpus.
  */
object TextOps {

  private val Stopwords = Seq("the", "a")

  // ---------------------------------------------------------------- t01
  /** Exact dedup via content hash (hash-groupBy): one scan, shuffle on the
    * 128-bit digest only. `keep_id` = min doc_id is the canonical survivor —
    * deterministic under re-runs.
    */
  def t01DedupExact(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"))
      .orderBy(col("content_hash"))

  val t01Sql: String =
    """SELECT md5(text) AS content_hash, count(*) AS n_copies, min(doc_id) AS keep_id
      |FROM documents
      |GROUP BY md5(text)
      |ORDER BY content_hash""".stripMargin

  // ---------------------------------------------------------------- t02
  /** Per-document token/quality metrics: token count, stopword ratio,
    * punctuation density, mean token length. Single narrow projection —
    * all codegen'd string ops, no shuffle at all.
    */
  def t02TokenStats(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      // materialize intermediate columns: multiple references to a column
      // attribute are free; multiple inline copies of the tokenizer are not
      .select(col("doc_id"), col("lang"), col("n_chars"), TF.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        size(col("toks")).as("n_tokens"),
        TF.stopwordCount(col("toks"), Stopwords).as("n_stopwords"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("n_stopwords"),
        round(col("n_stopwords").cast("double") / col("n_tokens"), 4).as("stopword_ratio"),
        round(col("n_chars").cast("double") / col("n_tokens"), 2).as("avg_token_len"))
      .orderBy(col("doc_id"))

  val t02Sql: String =
    """WITH t AS (
      |  SELECT doc_id, lang, n_chars,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS toks
      |  FROM documents)
      |SELECT doc_id, lang,
      |  CAST(len(toks) AS INT) AS n_tokens,
      |  CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS INT) AS n_stopwords,
      |  round(len(list_filter(toks, x -> x IN ('the', 'a'))) * 1.0 / len(toks), 4) AS stopword_ratio,
      |  round(n_chars * 1.0 / len(toks), 2) AS avg_token_len
      |FROM t
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t03
  /** Corpus profile per (lang, source): counts and average length — the
    * grouping a filtering/curation pipeline reports on.
    */
  def t03LangProfile(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
           round(avg(col("n_chars")), 2).as("avg_chars"))
      .orderBy(col("lang"), col("source"))

  val t03Sql: String =
    """SELECT lang, source, count(*) AS n_docs, round(avg(n_chars), 2) AS avg_chars
      |FROM documents
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin

  // ---------------------------------------------------------------- t04
  /** Token histogram via explode (the reference's only generator-shaped op,
    * T7 answers-explode, re-expressed): top-20 tokens. At scale this is a
    * classic map-side-combine aggregation; the explode never materializes —
    * it streams straight into the partial hash agg.
    */
  def t04TokenHistogram(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(explode(TF.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)

  val t04Sql: String =
    """SELECT token, count(*) AS n
      |FROM (SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS token
      |      FROM documents)
      |GROUP BY token
      |ORDER BY n DESC, token
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- t05
  /** Embedding column statistics per label: count + mean L2 norm. The norm
    * is a sequential double fold (VectorOps) so any engine reproducing the
    * same fold order gets bit-identical sums.
    */
  def t05EmbedStats(s: SparkSession, dir: String): DataFrame =
    embeddings(s, dir)
      .select(col("label"), V.norm(V.toDouble(col("embedding"))).as("nrm"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"), round(avg(col("nrm")), 4).as("avg_norm"))
      .orderBy(col("label"))

  val t05Sql: String =
    """SELECT label, count(*) AS n_vecs,
      |  round(avg(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))), 4) AS avg_norm
      |FROM embeddings
      |GROUP BY label
      |ORDER BY label""".stripMargin

  // ---------------------------------------------------------------- t06
  /** MinHash + LSH near-duplicate candidates (no SQL oracle — driver does
    * the rows-only check; correctness is covered by MinHashSpec).
    *
    * Pipeline: 3-token shingles → 16-slot MinHash signature → 4 bands of 4
    * → explode band keys → self-join per bucket → estimated Jaccard filter.
    * At 100 TB this is THE scalable near-dup algorithm: cost is one shuffle
    * on band keys; only colliding docs are ever paired. Skew guard: a
    * pathological bucket (boilerplate shingles) should be capped — here
    * bucket sizes are bounded by the synthetic corpus; a production cap
    * would filter buckets > N before the self-join.
    */
  def t06MinhashPairs(s: SparkSession, dir: String): DataFrame = {
    val numHashes = 16
    val bands = 4
    val rows = numHashes / bands
    val docs = documents(s, dir)
      // single-pass native tokenize→shingle→hash (the composed HOF chain
      // re-evaluates the tokenizer per lambda element — 90s vs <1s at sf0.1)
      .select(col("doc_id"), NT.shingleHashes(col("text"), 3).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("doc_id"), NH.minhashSignature(col("hs"), numHashes).as("sig"))
    val banded = docs
      .select(col("doc_id"), col("sig"),
        posexplode(TF.bandKeys(col("sig"), bands, rows)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_key"))
    // skew guard: a boilerplate-heavy corpus can put thousands of docs in
    // one band bucket and make the self-join quadratic. Cap bucket size —
    // oversized buckets are boilerplate, not near-duplicates worth pairing.
    val maxBucket = 1000
    val bounded = banded
      .withColumn("bucket_n",
        count(lit(1)).over(Window.partitionBy(col("band"), col("band_key"))))
      .filter(col("bucket_n") <= maxBucket)
      .drop("bucket_n")
    val a = bounded.select(col("band"), col("band_key"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = bounded.select(col("band"), col("band_key"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(TF.estJaccard(col("sig_a"), col("sig_b")), 4).as("est_jaccard"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(max(col("est_jaccard")).as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.5)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---------------------------------------------------------------- t07
  /** SimHash near-duplicate pairs (no SQL oracle). 63-bit token-level
    * SimHash; candidate generation by 4 × 16-bit band equality (pigeonhole:
    * hamming ≤ 3 ⇒ at least one band equal), verified by bit_count(xor).
    */
  def t07SimhashPairs(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
      .select(col("doc_id"), NT.tokenHashes(col("text")).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("doc_id"), NH.simhash63(col("hs")).as("simhash"))
    val banded = docs.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("band"),
          (shiftright(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL))).as("band_key"))): _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band"), col("bk.band_key"))
    val a = banded.select(col("band"), col("band_key"),
      col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
    val b = banded.select(col("band"), col("band_key"),
      col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---------------------------------------------------------------- t08
  /** Exact n-gram Jaccard for LSH candidates (no SQL oracle): re-join the
    * shingle sets onto the MinHash candidate pairs and compute exact set
    * Jaccard. Computed over the native shingle-HASH arrays — set Jaccard
    * over 2^31-range hashes equals the string-set Jaccard up to negligible
    * collision probability, and skips the interpreted shingle chain. Only
    * candidate pairs pay the set-intersection cost.
    */
  def t08NgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val shingled = documents(s, dir)
      .select(col("doc_id"), NT.shingleHashes(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val cands = t06MinhashPairs(s, dir).select(col("doc_a"), col("doc_b"))
    cands
      .join(shingled.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(shingled.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(TF.exactJaccard(col("sh_a"), col("sh_b")), 4).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---------------------------------------------------------------- t09
  /** Rolling-hash document fingerprint (no SQL oracle — hash seeds are
    * engine-specific): order-sensitive polynomial over the token stream.
    */
  def t09Fingerprint(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("doc_id"), NT.tokenHashes(col("text")).as("hs"))
      .select(col("doc_id"), NH.rollingFingerprint(col("hs")).as("fingerprint"),
        size(col("hs")).as("n_tokens"))
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- t10
  /** Brute-force cosine top-k (the ANN baseline): k=5 neighbors for the 10
    * lowest vec_ids. The query side is broadcast; the corpus side streams —
    * cost is |corpus| × |queries| dot products with NO shuffle of the
    * corpus. At 100 TB the scale path is the LSH/IVF variant (t11/round 2);
    * this exact scan is the recall=1.0 baseline it is measured against.
    */
  def t10AnnBruteForce(s: SparkSession, dir: String): DataFrame = {
    val e = embeddings(s, dir).select(col("vec_id"), V.toDouble(col("embedding")).as("emb"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(V.cosine(col("q_emb"), col("emb")), 6).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("query_id"), col("vec_id"), col("cosine"), col("rk"))
      .orderBy(col("query_id"), col("rk"))
  }

  val t10Sql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
      |q AS (SELECT vec_id AS query_id, emb AS q_emb FROM e WHERE vec_id < 10),
      |scored AS (
      |  SELECT q.query_id, e.vec_id,
      |    round(CASE WHEN sqrt(list_sum(list_transform(q.q_emb, x -> x * x))) = 0
      |                 OR sqrt(list_sum(list_transform(e.emb, x -> x * x))) = 0 THEN 0.0
      |          ELSE list_sum(list_transform(list_zip(q.q_emb, e.emb), p -> p[1] * p[2]))
      |               / (sqrt(list_sum(list_transform(q.q_emb, x -> x * x)))
      |                  * sqrt(list_sum(list_transform(e.emb, x -> x * x)))) END, 6) AS cosine
      |  FROM e CROSS JOIN q
      |  WHERE e.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT query_id, vec_id, cosine,
      |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS INT) AS rk
      |  FROM scored)
      |SELECT query_id, vec_id, cosine, rk
      |FROM ranked
      |WHERE rk <= 5
      |ORDER BY query_id, rk""".stripMargin

  // ---------------------------------------------------------------- t11
  /** Language-ID heuristic (n-gram/marker based) + confusion matrix vs the
    * labeled lang column. Pure string expressions: marker-token ratios and
    * character-class densities feed a when-chain classifier — the
    * structural shape of any rule-based langid at scale (single scan, tiny
    * groupBy).
    */
  def t11LangidConfusion(s: SparkSession, dir: String): DataFrame = {
    val lower_ = lower(col("text"))
    val len = length(col("text")).cast("double")
    // marker densities per character: 'the'-trigram, 'th'-bigram, vowels
    val theCnt = (length(lower_) - length(regexp_replace(lower_, "the", ""))) / 3.0
    val vowelRatio = length(regexp_replace(lower_, "[^aeiou]", "")).cast("double") / len
    val predicted =
      when(theCnt / len >= 0.01 && vowelRatio >= 0.28, "en_like")
        .when(vowelRatio >= 0.33, "vowel_heavy")
        .otherwise("other")
    documents(s, dir)
      .select(col("lang"), predicted.as("predicted"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted"))
  }

  val t11Sql: String =
    """SELECT lang,
      |  CASE WHEN (length(lower(text)) - length(replace(lower(text), 'the', ''))) / 3.0
      |              / length(text) >= 0.01
      |         AND length(regexp_replace(lower(text), '[^aeiou]', '', 'g')) * 1.0
      |              / length(text) >= 0.28
      |       THEN 'en_like'
      |       WHEN length(regexp_replace(lower(text), '[^aeiou]', '', 'g')) * 1.0
      |              / length(text) >= 0.33
      |       THEN 'vowel_heavy'
      |       ELSE 'other' END AS predicted,
      |  count(*) AS n
      |FROM documents
      |GROUP BY 1, 2
      |ORDER BY lang, predicted""".stripMargin

  // ---------------------------------------------------------------- t12
  /** LSH-bucketed ANN — the scale path next to the t10 exact baseline (no
    * SQL oracle; AnnSpec checks bucket consistency and cosine agreement
    * with brute force).
    *
    * Random-hyperplane signatures: `Bits` fixed Rademacher (+-1)
    * hyperplanes (seeded, broadcast as literals); bucket = sign-bit code.
    * Corpus is scanned once to assign buckets; each query probes only its
    * own bucket, so per-query cost is |bucket| ~ N/2^Bits dot products
    * instead of N. Recall is tuned by Bits and multi-probe; at 100 TB the
    * bucket assignment is the same single shuffle-free scan and the join
    * shuffles only (bucket, vec) pairs.
    */
  def t12AnnLsh(s: SparkSession, dir: String): DataFrame = {
    val Bits = 6
    val Dim = 64
    val rnd = new scala.util.Random(7)
    val planes: Seq[Seq[Double]] =
      Seq.fill(Bits)(Seq.fill(Dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
    def bucketOf(emb: org.apache.spark.sql.Column) =
      (0 until Bits).map { i =>
        when(V.dot(emb, typedlit(planes(i))) > 0, 1L << i).otherwise(0L)
      }.reduce(_ + _)

    val e = embeddings(s, dir)
      .select(col("vec_id"), V.toDouble(col("embedding")).as("emb"))
      .withColumn("bucket", bucketOf(col("emb")))
    // multi-probe: the exact bucket plus its hamming-1 neighbors — near
    // neighbors that straddle one hyperplane are recovered at the cost of
    // probing (Bits+1)/2^Bits of the corpus instead of 1/2^Bits
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
        explode(array((col("bucket") +:
          (0 until Bits).map(i => col("bucket").bitwiseXOR(lit(1L << i)))): _*)).as("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    e.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("bucket"),
        round(V.cosine(col("q_emb"), col("emb")), 6).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .orderBy(col("query_id"), col("rk"))
  }

  // ---------------------------------------------------------------- t14
  /** IVF ANN — the centroid-bucketed scale path beside t12's hyperplane
    * LSH (no SQL oracle; AnnSpec-style checks in IvfSpec). Coarse
    * quantizer: seeded KMeans over the corpus; each vector is assigned to
    * its nearest centroid's inverted list. A query probes only the
    * `nProbe` nearest lists, so per-query cost is ~ nProbe/k of the
    * corpus. At 100 TB the model is trained once on a sample and
    * persisted; here it is fit per call (corpus is test-sized) with a
    * fixed seed for determinism.
    */
  def t14AnnIvf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val k = 16
    val nProbe = 2

    val e = embeddings(s, dir)
      .select(col("vec_id"), V.toDouble(col("embedding")).as("emb"))
      .withColumn("features", array_to_vector(col("emb")))
    val model = new KMeans().setK(k).setSeed(42L).setMaxIter(5).fit(e)
    val assigned = model.transform(e)
      .select(col("vec_id"), col("emb"), col("prediction").as("cluster"))

    // probe lists: nProbe nearest centroids per query vector
    val centroids = model.clusterCenters.zipWithIndex.map {
      case (c, i) => (i, c.toArray.toSeq)
    }.toSeq
    val centDf = s.createDataFrame(centroids).toDF("cid", "cvec")
    val queries = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("cid"))
    val probes = queries.crossJoin(broadcast(centDf))
      .withColumn("dist",
        aggregate(zip_with(col("q_emb"), col("cvec"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("q_emb"), col("cid").as("cluster"))

    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("cluster"),
        round(V.cosine(col("q_emb"), col("emb")), 6).as("cosine"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= 5)
      .orderBy(col("query_id"), col("rk"))
  }

  // ---------------------------------------------------------------- t13
  /** Near-duplicate CLUSTERS: connected components over the MinHash
    * candidate graph via iterative min-label propagation, then one
    * canonical survivor per cluster (no SQL oracle; DedupClusterSpec
    * checks transitivity). This is the step that turns pairwise near-dup
    * hits into an actual dedup decision.
    *
    * Scale shape: each iteration is one join + one aggregate, both
    * shuffling on doc_id; lineage is cut with localCheckpoint every
    * iteration (iterative algorithms otherwise stack plans). Near-dup
    * components are tiny (diameter ≤ a few hops), so the fixed iteration
    * budget converges with room to spare.
    */
  def t13DedupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = t06MinhashPairs(s, dir).select(col("doc_a"), col("doc_b"))
    val nodes = documents(s, dir).select(col("doc_id")).distinct()
    val edges = pairs
      .unionByName(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .localCheckpoint()

    var labels = nodes.withColumn("cluster", col("doc_id")).localCheckpoint()
    var iter = 0
    var converged = false
    while (iter < 8 && !converged) {
      val neighborMin = edges
        .join(labels.select(col("doc_id").as("doc_b"), col("cluster").as("nb_cluster")), Seq("doc_b"))
        .groupBy(col("doc_a")).agg(min(col("nb_cluster")).as("min_nb"))
        .select(col("doc_a").as("doc_id"), col("min_nb"))
      val next = labels.join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster"), coalesce(col("min_nb"), col("cluster"))).as("cluster"))
        .localCheckpoint()
      converged = next.join(labels.select(col("doc_id"), col("cluster").as("prev")), Seq("doc_id"))
        .filter(col("cluster") =!= col("prev")).isEmpty
      labels = next
      iter += 1
    }

    val w = Window.partitionBy(col("cluster")).orderBy(col("doc_id"))
    labels
      .withColumn("is_canonical", row_number().over(w) === 1)
      .withColumn("cluster_size", count(lit(1)).over(Window.partitionBy(col("cluster"))))
      .filter(col("cluster_size") > 1) // singleton docs are not duplicates
      .orderBy(col("cluster"), col("doc_id"))
  }

  // ------------------------------------------------------------ registry
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t01_dedup_exact"     -> (t01DedupExact _),
    "t02_token_stats"     -> (t02TokenStats _),
    "t03_lang_profile"    -> (t03LangProfile _),
    "t04_token_histogram" -> (t04TokenHistogram _),
    "t05_embed_stats"     -> (t05EmbedStats _),
    "t06_minhash_pairs"   -> (t06MinhashPairs _),
    "t07_simhash_pairs"   -> (t07SimhashPairs _),
    "t08_ngram_jaccard"   -> (t08NgramJaccard _),
    "t09_fingerprint"     -> (t09Fingerprint _),
    "t10_ann_brute_force" -> (t10AnnBruteForce _),
    "t11_langid_confusion"-> (t11LangidConfusion _),
    "t12_ann_lsh"         -> (t12AnnLsh _),
    "t13_dedup_clusters"  -> (t13DedupClusters _),
    "t14_ann_ivf"         -> (t14AnnIvf _),
  )

  /** t06-t09 intentionally omitted: hash-seed-dependent results are not
    * SQL-expressible; the driver records the weaker rows-only check and
    * ScalaTest covers semantics.
    */
  val oracles: Map[String, String] = Map(
    "t01_dedup_exact"     -> t01Sql,
    "t02_token_stats"     -> t02Sql,
    "t03_lang_profile"    -> t03Sql,
    "t04_token_histogram" -> t04Sql,
    "t05_embed_stats"     -> t05Sql,
    "t10_ann_brute_force" -> t10Sql,
    "t11_langid_confusion"-> t11Sql,
  )
}
