package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for the sf1.0 rehearsal (SCALE.md "Round 10").
  *
  * The driver ships sf{0.001,0.01,0.1}; the 100 TB story needs at least
  * one measured decade of extrapolation, so this tool derives an
  * sfN-equivalent corpus from the driver's own sf0.1 tables (never
  * synthesizing distributions from scratch): `factor` shifted copies of
  * every table, unioned, with
  *
  *   - all int64 surrogate keys offset by `copy * Stride` so referential
  *     integrity (customer->orders->lineitem, part/supplier->lineitem,
  *     user->events) holds within each copy and never collides across
  *     copies;
  *   - tiny dims (region, nation) left as-is — exactly how a real
  *     TPC-H-ish scale-up behaves (dims grow sub-linearly);
  *   - document text passed through a per-copy bijective character
  *     substitution (translate with a rotated alphabet): WITHIN a copy
  *     every shingle/MinHash/SimHash relation is isomorphic to the
  *     original corpus (bijections preserve n-gram equality), while
  *     ACROSS copies shingle sets diverge wherever the substituted
  *     letters occur — so dedup workloads scale like a 10x corpus, not
  *     like 10 exact replicas (which would inflate candidate pairs
  *     quadratically inside every bucket);
  *   - embeddings rotated element-wise by `copy` positions: norms and
  *     within-copy geometry are exactly preserved (rotation is an
  *     isometry), cross-copy cosine decorrelates, so ANN/cosine-pair
  *     workloads see `factor`x genuinely distinct vectors.
  *
  * Everything is deterministic (no RNG) and runs as one distributed
  * union-write per table — the same program would scale out a 1000-node
  * corpus. Output is written OUTSIDE /root/testdata (that dir is
  * read-only by contract).
  *
  * Usage: runMain graft.tools.ScaleData <srcDir> <dstDir> [factor]
  */
object ScaleData {
  /** Key offset between copies — far above any sf0.1 max key. */
  val Stride: Long = 10000000L

  private val Alpha = "abcdefghij"
  /** Second substitution level, engaged only past factor 10: a single
    * 10-letter rotation cycles at 10 copies, so copies i and i+10 would
    * be EXACT text duplicates under new ids — inflating every dedup
    * bucket 10-fold instead of scaling the corpus. Two independent
    * rotations (units digit on a-j, tens digit on k-t) give the family
    * a cycle of 100 while staying bijective per copy; for i < 10 the
    * second level is the identity, so factors ≤ 10 produce BYTE-
    * IDENTICAL output to the original single-level generator (the
    * recorded sf1.0 rehearsals stay reproducible).
    */
  private val Alpha2 = "klmnopqrst"
  private def rot(a: String, k: Int): String = {
    val m = ((k % a.length) + a.length) % a.length
    a.substring(m) + a.substring(0, m)
  }
  /** Third substitution level, engaged only past factor 100 — found the
    * hard way: the factor-1000 corpus for the third-decade lifecycle
    * measurement made copies i and i+100 exact text duplicates (the
    * two-rotation family cycles at 100), every MinHash band bucket
    * absorbed 10 identical signature groups, and the t37 seed's
    * bucket self-join filled the disk (ENOSPC at ~70 GB of shuffle)
    * before any query ran. A global rotation of the COMBINED 20-letter
    * alphabet, composed AFTER the per-half rotations, multiplies the
    * family: the within-half wrap makes the half-rotations
    * distinguishable from the global offset, so the composed
    * permutations are distinct for all (i%10, i/10%10, i/100%20) —
    * cycle 2000. Identity for i < 100: factors ≤ 100 (the recorded
    * sf1.0 and sf10sub) stay byte-identical.
    */
  private[graft] def rotAlpha(i: Int): String = {
    val alpha20 = Alpha + Alpha2
    val pair = rot(Alpha, i % 10) + rot(Alpha2, i / 10 % 10)
    val s = i / 100 % 20
    val lvl3 =
      if (s == 0) pair
      else pair.map(c => alpha20((alpha20.indexOf(c) + s) % 20))
    // Fourth substitution level, engaged only past factor 2000 (the
    // three-level family's full cycle) — added for the round-17 off-fit
    // corpus (factor 3000): REVERSAL of the 20-letter alphabet, composed
    // after the shifts. Every permutation in the three-level family maps
    // all but the few half-wrap letter pairs to successor pairs
    // (index difference +1 mod 20); composing with reversal flips that
    // to −1, so no reversed permutation can equal any unreversed one and
    // the family's cycle doubles to 4000 (spec-pinned exhaustively over
    // the whole range). Identity for i < 2000: every recorded corpus
    // (factors ≤ 1000) stays byte-identical.
    if (i / 2000 % 2 == 0) lvl3
    else lvl3.map(c => alpha20(19 - alpha20.indexOf(c)))
  }

  /** The text family's full cycle — [[scaleTable]] refuses factors past
    * it rather than silently emitting exact-duplicate copies (the
    * factor-1000 ENOSPC lesson, this time as arithmetic).
    */
  private[graft] val TextCycle = 4000

  def scaleTable(spark: SparkSession, name: String, src: String, factor: Int): DataFrame = {
    val base = spark.read.parquet(s"$src/$name.parquet")
    // the embedding dim is a property of the TABLE, probed once — inside
    // the per-copy closure it was one limit(1) Spark job per copy, which
    // at the round-17 factor-3000 corpus is 3000 jobs of pure overhead
    // before the first row is written
    val embDim =
      if (name == "embeddings")
        base.selectExpr("size(embedding) d").limit(1).collect()(0).getInt(0)
      else 0
    if (name == "region" || name == "nation") base
    else (0 until factor).map(tableCopy(base, name, factor, embDim, _))
      .reduce(_ unionByName _)
  }

  /** One copy's transformed frame — factored out of [[scaleTable]] so the
    * specs can pin high-copy levels (the level-4 engagements at copies
    * 1024/2048+) without building a factor-wide union plan.
    */
  private[graft] def tableCopy(base: DataFrame, name: String, factor: Int,
                               embDim: Int, i: Int): DataFrame = {
    {
      val off = lit(i * Stride)
      name match {
        case "region" | "nation" => base // fixed dims; union once below
        case "customer" => base.withColumn("c_custkey", col("c_custkey") + off)
        case "supplier" => base.withColumn("s_suppkey", col("s_suppkey") + off)
        case "part"     => base.withColumn("p_partkey", col("p_partkey") + off)
        case "orders" =>
          base.withColumn("o_orderkey", col("o_orderkey") + off)
            .withColumn("o_custkey", col("o_custkey") + off)
        case "lineitem" =>
          base.withColumn("l_orderkey", col("l_orderkey") + off)
            .withColumn("l_partkey", col("l_partkey") + off)
            .withColumn("l_suppkey", col("l_suppkey") + off)
        case "events" =>
          base.withColumn("event_id", col("event_id") + off)
            .withColumn("user_id", col("user_id") + off)
        case "documents" =>
          require(factor <= TextCycle,
            s"factor $factor exceeds the text substitution family's cycle " +
              s"$TextCycle — copies i and i+$TextCycle would be exact text " +
              "duplicates (add a level-5 permutation before scaling past it)")
          // bijective per-copy substitution: preserves length (n_chars
          // stays truthful) and within-copy shingle structure
          base.withColumn("doc_id", col("doc_id") + off)
            .withColumn("text", translate(col("text"), Alpha + Alpha2, rotAlpha(i)))
        case "embeddings" =>
          val dim = embDim
          val k = i % dim
          val rotated =
            if (k == 0) col("embedding")
            else concat(slice(col("embedding"), k + 1, dim - k), slice(col("embedding"), 1, k))
          // second isometry level, same reason as Alpha2: rotation alone
          // cycles at dim copies, so copy dim+i would duplicate copy i's
          // vector set under new ids. Negation (an isometry — norms and
          // within-copy cosine structure exactly preserved) on every
          // second dim-block pushes the family's cycle to 2·dim;
          // identity for i < dim, so factors ≤ dim reproduce the
          // original generator byte-for-byte.
          val iso = if (i / dim % 2 == 1) transform(rotated, x => -x) else rotated
          // third isometry level, engaged only past 2·dim copies — the
          // text side's lesson applied here before it bites: at dim=64
          // the two-level family cycles at 128, so a factor-1000 corpus
          // would hand every sign-code bucket ~8 exact duplicates of
          // each vector. Blockwise negation (±1 diagonal — still an
          // exact isometry) over quarters 1-3 of the array, the three
          // bits of (i / (2·dim)) % 8, multiplies the cycle to 16·dim
          // (1024 at dim=64); quarter 0 stays positive so no pattern
          // reproduces the level-2 global negation. Identity below
          // 2·dim copies: recorded factor-≤128 corpora byte-identical.
          val blockBits = i / (2 * dim) % 8
          // quarter width via integer division: for dim % 4 != 0 the tail
          // past 4·q is never negated (floor(pos/q) = 4 ∉ {1,2,3}) —
          // still an exact isometry, just a slightly smaller flipped
          // block. dim < 4 would make q = 0 and floor(pos/0) NULL in
          // non-ANSI Spark, silently collapsing level 3 to the identity
          // (cycle stays 2·dim) — skip it EXPLICITLY instead so the
          // degraded cycle is a stated property, not a division artifact.
          val q = dim / 4
          val negQuarters =
            if (q == 0) Nil
            else (1 to 3).filter(b => (blockBits & (1 << (b - 1))) != 0)
          val iso3 =
            if (negQuarters.isEmpty) iso
            else transform(iso, (x, pos) =>
              // pos/q via floor: Column `/` on ints is DOUBLE division
              when(floor(pos / q).cast("int").isin(negQuarters: _*), -x)
                .otherwise(x))
          // fourth isometry level, engaged only past 16·dim copies (the
          // three-level family's cycle — 1024 at dim 64; the round-17
          // factor-3000 off-fit corpus needs more): blockwise negation
          // over the ODD EIGHTHS 1/3/5/7, the four bits of
          // (i / (16·dim)) % 16. Over the eighth-block sign space the
          // eight generators (global negation; quarters 1-3 = eighth
          // pairs {2,3} {4,5} {6,7}; eighths 1,3,5,7) are linearly
          // independent over GF(2), so every (level-2, level-3, level-4)
          // combination yields a DISTINCT diagonal — the composed cycle
          // is dim rotations × 256 sign patterns = 256·dim (16384 at
          // dim 64; spec-pinned over the full factor-3000 range).
          // Identity below 16·dim copies: recorded factor-≤1000 corpora
          // byte-identical. Same dim < 8 guard as level 3: q8 = 0 would
          // be a division artifact, so the level skips explicitly and
          // the degraded cycle is a stated property for tiny dims.
          val blockBits2 = i / (16 * dim) % 16
          val q8 = dim / 8
          val negEighths =
            if (q8 == 0) Nil
            else (0 to 3).filter(b => (blockBits2 & (1 << b)) != 0).map(b => 2 * b + 1)
          val iso4 =
            if (negEighths.isEmpty) iso3
            else transform(iso3, (x, pos) =>
              when(floor(pos / q8).cast("int").isin(negEighths: _*), -x)
                .otherwise(x))
          require(factor <= 256 * dim || dim < 8,
            s"factor $factor exceeds the embedding isometry family's cycle " +
              s"${256 * dim} at dim $dim — copies would duplicate vector sets")
          base.withColumn("vec_id", col("vec_id") + off)
            .withColumn("embedding", iso4)
        case other => sys.error(s"unknown table $other")
      }
    }
  }

  val Tables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  // ----------------------------------------------- clustered embeddings
  /** Deterministic CLUSTERED unit-vector corpus — the realistic-geometry
    * twin of the driver's isotropic `embeddings` table. Real text/image
    * embeddings are never isotropic: they concentrate around topical
    * modes, which is exactly the structure IVF/PQ exploit (the coarse
    * quantizer recovers the modes; the residual after subtracting a mode
    * centroid is SMALL, so a few PQ codewords describe it well). The
    * driver's isotropic vectors are the adversarial floor for any
    * bucketing scheme (recall ≈ probe fraction — [[graft.queries.Lsh]]'s
    * scaladoc); this corpus is the geometry a production recall claim
    * should be measured on. AnnSpec pins recall@5 ≥ 0.9 for the IVFADC
    * path here, at the production ks=256 dial.
    *
    * Shape: `nCenters` seeded Gaussian directions on the unit sphere;
    * vector i = normalize(center(i mod nCenters) + noise·gaussian),
    * per-id seeded — fully deterministic, embarrassingly parallel
    * (spark.range → map, no shuffle), written in the exact
    * `embeddings.parquet` schema (vec_id BIGINT, embedding
    * ARRAY<FLOAT>, label INT = the center index mod 10, so the
    * filtered-search queries work unchanged).
    */
  def clusteredEmbeddings(spark: SparkSession, n: Long, dim: Int = 64,
                          nCenters: Int = 25, noise: Double = 0.35,
                          seed: Long = 97L): DataFrame = {
    import spark.implicits._
    def normalize(v: Array[Double]): Array[Double] = {
      val nrm = math.sqrt(v.map(x => x * x).sum)
      if (nrm == 0) v else v.map(_ / nrm)
    }
    val rng = new scala.util.Random(seed)
    val centers = Array.fill(nCenters)(normalize(Array.fill(dim)(rng.nextGaussian())))
    spark.range(n).map { id =>
      val r = new scala.util.Random(seed ^ (id * 0x9E3779B97F4A7C15L))
      val c = centers((id % nCenters).toInt)
      val v = normalize(Array.tabulate(dim)(i => c(i) + noise * r.nextGaussian()))
      (id, v.map(_.toFloat), (id % 10).toInt)
    }.toDF("vec_id", "embedding", "label")
  }

  /** Write a clustered corpus dir usable by every embeddings-table query
    * (t10/t12/t14/t36/t47/...): `<dst>/embeddings.parquet`.
    */
  def writeClusteredCorpus(spark: SparkSession, dst: String, n: Long,
                           dim: Int = 64, nCenters: Int = 25,
                           noise: Double = 0.35, seed: Long = 97L): Unit =
    clusteredEmbeddings(spark, n, dim, nCenters, noise, seed)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

  /** Usage: runMain graft.tools.ScaleData <srcDir> <dstDir> [factor]
    * [tables] — `tables` a comma list restricting the output (e.g.
    * `documents,embeddings` for the lifecycle-tail decade² subset);
    * default all.
    */
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val only = if (args.length > 3) args(3).split(",").map(_.trim).toSet else Tables.toSet
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("graft-scaledata")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (t <- Tables if only(t)) {
      scaleTable(spark, t, src, factor)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaledata] wrote $t x$factor")
    }
    spark.stop()
  }
}
