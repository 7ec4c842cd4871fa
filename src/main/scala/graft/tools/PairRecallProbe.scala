package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Rounding => R, VectorOps => V}
import graft.queries.{Lsh, TextOps}

/** Pair-recall instrument for the NEAR-DUP candidate dial (the t15
  * family): at a clustered corpus of size n, measure the fraction of
  * exact τ-pairs a candidate-generation dial recovers — brute-forced
  * against a bounded ANCHOR SAMPLE (every exact pair with at least one
  * endpoint among `sample` anchors; sound estimator of corpus pair
  * recall at any n, where full all-pairs is n²). Recall is stratified
  * by exact-cosine band: `dup` (cos ≥ 0.8 — the pairs dedup exists to
  * find), `mid`, `boundary` (τ..0.6 — unrecoverable at any bounded
  * probe; reported, never pinned).
  *
  * Dials:
  *  - `bits` — single-table Hamming-ball, radius = Lsh.radiusFor(bits)
  *  - `bits:radius` — single-table, explicit radius
  *  - `bandL:b:r` — BANDED OR-amplification: L tables of b sign-bits
  *    each over disjoint plane windows ([[Lsh.planesForTable]]), each
  *    probed with a radius-r Hamming ball; a pair is a candidate if ANY
  *    table matches. Join-input fan-out per item is L × C(b, ≤r) vs the
  *    single table's C(bits, ≤radius) — the term the round-13 lifecycle
  *    measurement showed DOMINATES pair-join cost at low occupancy.
  *
  * Usage: runMain graft.tools.PairRecallProbe [n] [dial,dial,...]
  * [sample] [dir].
  */
object PairRecallProbe {
  sealed trait Dial
  final case class Single(bits: Int, radius: Int) extends Dial
  final case class Banded(tables: Int, bits: Int, radius: Int) extends Dial

  private val BandRe = "band(\\d+):(\\d+):(\\d+)".r

  def parseDial(d: String): Dial = d match {
    case BandRe(l, b, r) => Banded(l.toInt, b.toInt, r.toInt)
    case _ => d.split(":") match {
      case Array(b)    => Single(b.toInt, Lsh.radiusFor(b.toInt))
      case Array(b, r) => Single(b.toInt, r.toInt)
      case _           => sys.error(s"bad dial '$d' (want bits | bits:radius | bandL:b:r)")
    }
  }

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(20000L)
    val dials: Seq[Dial] = args.lift(1)
      .map(_.split(",").map(_.trim).toSeq.map(parseDial))
      .getOrElse { val b = Lsh.bitsFor(n); Seq(Single(b, Lsh.radiusFor(b))) }
    val sample = args.lift(2).map(_.toLong).getOrElse(1000L)
    val dir = args.lift(3).getOrElse(s"target/testdata/clustered$n")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // near-dup geometry (pair cosine ~0.9), not the isotropic tau
    // boundary — same fixture rationale as RadiusPolicySpec
    ScaleData.clusteredEmbeddings(spark, n, nCenters = (n / 50).toInt.max(10), noise = 0.04)
      .select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), V.toDouble(col("embedding")).as("emb"))
      .localCheckpoint()
    val anchors = emb.filter(col("vec_id") < sample)
      .select(col("vec_id").as("a_id"), col("emb").as("a_emb"))
    // exact tau-pairs with an anchor endpoint (sample × n dots), with the
    // exact cosine for band stratification
    val exact = emb.crossJoin(broadcast(anchors))
      .filter(col("a_id") < col("vec_id"))
      .withColumn("cos", R.halfUp(V.cosine(col("a_emb"), col("emb")), 6))
      .filter(col("cos") >= TextOps.CosTau)
      .select(col("a_id").as("vec_a"), col("vec_id").as("vec_b"), col("cos"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val bands = Seq(("dup", 0.8, 1.01), ("mid", 0.6, 0.8), ("boundary", TextOps.CosTau, 0.6))

    /** Anchor-restricted verified pairs of the banded dial, plus the
      * pre-verify distinct candidate count per anchor (the cost side).
      */
    def bandedPairs(l: Int, b: Int, r: Int): (Set[(Long, Long)], Double) = {
      val masks = Lsh.masksWithin(r, b)
      val coded = emb.select(col("vec_id"), col("emb"),
          posexplode(Lsh.bucketsOfTables(col("emb"), b, l))
            .as(Seq("tbl", "code")))
        .localCheckpoint()
      val probe = coded.filter(col("vec_id") < sample)
        .select(col("vec_id").as("a_id"), col("emb").as("a_emb"), col("tbl"),
          explode(typedlit(masks)).as("m"), col("code"))
        .select(col("a_id"), col("a_emb"), col("tbl"),
          col("code").bitwiseXOR(col("m")).as("pcode"))
      val cand = probe.join(
          coded.select(col("vec_id").as("b_id"), col("emb").as("b_emb"),
            col("tbl").as("btbl"), col("code").as("bcode")),
          col("tbl") === col("btbl") && col("pcode") === col("bcode") &&
            col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), col("a_emb"), col("b_emb"))
        .distinct() // OR across tables: one candidate per pair
        .localCheckpoint()
      val nCand = cand.count()
      val got = cand
        .filter(R.halfUp(V.cosine(col("a_emb"), col("b_emb")), 6) >= TextOps.CosTau)
        .select(col("a_id"), col("b_id")).collect()
        .map(rr => (rr.getLong(0), rr.getLong(1))).toSet
      (got, nCand.toDouble / sample)
    }

    for (dial <- dials) {
      val (got, desc, fanout, candPerAnchor) = dial match {
        case Single(bits, radius) =>
          val g = TextOps.t15CosineNearDupOf(
              emb.select(col("vec_id"), col("emb").as("embedding")), bits, radius)
            .filter(col("vec_a") < sample)
            .select("vec_a", "vec_b").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
          val occ = n.toDouble / (1L << bits)
          (g, f""""bits":$bits,"radius":$radius""",
            Lsh.maskCount(bits, radius), Lsh.maskCount(bits, radius) * occ)
        case Banded(l, b, r) =>
          val (g, cpa) = bandedPairs(l, b, r)
          (g, f""""tables":$l,"bits":$b,"radius":$r""",
            l * Lsh.maskCount(b, r), cpa)
      }
      def recallOf(pairs: Iterable[(Long, Long)]): Double =
        if (pairs.isEmpty) -1.0 else pairs.count(got).toDouble / pairs.size
      val bandJson = bands.map { case (name, lo, hi) =>
        // .toSeq first: collecting (a, b) keys straight off the Map would
        // rebuild a Map and silently dedup pairs by their first element
        val in = exact.toSeq.collect { case (p, c) if c >= lo && c < hi => p }
        f""""$name":{"pairs":${in.size},"recall":${recallOf(in)}%.3f}"""
      }.mkString(",")
      println(f"""{"tool":"pair_recall","n":$n,$desc,"fanout":$fanout,""" +
        f""""cand_per_item":$candPerAnchor%.1f,"exact_pairs":${exact.size},""" +
        f""""recall":${recallOf(exact.keys)}%.3f,$bandJson}""")
    }
    spark.stop()
  }
}
