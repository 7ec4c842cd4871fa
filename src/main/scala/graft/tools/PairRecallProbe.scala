package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Rounding => R, VectorOps => V}
import graft.queries.{Lsh, TextOps}

/** Pair-recall instrument for the NEAR-DUP candidate dial (the t15
  * family): at a clustered corpus of size n, measure the fraction of
  * exact τ-pairs the (bits, radius) dial recovers — brute-forced
  * against a bounded ANCHOR SAMPLE (every exact pair with at least one
  * endpoint among `sample` anchors; sound estimator of corpus pair
  * recall at any n, where full all-pairs is n²). This is how the
  * occupancy-vs-mask trade (`bucketTarget` vs `radiusFor`) gets its
  * recall column: candidates = n × masks × occupancy is the COST side,
  * this prints the RECALL side for the same dials.
  *
  * Usage: runMain graft.tools.PairRecallProbe [n] [bits,bits,...]
  * [sample] [dir]; radius = Lsh.radiusFor(bits) per dial (the policy).
  */
object PairRecallProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(20000L)
    val bitsList = args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(Lsh.bitsFor(n)))
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
    // exact tau-pairs with an anchor endpoint: sample × n dots
    val exact = emb.crossJoin(broadcast(anchors))
      .filter(col("a_id") < col("vec_id"))
      .filter(R.halfUp(V.cosine(col("a_emb"), col("emb")), 6) >= TextOps.CosTau)
      .select(col("a_id").as("vec_a"), col("vec_id").as("vec_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (bits <- bitsList) {
      val radius = Lsh.radiusFor(bits)
      val got = TextOps.t15CosineNearDupOf(
          emb.select(col("vec_id"), col("emb").as("embedding")), bits, radius)
        .filter(col("vec_a") < sample)
        .select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = if (exact.isEmpty) -1.0 else (exact intersect got).size.toDouble / exact.size
      val occ = n.toDouble / (1L << bits)
      println(f"""{"tool":"pair_recall","n":$n,"bits":$bits,"radius":$radius,""" +
        f""""masks":${Lsh.maskCount(bits, radius)},"occupancy":$occ%.1f,""" +
        f""""exact_pairs":${exact.size},"recall":$recall%.3f}""")
    }
    spark.stop()
  }
}
