package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-command recall instrument: writes a deterministic CLUSTERED
  * embedding corpus at a given size, then measures ANN recall@5
  * against the brute-force baseline for the uncompressed IVF probe
  * (the coarse ceiling) and the IVFADC production dial (ks = 256) at
  * the default and a widened nProbe — the same protocol AnnSpec pins
  * at n = 2000, runnable at any n so the recall claim can be
  * re-derived at corpus sizes a spec run cannot afford.
  *
  * Usage: runMain graft.tools.RecallProbe [n] [k] [nProbe] [depth]
  * [dir] (defaults 20000, IvfModel.K, IvfModel.NProbe,
  * PqModel.RerankDepth, target/testdata/clustered<n>). The coarse k
  * refits via the stamp when dialed, exactly like the registered
  * queries.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(20000L)
    import graft.queries.{IvfModel, PqModel, TextOps}
    val k = args.lift(1).map(_.toInt).getOrElse(IvfModel.K)
    val nProbe = args.lift(2).map(_.toInt).getOrElse(IvfModel.NProbe)
    val depth = args.lift(3).map(_.toInt).getOrElse(PqModel.RerankDepth)
    val dir = args.lift(4).getOrElse(s"target/testdata/clustered$n")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ScaleData.writeClusteredCorpus(spark, dir, n)
    def pairs(df: DataFrame): Set[(Long, Long)] = df
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = pairs(TextOps.t10AnnBruteForce(spark, dir))
    require(bf.size == 50, s"brute-force baseline malformed: ${bf.size} pairs")
    def recall(df: DataFrame): Double = (bf intersect pairs(df)).size.toDouble / bf.size
    val rIvf = recall(TextOps.t14AnnIvf(spark, dir, k = k, nProbe = nProbe))
    val r256 = recall(TextOps.t47AnnIvfPq(spark, dir, k = k, nProbe = nProbe,
      rerankDepth = depth, ks = PqModel.ProductionCodesPerSub))
    val wide = math.min(k, nProbe + nProbe / 2)
    val r256w = recall(TextOps.t47AnnIvfPq(spark, dir, k = k, nProbe = wide,
      rerankDepth = depth, ks = PqModel.ProductionCodesPerSub))
    println(f"""{"tool":"recall_probe","n":$n,"k":$k,"n_probe":$nProbe,"depth":$depth,""" +
      f""""ivf_ceiling":$rIvf%.3f,"ivfadc_ks256":$r256%.3f,""" +
      f""""ivfadc_ks256_wide":{"n_probe":$wide,"recall":$r256w%.3f}}""")
    spark.stop()
  }
}
