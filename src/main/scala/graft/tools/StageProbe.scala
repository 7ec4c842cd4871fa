package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: run ONE Bench warm stage against a corpus dir with INFO
  * logging, so a stage that misbehaves at scale (the round-14 ENOSPC
  * during cluster-seeds at the 5M-doc corpus) names its failing plan
  * instead of hiding behind Bench's WARN level and caught exceptions.
  *
  * Usage: runMain graft.tools.StageProbe <dir> <stage>
  *   stage ∈ t37 | t40 | t55 | curation
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val stage = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("INFO")
    val t0 = System.nanoTime()
    stage match {
      case "t37" => graft.pipelines.ClusterState.t37EnsureSeeded(spark, dir)
      case "t40" => graft.pipelines.ClusterState.t40EnsureSeeded(spark, dir,
        graft.queries.TextOps.DialBits, graft.queries.TextOps.DialPairRadius,
        graft.queries.TextOps.DialEmbCap)
      case "t55" => graft.pipelines.ClusterState.t55EnsureSeeded(spark, dir,
        graft.queries.TextOps.DialBandTables, graft.queries.TextOps.DialBandBits,
        graft.queries.TextOps.DialBandRadius, graft.queries.TextOps.DialEmbCap)
      case "curation" => graft.pipelines.IncrementalCuration.warmSeeds(spark, dir)
      case s if s.startsWith("bandwin:") =>
        // isolate the capBuckets window exchange at a part-A fraction:
        // bandwin:<pct> runs count() over capBuckets(bandedSigsOf(slice))
        import org.apache.spark.sql.functions.col
        val pct = s.stripPrefix("bandwin:").toInt
        val docs = graft.core.Tables.documents(spark, dir)
          .filter(graft.queries.TextOps.splitBucket(col("doc_id")) < pct)
        val n = graft.queries.TextOps.capBuckets(
          graft.queries.BandIndex.bandedOf(docs).drop("bk_bucket")).count()
        println(s"[stageprobe] bandwin pct=$pct rows=$n")
      case s if s.startsWith("bandpairs:") =>
        // isolate minhashPairsOf at a part-A fraction: count the pair set
        import org.apache.spark.sql.functions.col
        val pct = s.stripPrefix("bandpairs:").toInt
        val docs = graft.core.Tables.documents(spark, dir)
          .filter(graft.queries.TextOps.splitBucket(col("doc_id")) < pct)
        val n = graft.queries.TextOps.minhashPairsOf(docs).count()
        println(s"[stageprobe] bandpairs pct=$pct pairs=$n")
      case "t37steps" =>
        // t37EnsureSeeded's internals with stage markers + a throwaway
        // warehouse, to attribute the sf100 ENOSPC to a specific step
        import org.apache.spark.sql.functions.col
        val docs = graft.core.Tables.documents(spark, dir)
        val partA = docs.filter(graft.queries.TextOps.splitBucket(col("doc_id")) < 50)
        val whDir = java.nio.file.Files.createTempDirectory("graft_probe_t37_").toString
        val wh = graft.etl.Warehouse(spark, whDir)
        def mark[A](m: String)(b: => A): A = {
          val t = System.nanoTime(); val r = b
          println(f"[stageprobe] $m%-20s ${(System.nanoTime() - t) / 1e9}%8.1fs"); r
        }
        val stamp = mark("contentStamp")(
          graft.core.Tables.contentStamp(spark, s"$dir/documents.parquet"))
        mark("ensureFor(band)")(graft.queries.BandIndex.ensureFor(wh, partA,
          s"bands-partA50\n$dir\nbk=${graft.queries.BandIndex.BkBuckets}\n$stamp"))
        mark("seed(state)")(graft.queries.StampedTable.ensureSeeded(wh, "t37_seed",
          s"t37-seed\n$dir\n$stamp") {
          graft.pipelines.ClusterState.seed(wh, partA.select(col("doc_id")),
            graft.queries.TextOps.minhashPairsOf(partA))
        })
      case "explain-t37" =>
        import org.apache.spark.sql.functions.col
        val docs = graft.core.Tables.documents(spark, dir)
        val partA = docs.filter(graft.queries.TextOps.splitBucket(col("doc_id")) < 50)
        println("---- bandedOf(partA) ----")
        graft.queries.BandIndex.bandedOf(partA).explain("formatted")
        println("---- minhashPairsOf(partA) ----")
        graft.queries.TextOps.minhashPairsOf(partA).explain("formatted")
      case other => sys.error(s"unknown stage $other")
    }
    println(f"[stageprobe] $stage done in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.stop()
  }
}
