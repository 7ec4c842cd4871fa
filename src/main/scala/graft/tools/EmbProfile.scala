package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipelines.ClusterState
import graft.queries.{BandEmbIndex, EmbIndex, IvfModel, Lsh, TextOps}

/** Dev-only stage profiler for the t40 embedding-increment lifecycle at
  * a dialed (corpus, bits) — decomposes the registered query's wall into
  * its stages so the decade² tables can name the dominant term instead
  * of guessing (not part of the driver contract).
  *
  * Usage: SPARK_GRAFT_LSH_BITS=13 runMain graft.tools.EmbProfile <dir>
  * [band] — `band` profiles the BANDED (t55) lifecycle at the DialBand*
  * dials instead.
  */
object EmbProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/testdata/sf10sub")
    if (args.lift(1).contains("band")) { bandMain(dir); return }
    val bits = TextOps.DialBits
    val radius = TextOps.DialPairRadius
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[embprofile] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    def run(name: String)(df: => DataFrame): Unit =
      time(name)(df.queryExecution.toRdd.count())

    println(s"[embprofile] dir=$dir bits=$bits radius=$radius masks=${Lsh.maskCount(bits, radius)}")
    val wh = time("ensure-seeded (warm if stamped)") {
      ClusterState.t40EnsureSeeded(spark, dir, bits, radius, TextOps.DialEmbCap)
    }
    val partB = graft.core.Tables.embeddings(spark, dir)
      .filter(TextOps.splitBucket(col("vec_id")) >= 50)
    run("code batch (partB)")(EmbIndex.codedOf(partB, bits))
    val bc = time("code+cut batch")(graft.queries.Frames.cut(EmbIndex.codedOf(partB, bits)))
    run("index scan (full)")(EmbIndex.coded(wh))
    run("increment pairs")(EmbIndex.incrementCosinePairsOf(
      EmbIndex.coded(wh), bc, bits, radius, TextOps.DialEmbCap))
    val pairs = time("pairs materialize") {
      graft.queries.Frames.cut(EmbIndex.incrementCosinePairsOf(
        EmbIndex.coded(wh), bc, bits, radius, TextOps.DialEmbCap)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
    }
    val inc = time("cluster increment plan") {
      TextOps.dedupClustersIncrement(ClusterState.read(wh),
        partB.select(col("vec_id").as("doc_id")), pairs, validateEndpoints = false)
    }
    time("state rewrite")(wh.rewrite(ClusterState.TableName, inc))
    run("present clusters")(ClusterState.clusters(wh))
    time("append batch to index")(EmbIndex.appendBatchCoded(wh, bc))
    spark.stop()
  }

  /** The t55 (banded) lifecycle decomposed the same way. */
  private def bandMain(dir: String): Unit = {
    val (tables, bits, radius) =
      (TextOps.DialBandTables, TextOps.DialBandBits, TextOps.DialBandRadius)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[embprofile] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    def run(name: String)(df: => DataFrame): Unit =
      time(name)(df.queryExecution.toRdd.count())
    println(s"[embprofile] BANDED dir=$dir tables=$tables bits=$bits radius=$radius " +
      s"fanout=${tables * Lsh.maskCount(bits, radius)}")
    val wh = time("ensure-seeded (warm if stamped)") {
      ClusterState.t55EnsureSeeded(spark, dir, tables, bits, radius, TextOps.DialEmbCap)
    }
    val partB = graft.core.Tables.embeddings(spark, dir)
      .filter(TextOps.splitBucket(col("vec_id")) >= 50)
    run("code batch (partB)")(BandEmbIndex.codedOf(partB, tables, bits))
    val bc = time("code+cut batch")(
      graft.queries.Frames.cut(BandEmbIndex.codedOf(partB, tables, bits)))
    run("index scan (full)")(BandEmbIndex.coded(wh))
    run("increment pairs")(BandEmbIndex.incrementCosinePairsOf(
      BandEmbIndex.coded(wh), bc, bits, radius, TextOps.DialEmbCap))
    val pairs = time("pairs materialize") {
      graft.queries.Frames.cut(BandEmbIndex.incrementCosinePairsOf(
        BandEmbIndex.coded(wh), bc, bits, radius, TextOps.DialEmbCap)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
    }
    val inc = time("cluster increment plan") {
      TextOps.dedupClustersIncrement(ClusterState.read(wh),
        partB.select(col("vec_id").as("doc_id")), pairs, validateEndpoints = false)
    }
    time("state rewrite")(wh.rewrite(ClusterState.TableName, inc))
    run("present clusters")(ClusterState.clusters(wh))
    time("append batch to index")(BandEmbIndex.appendBatchCoded(wh, bc))
    spark.stop()
  }
}
