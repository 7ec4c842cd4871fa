package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{NativeHashes => NH, TextFunctions => TF}

/** Dev-only stage profiler for the dedup pipelines (not part of the
  * driver contract).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      // toRdd executes the physical plan with ALL output columns — a bare
      // count() would let Catalyst prune the very projections we measure
      val n = df.queryExecution.toRdd.count()
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("read")(docs)
    time("tokens")(docs.select(col("doc_id"), TF.tokens(col("text")).as("t")))
    time("tokens+size")(docs.select(col("doc_id"), size(TF.tokens(col("text"))).as("n")))
    time("shingles")(docs.select(col("doc_id"), TF.shingles(TF.tokens(col("text")), 3).as("sh")))
    time("shingleHashes")(docs.select(col("doc_id"),
      TF.shingleHashes(TF.shingles(TF.tokens(col("text")), 3)).as("hs")))
    val hs = docs.select(col("doc_id"),
      TF.shingleHashes(TF.shingles(TF.tokens(col("text")), 3)).as("hs"))
    time("minhash-native")(hs.select(col("doc_id"), NH.minhashSignature(col("hs"), 16).as("sig")))
    time("minhash-hof")(hs.select(col("doc_id"), TF.minhashSignatureFromHashes(col("hs"), 16).as("sig")))
    val th = docs.select(col("doc_id"), TF.tokenHashes(TF.tokens(col("text"))).as("hs"))
    time("tokenHashes")(th)
    time("simhash-native")(th.select(col("doc_id"), NH.simhash63(col("hs")).as("s")))
    time("simhash-hof")(th.select(col("doc_id"), TF.simhash63FromHashes("hs").as("s")))

    time("native-shingle-hashes")(docs.select(col("doc_id"),
      graft.functions.NativeText.shingleHashes(col("text"), 3).as("hs")))
    time("native-token-hashes")(docs.select(col("doc_id"),
      graft.functions.NativeText.tokenHashes(col("text")).as("hs")))

    // t06 sub-stages
    val numHashes = 16
    val sig = docs
      .select(col("doc_id"), graft.functions.NativeText.shingleHashes(col("text"), 3).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("doc_id"), NH.minhashSignature(col("hs"), numHashes).as("sig"))
    val banded = sig
      .select(col("doc_id"), col("sig"), posexplode(TF.bandKeys(col("sig"), 4, 4)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_key"))
    time("t06-banded")(banded)
    val a = banded.select(col("band"), col("band_key"), col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("band_key"), col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    val joined = a.join(b, Seq("band", "band_key")).filter(col("doc_a") < col("doc_b"))
    time("t06-joined")(joined.select(col("doc_a"), col("doc_b")))
    time("t06-jaccard")(joined.select(col("doc_a"), col("doc_b"),
      round(TF.estJaccard(col("sig_a"), col("sig_b")), 4).as("j")))
    time("t06-full")(graft.queries.TextOps.t06MinhashPairs(spark, dir))
    time("t07-full")(graft.queries.TextOps.t07SimhashPairs(spark, dir))
    spark.stop()
  }
}
