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
  private def rotAlpha(i: Int): String = {
    val k = i % Alpha.length
    Alpha.substring(k) + Alpha.substring(0, k)
  }

  def scaleTable(spark: SparkSession, name: String, src: String, factor: Int): DataFrame = {
    val base = spark.read.parquet(s"$src/$name.parquet")
    def copyOf(i: Int): DataFrame = {
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
          // bijective per-copy substitution: preserves length (n_chars
          // stays truthful) and within-copy shingle structure
          base.withColumn("doc_id", col("doc_id") + off)
            .withColumn("text", translate(col("text"), Alpha, rotAlpha(i)))
        case "embeddings" =>
          val dim = base.selectExpr("size(embedding) d").limit(1).collect()(0).getInt(0)
          val k = i % dim
          val rotated =
            if (k == 0) col("embedding")
            else concat(slice(col("embedding"), k + 1, dim - k), slice(col("embedding"), 1, k))
          base.withColumn("vec_id", col("vec_id") + off)
            .withColumn("embedding", rotated)
        case other => sys.error(s"unknown table $other")
      }
    }
    if (name == "region" || name == "nation") base
    else (0 until factor).map(copyOf).reduce(_ unionByName _)
  }

  val Tables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("graft-scaledata")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (t <- Tables) {
      scaleTable(spark, t, src, factor)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaledata] wrote $t x$factor")
    }
    spark.stop()
  }
}
