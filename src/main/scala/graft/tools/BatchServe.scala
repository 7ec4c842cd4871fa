package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.{IvfModel, PqModel, TextOps}

/** Batched-ANN-serving scale probe (SCALE.md round-12, VERDICT item 7):
  * measure [[TextOps.annTopKBatchPq]] at query volumes where the
  * broadcast path is impossible — 10⁴ and 10⁵ queries against the
  * sf10sub 200k-vector corpus — and confirm the past-the-cap shape
  * holds there: probe side shuffled (the corpus is never broadcast),
  * coded-list scan pruned to the union of probed cells, auto rerank
  * depth from the stamped corpus stat.
  *
  * Query frames are corpus vectors re-keyed (query_id = vec_id +
  * offset) — the realistic serve-everything-back-through-the-index
  * workload (embedding joins, dedup-at-serve) whose volume is
  * corpus-scale by construction.
  *
  * Distributions: `uniform` draws the n LOWEST vec_ids (ordered — the
  * run is reproducible run-to-run, unlike an unordered limit);
  * `skewed` replicates the single lowest-id vector n times, so EVERY
  * query probes the same nProbe cells — the zipfian-hot-cell shape
  * real serving traffic degrades to, which the uniform measurement
  * cannot see (per-cell splitting is AQE skew-join territory; this
  * mode measures whether that delegation actually holds at volume).
  *
  * Usage: runMain graft.tools.BatchServe <corpusDir> [nQueries,...]
  * [uniform|skewed|both]. Prints one JSON line per (volume,
  * distribution): queries, wall seconds, rows.
  */
object BatchServe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/testdata/sf10sub")
    val volumes = args.drop(1).headOption
      .map(_.split(",").map(_.trim.toLong).toSeq).getOrElse(Seq(10000L, 100000L))
    val dists = args.lift(2).getOrElse("uniform") match {
      case "both" => Seq("uniform", "skewed")
      case d      => Seq(d)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // index build is setup (the Bench warmup posture); the measured
    // region is serving only
    PqModel.ensure(spark, dir, k = TextOps.DialIvfK, ks = TextOps.DialPqKs)
    IvfModel.ensureLists(spark, dir, k = TextOps.DialIvfK) // corpus stat + float lists

    val emb = graft.core.Tables.embeddings(spark, dir)
      .select(col("vec_id"), graft.functions.VectorOps.toDouble(col("embedding")).as("emb"))
    for (n <- volumes; dist <- dists) {
      val q = (dist match {
        case "uniform" =>
          // ORDERED n-lowest ids, not an unordered limit: the sampled
          // batch (and with it the wall) is reproducible run-to-run.
          // (A vec_id RANGE would still be wrong — ScaleData strides ids
          // across copies and would under-fill the batch.)
          emb.orderBy(col("vec_id")).limit(n.toInt)
            .select((col("vec_id") + 1000000000L).as("query_id"), col("emb").as("q_emb"))
        case "skewed" =>
          // one vector replicated n times — maximal cell skew by
          // construction (every probe row lands in the same nProbe cells)
          emb.orderBy(col("vec_id")).limit(1)
            .crossJoin(spark.range(n).select(col("id")))
            .select((col("id") + 1000000000L).as("query_id"), col("emb").as("q_emb"))
        case other => sys.error(s"unknown distribution '$other'")
      }).localCheckpoint()
      val t0 = System.nanoTime()
      val out = TextOps.annTopKBatchPq(spark, dir, q,
        k = TextOps.DialIvfK, nProbe = TextOps.DialIvfNProbe, ks = TextOps.DialPqKs,
        broadcastQueries = Some(false))
      val rows = out.queryExecution.toRdd.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"tool":"batch_serve","dir":"$dir","dist":"$dist","queries":$n,""" +
        f""""rows":$rows,"secs":$secs%.3f}""")
    }
    spark.stop()
  }
}
