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
  * Usage: runMain graft.tools.BatchServe <corpusDir> [nQueries,...]
  * Prints one JSON line per volume: queries, wall seconds, rows.
  */
object BatchServe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/testdata/sf10sub")
    val volumes = args.drop(1).headOption
      .map(_.split(",").map(_.trim.toLong).toSeq).getOrElse(Seq(10000L, 100000L))
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
    for (n <- volumes) {
      // limit, not a vec_id range: ScaleData strides ids across copies,
      // so a range filter would silently under-fill the batch
      val q = emb.limit(n.toInt)
        .select((col("vec_id") + 1000000000L).as("query_id"), col("emb").as("q_emb"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      val out = TextOps.annTopKBatchPq(spark, dir, q,
        k = TextOps.DialIvfK, nProbe = TextOps.DialIvfNProbe, ks = TextOps.DialPqKs,
        broadcastQueries = Some(false))
      val rows = out.queryExecution.toRdd.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"tool":"batch_serve","dir":"$dir","queries":$n,"rows":$rows,"secs":$secs%.3f}""")
    }
    spark.stop()
  }
}
