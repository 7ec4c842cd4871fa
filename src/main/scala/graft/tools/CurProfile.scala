package graft.tools

import org.apache.spark.sql.SparkSession

import graft.pipelines.IncrementalCuration

/** Dev-only stage profiler for the t41/t42/t43 incremental-curation
  * lifecycles — [[EmbProfile]]'s treatment applied to the multisignal
  * ingest, closing the round-15 verdict's #1 ask: t42's decade-3 wall
  * (576.6 s, BENCH_R15_LIFE.json) was attributed to "the MinHash/exact/
  * quality stages" by round-14 INFERENCE, and round 15 proved exactly
  * such an unmeasured attribution wrong for t55. This names the stages
  * with timers on the PRODUCTION plan itself: the sink hooks
  * [[IncrementalCuration.ingestImpl]]'s own eager materialization
  * boundaries (cuts + appends), so there is no profiler re-implementation
  * to drift from the real pipeline.
  *
  * Stage legend (in pipeline order):
  *   signals-exact    quality signals + settled-hash exact stage (cut)
  *   minhash-band     batch survivors' shingle+minhash banding (cut)
  *   emb-code         batch embedding L-table sign coding (cut)
  *   emb-probe        the persisted BandEmbIndex sliced probe — wraps
  *                    the CALL (its eager pruned-index cut + slice
  *                    materializations), not just a downstream cut
  *   emb-pairs-norm   vec pairs → normalized doc pairs (cut)
  *   split:band-probe the MinHash band-index probe alone (profiling-only
  *                    extra pass; its cost is INSIDE drop-set too)
  *   drop-set         band probe + survivor gating (+ clustered: the
  *                    contracted increment, state rewrite, state read)
  *   tag-audit        final tagging + audit aggregate
  *   append-*         hash / band / emb index advances
  *
  * Usage: runMain graft.tools.CurProfile <dir> [t41|t42|t43]
  * Dials ride the same env as the bench (SPARK_GRAFT_LSH_BITS,
  * SPARK_GRAFT_BAND_BITS, SPARK_GRAFT_PROBE_BC_MB, ...).
  */
object CurProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/testdata/sf10sub")
    val which = args.lift(1).getOrElse("t42")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[curprofile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    println(s"[curprofile] dir=$dir which=$which " +
      s"bandDials=${graft.queries.TextOps.DialBandTables}:" +
      s"${graft.queries.TextOps.DialBandBits}:${graft.queries.TextOps.DialBandRadius} " +
      s"probeBudgetMB=${graft.queries.TextOps.DialProbeBroadcastMaxBytes >> 20} " +
      s"slicePar=${graft.queries.BandEmbIndex.DialSlicePar}")

    // seed = setup (warm if stamped), exactly the bench's warmup posture;
    // the profiled region below is the per-batch ingest a deployment pays
    time("ensure-seeded (warm if stamped)") {
      which match {
        case "t41" => IncrementalCuration.t41EnsureSeeded(spark, dir)
        case "t42" => IncrementalCuration.t42EnsureSeeded(spark, dir)
        case "t43" => IncrementalCuration.t43EnsureSeeded(spark, dir)
        case other => sys.error(s"unknown lifecycle $other")
      }
    }

    val stages = scala.collection.mutable.ListBuffer.empty[(String, Double)]
    IncrementalCuration.profileSink = Some((n, s) => stages += ((n, s)))
    try {
      val wall = {
        val t0 = System.nanoTime()
        val audit = which match {
          case "t41" => IncrementalCuration.t41IncrementalCuration(spark, dir)
          case "t42" => IncrementalCuration.t42IncrementalMultiSignal(spark, dir)
          case _     => IncrementalCuration.t43IncrementalClustered(spark, dir)
        }
        audit.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(s"[curprofile] ---- $which ingest stage table ----")
      stages.foreach { case (n, s) => println(f"[curprofile] $n%-28s $s%8.2fs") }
      val split = stages.collect { case ("split:band-probe", s) => s }.sum
      println(f"[curprofile] ${"TOTAL (ingest wall)"}%-28s $wall%8.2fs " +
        f"(stage sum ${stages.map(_._2).sum}%.2f incl. $split%.2f profiling-only split pass)")
    } finally IncrementalCuration.profileSink = None
    spark.stop()
  }
}
