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
  *   appends          the three index advances' combined wall (they
  *                    dispatch concurrently since round 17)
  *   split:append-*   hash / band / emb advances individually — nested
  *                    INSIDE `appends`, overlapping when concurrent, so
  *                    they are excluded from the top-level stage sum
  *
  * Usage: runMain graft.tools.CurProfile <dir> [t41|t42|t43]
  * Dials ride the same env as the bench (SPARK_GRAFT_LSH_BITS,
  * SPARK_GRAFT_BAND_BITS, SPARK_GRAFT_PROBE_BC_MB, ...).
  * SPARK_GRAFT_CKPT_DIR=<path> switches every Frames.cut to a reliable
  * disk checkpoint (the ask-#6 A/B arm: no storage-pinned cut blocks);
  * each stage boundary also logs the session's pinned-block storage.
  */
object CurProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/testdata/sf10sub")
    val which = args.lift(1).getOrElse("t42")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    val spark = sys.env.get("SPARK_GRAFT_CKPT_DIR").fold(builder) { _ =>
      // static conf — must land on the builder (CANNOT_MODIFY_CONFIG
      // after session creation)
      builder.config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Round-17 ask #6 A/B arm: with SPARK_GRAFT_CKPT_DIR set, every
    // Frames.cut in the ingest becomes a RELIABLE disk checkpoint
    // instead of a localCheckpoint — the pinned MEMORY_AND_DISK blocks
    // that localCheckpoint holds in executor storage memory (where they
    // compete with the probe's hash joins under the unified memory
    // manager) move to checkpoint files. If the in-session probe
    // overhead (449 s inside t42 vs 270-350 standalone at 1 GB × 4,
    // BENCH_R16_STAGES) vanishes under this arm, the term is NAMED:
    // storage-pinned cut blocks stealing execution memory from the
    // probe. The cleaner config below is Graft.session's: without it a
    // long profile run leaks checkpoint copies.
    sys.env.get("SPARK_GRAFT_CKPT_DIR").foreach { d =>
      spark.sparkContext.setCheckpointDir(d)
      println(s"[curprofile] reliable checkpoints at $d (cut() -> disk)")
    }

    // storage telemetry at stage boundaries: how much executor storage
    // memory the session's persisted/localCheckpointed RDD blocks hold —
    // the candidate term for the in-session probe overhead. getRDDStorageInfo
    // is driver-local (no job).
    def storageLine(): String = {
      val infos = spark.sparkContext.getRDDStorageInfo
      val mem = infos.map(_.memSize).sum >> 20
      val dsk = infos.map(_.diskSize).sum >> 20
      s"storageMB=$mem diskMB=$dsk blocks=${infos.map(_.numCachedPartitions).sum}"
    }

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
      s"slicePar=${graft.queries.BandEmbIndex.dialSlicePar(spark.sparkContext)}")

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
    IncrementalCuration.profileSink = Some { (n, s) =>
      stages += ((n, s))
      // the boundary line shows what each stage LEFT pinned — the probe
      // stage's entry shows the pressure it ran under (its predecessors'
      // cut blocks), which is the ask-#6 term being priced
      println(f"[curprofile] after $n%-22s ${storageLine()}")
    }
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
      // split:-prefixed entries time work already counted INSIDE another
      // stage (band-probe's profiling-only extra pass; the per-table
      // appends nested in `appends`, which OVERLAP when dispatched
      // concurrently) — only top-level stages tile the wall
      val top = stages.filterNot(_._1.startsWith("split:")).map(_._2).sum
      val split = stages.filter(_._1.startsWith("split:")).map(_._2).sum
      println(f"[curprofile] ${"TOTAL (ingest wall)"}%-28s $wall%8.2fs " +
        f"(top-level stage sum $top%.2f; $split%.2f of nested/split passes excluded)")
    } finally IncrementalCuration.profileSink = None
    spark.stop()
  }
}
