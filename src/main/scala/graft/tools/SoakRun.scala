package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipelines.{ClusterState, IncrementalCuration => IC}
import graft.queries.TextOps

/** The sf1.0-scale 20-batch soak (SCALE.md round-12, VERDICT item 5):
  * drive the clustered MULTI-SIGNAL incremental-curation loop — the
  * t43 lifecycle — through `nBatches` sequential ingest batches with
  * the [[IC.Maintenance]] cadence, and print one JSON line per batch:
  * wall seconds, warehouse file count, state rows, and the maintenance
  * report when one ran. The semantic contract (drift repaired, final
  * state == rebuild) is SoakSpec; this tool measures the SHAPE a
  * deployment cares about — per-batch wall staying flat and the file /
  * generation counts staying bounded under compaction + vacuum.
  *
  * Batching is the md5-split arithmetic the lifecycle queries use
  * (deterministic, content-keyed): seed = split bucket < 50, then
  * `nBatches` equal slices of the rest.
  *
  * Usage: runMain graft.tools.SoakRun <corpusDir> [nBatches] [cadence]
  */
object SoakRun {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/testdata/sf1.0")
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val cadence = args.drop(2).headOption.map(_.toInt).getOrElse(IC.DefaultMaintainCadence)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val whDir = java.nio.file.Files.createTempDirectory("graft_soak_run_").toString
    val wh = graft.etl.Warehouse(spark, whDir)
    val docs = graft.core.Tables.documents(spark, dir)
    val emb = graft.core.Tables.embeddings(spark, dir)
    def docSlice(lo: Int, hi: Int) =
      docs.filter(TextOps.splitBucket(col("doc_id")) >= lo &&
        TextOps.splitBucket(col("doc_id")) < hi)
    def embSlice(lo: Int, hi: Int) =
      emb.filter(TextOps.splitBucket(col("vec_id")) >= lo &&
        TextOps.splitBucket(col("vec_id")) < hi)
    // the lifecycle's pair source is BANDED since round 14 — the soak
    // drives the same dials the registered t43 runs at
    def sig(e: org.apache.spark.sql.DataFrame) =
      Some(IC.EmbeddingSignal(e, bits = TextOps.DialBandBits,
        radius = TextOps.DialBandRadius, maxBucket = TextOps.DialEmbCap,
        banded = true, tables = TextOps.DialBandTables))

    def fileCount: Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
        else 1L
      walk(new java.io.File(whDir))
    }
    def stateRows: Long =
      wh.read(IC.HashTable, IC.HashSchema).count() + ClusterState.read(wh).count()

    // seed = settled half; batches split the other half evenly
    // (fractional boundaries so the last batch is the same size as the
    // rest — integer width made batch 20 span 12 buckets in the first
    // run and its wall/kept row useless as a trend point)
    IC.seed(wh, docSlice(0, 50), emb = sig(embSlice(0, 50)), clustered = true)
    def bound(b: Int): Int = 50 + b * 50 / nBatches
    for (b <- 1 to nBatches) {
      val (lo, hi) = (bound(b - 1), bound(b))
      val batchDocs = docSlice(lo, hi)
      val t0 = System.nanoTime()
      val (curated, audit, rep) = IC.ingestWithMaintenance(
        wh, batchDocs,
        // the reconcile corpus is what the state has SEEN — through the
        // previous batch (maintenance runs before this one); passing the
        // current batch's upper bound counted every not-yet-ingested doc
        // as "drift" in the first run
        IC.Maintenance(b, every = cadence,
          reconcileDocs = Some(docSlice(0, lo)),
          reconcileEmb = sig(embSlice(0, lo))),
        emb = sig(embSlice(lo, hi)), clustered = true)
      val kept = curated.count()
      audit.queryExecution.toRdd.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val m = rep.map(r => s""","drift":${r.drift.getOrElse(-1L)}""").getOrElse("")
      println(f"""{"tool":"soak","batch":$b,"secs":$secs%.2f,"kept":$kept,"files":$fileCount,"state_rows":$stateRows$m}""")
    }
    spark.stop()
  }
}
