package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only decade-4 probe for the distributed connected-components
  * loop — the round-15 verdict's ask #5: force the capacity model's
  * weakest predicted term at CURRENT hardware instead of generating a
  * 20M-vector corpus. The model's cluster term is anchored at one point
  * (82 s for a 41.5M-edge first advance, BENCH_R15_CC.json) and assumed
  * linear-in-edges at fixed round count; a decade-4 first advance
  * (~10× the corpus) lands near 400M contracted edges, so this builds a
  * SYNTHETIC 400M-edge graph of the same shape and prices the loop on
  * it directly.
  *
  * Shape: dup-dense components are near-CLIQUES (the r15 41.5M-edge
  * advance came from a corpus whose duplicate groups all pair with each
  * other inside a band bucket), so the synthetic graph is disjoint
  * m-cliques — diameter 1, converging in the plain-round regime exactly
  * like the measured advance. Each node emits edges to every HIGHER id
  * in its clique via one explode (no generation shuffle):
  * clique(i) = i div m, edges (i, j) for i < j ≤ clique end.
  *
  * Usage: runMain graft.tools.CcProbe <edgesApprox> [cliqueSize=30]
  * e.g. CcProbe 400000000 → ~920k cliques of 30 (27.6M nodes).
  * SPARK_GRAFT_CC_LOG=1 surfaces the loop-vs-driver routing line.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val edgesTarget = args.headOption.map(_.toLong).getOrElse(400000000L)
    val m = args.lift(1).map(_.toInt).getOrElse(30)
    val edgesPerClique = m.toLong * (m - 1) / 2
    val nCliques = math.max(1L, edgesTarget / edgesPerClique)
    val nNodes = nCliques * m
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Shuffle partitions scale with the graph (~2M mirrored edge rows
    // per task), not with the core count — the rule this probe measured
    // by failing first (partitions=cpus=32 at 400M edges: ~25M rows in
    // every per-task aggregation map, AGGREGATE_OUT_OF_MEMORY on a 48 GB
    // heap). Since round 17 the propagation loop applies the rule ITSELF
    // ([[graft.queries.TextOps.ccShufflePartitionsFor]] — edges are in
    // hand from its routing count), so the probe launches at the SUITE
    // DEFAULT (partitions = cpus) and the loop's own arithmetic must
    // carry it; the optional third arg remains as an override for
    // sweeping the dial.
    val partitions = args.lift(2).map(_.toInt).getOrElse(cpus.toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", partitions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println(s"[ccprobe] cliques=$nCliques m=$m nodes=$nNodes " +
      s"edges=${nCliques * edgesPerClique} shufflePartitions=$partitions")
    val nodes = spark.range(nNodes).select(col("id").as("doc_id"))
    // (i div m) is exact in double space for any id < 2^53 — fine at any
    // edge count this box can hold
    val cliqueEnd = (floor(col("doc_a") / m).cast("long") + 1) * m - 1
    val pairs = spark.range(nNodes).select(col("id").as("doc_a"))
      // clique-end nodes emit nothing — without the filter their
      // sequence(end+1, end) would run DESCENDING (Spark's step -1
      // default) and leak an edge into the next clique
      .filter(col("doc_a") % m =!= m - 1)
      .select(col("doc_a"),
        explode(sequence(col("doc_a") + 1, cliqueEnd)).as("doc_b"))
    val t0 = System.nanoTime()
    val out = graft.queries.TextOps.dedupClustersOf(nodes, pairs)
    val rows = out.queryExecution.toRdd.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[ccprobe] clustered rows=$rows expected=$nNodes wall=$secs%.1fs " +
      f"(model: 82s x E/41.5M = ${82.0 * (nCliques * edgesPerClique) / 41.5e6}%.0fs)")
    assert(rows == nNodes,
      s"clique components must keep every node clustered: got $rows of $nNodes")
    spark.stop()
  }
}
