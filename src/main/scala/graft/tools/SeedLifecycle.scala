package graft.tools

import org.apache.spark.sql.SparkSession

/** Seed ONE lifecycle query's persisted state — the round-17 off-fit
  * battery's setup step. Bench's warm stages seed lifecycle FAMILIES
  * (`cluster-seeds` = t37+t40+t55, `curation-seeds` = t41+t42+t43),
  * which at the sf300sub corpus is 3-6 warehouses × ~29 GB against
  * ~70 GB of free disk; the off-fit protocol needs exactly one
  * warehouse on disk at a time (SCALE.md round 17). Seeding here is
  * stamped, so the subsequent Bench/CurProfile run (with every warm
  * stage skipped) pays only the stamp check before its measured pass.
  *
  * Usage: runMain graft.tools.SeedLifecycle <dir> t55|t42|t41|t43
  * Dials ride the same env as the bench.
  */
object SeedLifecycle {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(sys.error("usage: SeedLifecycle <dir> <which>"))
    val which = args.lift(1).getOrElse("t55")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val T = graft.queries.TextOps
    val t0 = System.nanoTime()
    which match {
      case "t55" => graft.pipelines.ClusterState.t55EnsureSeeded(spark, dir,
        T.DialBandTables, T.DialBandBits, T.DialBandRadius, T.DialEmbCap)
      case "t41" => graft.pipelines.IncrementalCuration.t41EnsureSeeded(spark, dir)
      case "t42" => graft.pipelines.IncrementalCuration.t42EnsureSeeded(spark, dir)
      case "t43" => graft.pipelines.IncrementalCuration.t43EnsureSeeded(spark, dir)
      case other => sys.error(s"unknown lifecycle $other")
    }
    println(f"[seedlifecycle] $which seeded in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.stop()
  }
}
