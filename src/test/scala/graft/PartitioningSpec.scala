package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.etl.Warehouse

/** The scale-layout contract: facts partitioned by periodo land in
  * per-period directories and periodo-filtered reads prune at the scan.
  */
class PartitioningSpec extends SparkTestBase {
  import spark.implicits._

  test("periodo-partitioned facts prune partitions at the scan") {
    val wh = Warehouse(spark, Files.createTempDirectory("graft_part_").toString)
    val facts = (1 to 300).map(i => (i.toLong, s"z$i", i % 3 + 1, 50.0 + i % 50))
      .toDF("id", "zenput_submission_id", "periodo_id", "calificacion_general")
    wh.appendPartitioned("supervisiones_operativas_part", facts, "periodo_id")

    // directory layout: one subdir per periodo
    val dirs = new java.io.File(s"${wh.dir}/supervisiones_operativas_part")
      .listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("periodo_id=1", "periodo_id=2", "periodo_id=3"))

    val q = wh.readPartitioned("supervisiones_operativas_part")
      .filter(col("periodo_id") === 2)
      .agg(round(avg(col("calificacion_general")), 2).as("p"))
    // pre-adaptive plan: AQE wraps executedPlan in AdaptiveSparkPlanExec,
    // hiding the scan from collectLeaves
    val scans = q.queryExecution.sparkPlan.collectLeaves().collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    // the periodo predicate must land in PartitionFilters (pruned listing),
    // not as a row-level data filter
    assert(scans.head.partitionFilters.exists(_.toString.contains("periodo_id")))
    assert(q.first().getDouble(0) > 0)

    // pruned scan reads only the matching partition's rows
    val pruned = wh.readPartitioned("supervisiones_operativas_part")
      .filter(col("periodo_id") === 2)
    assert(pruned.count() === 100)
  }
}
