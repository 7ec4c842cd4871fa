package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of one registered query under the
  * current env dials — the `.explain("formatted")` feedback loop from
  * SCALE.md's methodology as a runnable tool, so a plan can be inspected
  * at any corpus/dial combination without editing a spec.
  *
  * Usage: runMain graft.tools.ExplainQuery <queryName> [sfDir]
  * Dials (SPARK_GRAFT_LSH_BITS etc.) are read exactly as Bench reads them.
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1)
                else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("graft-explain")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; known: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
