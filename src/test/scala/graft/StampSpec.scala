package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.StampedTable

/** Stamp boundedness — the round-14 scale lesson: the stamp rides
  * warehouse tables as a per-ROW column, so its size multiplies by the
  * table's row count in the rewrite shuffle. At the 5M-doc corpus the
  * raw per-file listing was ~80 KB × 10M rows ≈ 800 GB of shuffle
  * payload (ENOSPC before any query). contentStamp is therefore a
  * fixed-width digest, and StampedTable caps what can land in the
  * column even if a caller composes something unbounded.
  */
class StampSpec extends SparkTestBase {

  test("contentStamp is fixed-width regardless of file count, and tracks content") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stamp_spec_").toString
    // a many-file table: 64 single-row files
    Seq.tabulate(64)(i => (i.toLong, s"row$i")).toDF("id", "v")
      .repartition(64).write.parquet(s"$dir/t.parquet")
    val s1 = Tables.contentStamp(spark, s"$dir/t.parquet")
    assert(s1.length < 100, s"stamp not bounded: ${s1.length} chars")
    assert(s1.startsWith("files="))
    // unchanged listing → identical stamp
    assert(Tables.contentStamp(spark, s"$dir/t.parquet") == s1)
    // appended file → different stamp
    Seq((999L, "x")).toDF("id", "v").write.mode("append").parquet(s"$dir/t.parquet")
    val s2 = Tables.contentStamp(spark, s"$dir/t.parquet")
    assert(s2 != s1 && s2.length < 100)
  }

  test("rowToken: identity under the cap, fixed-width digest past it") {
    val short = "dial=1\nfiles=3:md5=abc"
    assert(StampedTable.rowToken(short) == short)
    val long = "x" * 5000
    val tok = StampedTable.rowToken(long)
    assert(tok.length < 100 && tok.startsWith("md5:") && tok.endsWith("len=5000"))
    // deterministic, and distinct stamps stay distinct
    assert(StampedTable.rowToken(long) == tok)
    assert(StampedTable.rowToken("y" * 5000) != tok)
  }
}
