package graft

import java.nio.file.{Files, Paths}

import graft.etl.Warehouse
import graft.streaming.StreamingIngest

class StreamingIngestSpec extends SparkTestBase {

  private def writeJsonFile(dir: String, name: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(dir, name), lines.mkString("\n").getBytes)

  private def sub(id: String, date: String): String =
    s"""{"id": "$id", "smetadata": {"date_submitted": "$date", "lat": 1.0, "lon": 2.0, "location": {"id": 101, "name": "x"}, "created_by": {"display_name": "Ana"}}, "answers": [{"field_type": "formula", "title": "PORCENTAJE %", "value": 88.5}]}"""

  test("file-stream ingest is exactly-once per submission across runs") {
    val input = Files.createTempDirectory("graft_stream_in_").toString
    val ckpt = Files.createTempDirectory("graft_stream_ck_").toString
    val wh = Warehouse(spark, Files.createTempDirectory("graft_stream_wh_").toString)

    // s1 appears twice in one file (in-batch dup) and again in file 2
    writeJsonFile(input, "f1.json", Seq(sub("s1", "2026-01-10T10:00:00"),
      sub("s1", "2026-01-10T10:00:00"), sub("s2", "2026-01-11T09:00:00")))
    StreamingIngest.ingestOnce(spark, input, wh, "operativas", ckpt)
    assert(wh.supervisiones("operativas").count() === 2)

    // second run: old files already checkpointed, new file has one dup +
    // one genuinely new submission
    writeJsonFile(input, "f2.json", Seq(sub("s1", "2026-01-10T10:00:00"),
      sub("s3", "2026-01-12T08:00:00")))
    StreamingIngest.ingestOnce(spark, input, wh, "operativas", ckpt)

    val rows = wh.supervisiones("operativas")
    assert(rows.count() === 3)
    assert(rows.select("zenput_submission_id").distinct().count() === 3)
    val s1 = rows.filter(org.apache.spark.sql.functions.col("zenput_submission_id") === "s1")
    assert(s1.count() === 1)
    assert(s1.collect().head.getAs[Double]("calificacion_general") === 88.5)
  }
}
