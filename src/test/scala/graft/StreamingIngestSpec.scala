package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

import graft.etl.{CasEtl, CasSchema, Warehouse}
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

  /** A warehouse with the period + sucursal dims the full master
    * construction resolves against (same shape as CasEtlSpec's fixture).
    */
  private def dimWarehouse(): Warehouse = {
    val wh = Warehouse(spark, Files.createTempDirectory("graft_stream_wh_").toString)
    wh.rewrite("periodos_cas", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1, "P1", "Enero", java.sql.Date.valueOf("2026-01-01"), java.sql.Date.valueOf("2026-01-31"), true),
        Row(2, "P2", "Febrero", java.sql.Date.valueOf("2026-02-01"), java.sql.Date.valueOf("2026-02-28"), false))),
      CasSchema.periodos))
    wh.rewrite("sucursales", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1, "Suc Uno", "NL", "local", 25.6, -100.3, 10, 101L, true),
        Row(2, "Suc Dos", "CDMX", "foraneo", 19.4, -99.1, 11, 102L, true))),
      CasSchema.sucursales))
    wh
  }

  test("streamed master rows equal the batch sync's, periodo and sucursal included") {
    // The streaming ingest runs the exact master construction the batch
    // sync runs (shared CasEtl.dedupEarliest/locateFresh/masterFrom), so
    // on identical input the two warehouses must hold identical master
    // rows — period interval join and sucursal lookup resolved, not the
    // round-5 null stubs (reference semantics: etl_sync.py:228-241).
    // Fixture spans both periods, an unknown location (sucursal_id null)
    // and a date outside every period (periodo_id null).
    val lines = Seq(
      sub2("s1", 101L, "2026-01-15T10:00:00"), // P1, Suc 1
      sub2("s2", 102L, "2026-02-05T12:00:00"), // P2, Suc 2
      sub2("s3", 999L, "2026-01-20T09:00:00"), // unknown location -> sucursal null
      sub2("s4", 101L, "2026-03-02T08:00:00")) // no period -> periodo null

    val whStream = dimWarehouse()
    val input = Files.createTempDirectory("graft_stream_in2_").toString
    val ckpt = Files.createTempDirectory("graft_stream_ck2_").toString
    writeJsonFile(input, "f1.json", lines)
    StreamingIngest.ingestOnce(spark, input, whStream, "operativas", ckpt)

    val whBatch = dimWarehouse()
    import spark.implicits._
    CasEtl.sync(whBatch, lines.toDF("json"), "operativas")

    val cols = whBatch.supervisiones("operativas").columns.sorted.map(col)
    def dump(wh: Warehouse) = wh.supervisiones("operativas")
      .select(cols.toIndexedSeq: _*).collect().map(_.toSeq).toSet
    val streamed = dump(whStream)
    assert(streamed === dump(whBatch))
    assert(streamed.size === 4)

    // spot-check the resolutions themselves so a shared bug can't hide
    val byId = whStream.supervisiones("operativas").collect()
      .map(r => r.getAs[String]("zenput_submission_id") -> r).toMap
    assert(byId("s1").getAs[Int]("periodo_id") === 1)
    assert(byId("s1").getAs[Int]("sucursal_id") === 1)
    assert(byId("s2").getAs[Int]("periodo_id") === 2)
    assert(byId("s2").getAs[Int]("sucursal_id") === 2)
    assert(byId("s3").isNullAt(byId("s3").fieldIndex("sucursal_id")))
    assert(byId("s4").isNullAt(byId("s4").fieldIndex("periodo_id")))
  }

  private def sub2(id: String, locId: Long, date: String): String =
    s"""{"id": "$id", "smetadata": {"date_submitted": "$date", "lat": 1.0, "lon": 2.0, "location": {"id": $locId, "name": "x"}, "created_by": {"display_name": "Ana"}}, "answers": [{"field_type": "formula", "title": "PORCENTAJE %", "value": 88.5}]}"""
}
