package graft

import java.nio.file.Files

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.etl._

/** S2 — the paginated REST driver (reference fetch_zenput,
  * etl_sync.py:90-120): offset stepping, short/empty-page stop, the
  * log-and-keep-partial failure contract, bounded retries, and the
  * end-to-end syncPaged path including a mid-run duplicate and a
  * partial-fetch-then-resume cycle.
  */
class PagedFetchSpec extends SparkTestBase {
  import spark.implicits._

  // ---- pure fetch-loop tests -------------------------------------------

  /** A fake transport serving `rows` in pages of `pageSize`, recording the
    * offsets requested and failing on listed offsets (once per entry).
    */
  private class FakeApi(rows: Seq[String], pageSize: Int,
                        failAt: Seq[Int] = Nil) {
    var requested: Vector[Int] = Vector.empty
    private var remainingFailures = scala.collection.mutable.ArrayBuffer(failAt: _*)
    def fetch(offset: Int): Try[Seq[String]] = {
      requested :+= offset
      if (remainingFailures.contains(offset)) {
        remainingFailures -= offset
        Failure(new RuntimeException(s"boom at $offset"))
      } else Success(rows.slice(offset, offset + pageSize))
    }
  }

  private val docs = (1 to 5).map(i => s"row$i")

  test("stops on a short final page; offsets step by pageSize") {
    val api = new FakeApi(docs, pageSize = 2)
    val res = PagedFetch.fetchAll(api.fetch, pageSize = 2)
    assert(res.rows === docs.toVector)
    assert(res.complete)
    assert(res.pages === 3)
    assert(api.requested === Vector(0, 2, 4)) // short page 4 ends the loop
  }

  test("stops on an empty page when rows are an exact page multiple") {
    val api = new FakeApi(docs.take(4), pageSize = 2)
    val res = PagedFetch.fetchAll(api.fetch, pageSize = 2)
    assert(res.rows.size === 4)
    assert(res.complete)
    assert(res.pages === 2)
    assert(api.requested === Vector(0, 2, 4)) // empty page 4 ends the loop
  }

  test("mid-stream failure keeps the partial extract (etl_sync.py:115-118)") {
    val api = new FakeApi(docs, pageSize = 2, failAt = Seq(2))
    val res = PagedFetch.fetchAll(api.fetch, pageSize = 2)
    assert(res.rows === Vector("row1", "row2"))
    assert(!res.complete)
    assert(res.pages === 1)
  }

  test("bounded retries recover a transient failure") {
    val api = new FakeApi(docs, pageSize = 2, failAt = Seq(2))
    val res = PagedFetch.fetchAll(api.fetch, pageSize = 2, maxRetries = 1)
    assert(res.rows === docs.toVector)
    assert(res.complete)
    assert(api.requested === Vector(0, 2, 2, 4)) // offset 2 attempted twice
  }

  // ---- end-to-end through CasEtl.syncPaged -----------------------------

  private def freshWarehouse(): Warehouse = {
    val wh = Warehouse(spark, Files.createTempDirectory("graft_pf_").toString)
    val periodos = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1, "P1", "Enero", java.sql.Date.valueOf("2026-01-01"),
          java.sql.Date.valueOf("2026-01-31"), true))),
      CasSchema.periodos)
    val sucursales = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1, "Suc Uno", "NL", "local", 25.6, -100.3, 10, 101L, true))),
      CasSchema.sucursales)
    val areas = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1, "AREA_QUESO", "QUESO", 1))),
      CasSchema.catalogo)
    wh.rewrite("periodos_cas", periodos)
    wh.rewrite("sucursales", sucursales)
    wh.rewrite("catalogo_areas", areas)
    wh.rewrite("catalogo_kpis_seguridad", areas.limit(0))
    wh
  }

  private def sub(id: String, day: Int, score: Double, year: Int = 2026): String =
    s"""{"id": "$id",
       | "smetadata": {"date_submitted": "$year-01-${f"$day%02d"}T10:00:00",
       |   "lat": 25.1, "lon": -100.1,
       |   "location": {"id": 101, "name": "loc101"},
       |   "created_by": {"display_name": "Ana"}},
       | "answers": [{"field_type": "formula", "title": "PORCENTAJE %", "value": $score}]}""".stripMargin

  // s2 appears on page 1 AND page 3 — the overlapping-pagination duplicate
  private val stream: Seq[String] = Seq(
    sub("s1", 10, 90.0), sub("s2", 11, 80.0), // page at offset 0
    sub("s3", 12, 70.0), sub("s4", 13, 60.0), // page at offset 2
    sub("s2", 11, 80.0))                      // page at offset 4 (short)

  test("e2e: three pages with a mid-run duplicate load exactly once each") {
    val wh = freshWarehouse()
    val api = new FakeApi(stream, pageSize = 2)
    val res = CasEtl.syncPaged(wh, api.fetch, "operativas", pageSize = 2)
    assert(api.requested === Vector(0, 2, 4))
    assert(res.fetched === 5)  // reference counts every fetched row, dups included
    assert(res.nuevos === 4)   // s2 landed once
    val master = wh.supervisiones("operativas")
    assert(master.count() === 4)
    assert(master.groupBy("zenput_submission_id").count()
      .filter(col("count") > 1).count() === 0)
  }

  test("e2e: partial fetch syncs what landed; next run recovers the tail") {
    val wh = freshWarehouse()
    // run 1: transport dies at offset 2 -> only s1, s2 land
    val api1 = new FakeApi(stream, pageSize = 2, failAt = Seq(2))
    val res1 = CasEtl.syncPaged(wh, api1.fetch, "operativas", pageSize = 2)
    assert(res1.nuevos === 2)
    assert(wh.supervisiones("operativas").count() === 2)
    // a partial run never advances the checkpoint: the unfetched tail must
    // stay reachable under ANY page-stream ordering (a max-landed-date
    // checkpoint would drop same-timestamp boundary rows, or the whole
    // older tail on a newest-first stream)
    assert(wh.checkpoints
      .filter(col("formulario") === "supervisiones_operativas").count() === 0)
    val estado = wh.syncLog
      .orderBy(col("inicio").desc).select("estado").first().getString(0)
    assert(estado === "partial")

    // run 2: healthy transport -> the full stream replays; s1/s2 dedup via
    // the J8 anti-join, s3/s4 land, the in-batch dup s2 collapses
    val api2 = new FakeApi(stream, pageSize = 2)
    val res2 = CasEtl.syncPaged(wh, api2.fetch, "operativas", pageSize = 2)
    assert(res2.nuevos === 2)
    assert(wh.supervisiones("operativas").count() === 4)
  }

  test("e2e: partial fetch never moves an existing checkpoint — rows landed or not") {
    val wh = freshWarehouse()
    CasEtl.syncPaged(wh, new FakeApi(stream, 2).fetch, "operativas", pageSize = 2)
    def ckpt() = wh.checkpoints
      .filter(col("formulario") === "supervisiones_operativas")
      .select("ultima_fecha").first().getTimestamp(0)
    val before = ckpt()

    // dead from the first page: nothing lands, checkpoint stays put
    val res = CasEtl.syncPaged(wh,
      new FakeApi(stream, 2, failAt = Seq(0)).fetch, "operativas", pageSize = 2)
    assert(res.nuevos === 0)
    assert(ckpt() === before)

    // NEW (post-checkpoint, 2027) rows land before the stream dies: they
    // load, but the checkpoint still must not advance — the unfetched n3
    // must survive for the next run
    val stream27 = Seq(sub("n1", 10, 91.0, year = 2027), sub("n2", 11, 81.0, year = 2027),
      sub("n3", 12, 71.0, year = 2027))
    val res2 = CasEtl.syncPaged(wh,
      new FakeApi(stream27, pageSize = 2, failAt = Seq(2)).fetch, "operativas", pageSize = 2)
    assert(res2.nuevos === 2) // n1, n2 landed
    assert(ckpt() === before) // landed rows did NOT move the checkpoint
    // healthy retry recovers the tail; overlap dedups
    val res3 = CasEtl.syncPaged(wh,
      new FakeApi(stream27, pageSize = 2).fetch, "operativas", pageSize = 2)
    assert(res3.nuevos === 1) // only n3
    assert(wh.supervisiones("operativas").count() === 7) // 4 + n1 + n2 + n3
  }
}
