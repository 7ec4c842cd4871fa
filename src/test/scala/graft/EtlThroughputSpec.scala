package graft

import java.nio.file.Files

import org.apache.spark.sql.Row

import graft.etl._

/** End-to-end sync throughput at a volume where set-at-a-time matters.
  *
  * The reference's row loop issues ≥4 SQL round-trips per submission
  * (dedup SELECT, periodo SELECT, INSERT..RETURNING, per-answer INSERTs —
  * etl_sync.py:215-260), so its ceiling is the DB round-trip rate. Here
  * the whole batch is one fixed set of jobs regardless of row count; this
  * spec pins that property with a measured rate on 10k submissions
  * (asserted conservatively — CI boxes vary; the info line carries the
  * real number) and exact row-level results.
  */
class EtlThroughputSpec extends SparkTestBase {
  import spark.implicits._

  private val NSubs = 10000
  private val NSucursales = 50

  test(s"sync of $NSubs submissions is one job set, not N round-trips") {
    val wh = Warehouse(spark, Files.createTempDirectory("graft_thr_").toString)
    val periodos = spark.createDataFrame(
      spark.sparkContext.parallelize((1 to 12).map { m =>
        val last = java.time.YearMonth.of(2026, m).atEndOfMonth()
        Row(m, f"P$m%02d", s"Periodo $m",
          java.sql.Date.valueOf(f"2026-$m%02d-01"), java.sql.Date.valueOf(last.toString), m == 1)
      }), CasSchema.periodos)
    val sucursales = spark.createDataFrame(
      spark.sparkContext.parallelize((1 to NSucursales).map { i =>
        Row(i, s"Suc $i", "NL", "local", 25.0 + i * 0.01, -100.0 - i * 0.01, 1, 100L + i, true)
      }), CasSchema.sucursales)
    val areas = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1, "AREA_QUESO", "QUESO", 1))),
      CasSchema.catalogo)
    wh.rewrite("periodos_cas", periodos)
    wh.rewrite("sucursales", sucursales)
    wh.rewrite("catalogo_areas", areas)
    wh.rewrite("catalogo_kpis_seguridad", areas.limit(0))

    val raw = (1 to NSubs).map { i =>
      val m = 1 + i % 12
      val d = 1 + i % 28
      val loc = 101 + i % NSucursales
      s"""{"id": "sub$i",
         | "smetadata": {"date_submitted": "2026-${f"$m%02d"}-${f"$d%02d"}T10:00:00",
         |   "lat": 25.1, "lon": -100.1,
         |   "location": {"id": $loc, "name": "loc$loc"},
         |   "created_by": {"display_name": "Sup${i % 7}"}},
         | "answers": [
         |   {"field_type": "formula", "title": "QUESO PORCENTAJE %", "value": ${50 + i % 50}.0},
         |   {"field_type": "formula", "title": "PORCENTAJE %", "value": ${60 + i % 40}.0}]}""".stripMargin
    }

    val t0 = System.nanoTime()
    val res = CasEtl.sync(wh, raw.toDF("json"), "operativas")
    val secs = (System.nanoTime() - t0) / 1e9
    val rate = NSubs / secs

    assert(res.fetched === NSubs)
    assert(res.nuevos === NSubs)
    assert(res.detalles === NSubs) // one QUESO area row each
    assert(wh.supervisiones("operativas").count() === NSubs)
    info(f"sync: $NSubs submissions in $secs%.1f s = $rate%.0f subs/s end-to-end " +
      "(parse, dedup, period+sucursal joins, master+detail+audit writes)")
    // conservative floor — the reference's per-row SQL round-trips cap it
    // far below this on any single node
    assert(rate > 250, f"throughput regressed: $rate%.0f subs/s")

    // and incremental re-sync of the same batch is pure dedup, no growth
    val res2 = CasEtl.sync(wh, raw.toDF("json"), "operativas")
    assert(res2.nuevos === 0)
    assert(wh.supervisiones("operativas").count() === NSubs)
  }
}
