package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.etl.{CasSchema, Warehouse}
import graft.queries.CasServing
import graft.queries.CasServing.{RollupConfig, TerritoryConfig}

/** Serving-layer endpoints over a hand-built CAS warehouse, with the
  * reference's hard parts staged deliberately: tie ranking, unsupervised
  * group retained via ON-clause filter, weighted vs unweighted averages,
  * dense pivot, latest-per-branch.
  */
class CasServingSpec extends SparkTestBase {

  private val tc = TerritoryConfig(local = Seq("norte"), foranea = Seq("sur"))
  private val rc = RollupConfig(prefixes = Map("PLOG" -> "PLOG"))

  private lazy val wh: Warehouse = {
    val w = Warehouse(spark, Files.createTempDirectory("graft_serve_").toString)
    w.rewrite("grupos_operativos", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1, "PLOG Norte", true), Row(2, "PLOG Sur", true),
        Row(3, "Centro", true), Row(4, "Vacio", true))),
      CasSchema.grupos))
    w.rewrite("sucursales", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1, "Suc A", "NL", "local", 25.0, -100.0, 1, 101L, true),
        Row(2, "Suc B", "TM", "foraneo", 24.0, -99.0, 2, 102L, true),
        Row(3, "Suc C", "DF", "local", 19.0, -99.1, 3, 103L, true),
        Row(4, "Suc D", "JA", "local", 20.0, -103.0, 4, 104L, true),
        Row(5, "Suc E", "NL", "local", 25.1, -100.1, 3, 105L, false))),
      CasSchema.sucursales))
    w.rewrite("periodos_cas", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1, "P1", "Enero", java.sql.Date.valueOf("2026-01-01"), java.sql.Date.valueOf("2026-01-31"), true),
        Row(2, "P2", "Febrero", java.sql.Date.valueOf("2026-02-01"), java.sql.Date.valueOf("2026-02-28"), false))),
      CasSchema.periodos))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    w.rewrite("supervisiones_operativas", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "z1", 1, 1, "Ana", ts("2026-01-10 10:00:00"), 90.0, null, null),
        Row(2L, "z2", 2, 1, "Ana", ts("2026-01-11 10:00:00"), 90.0, null, null),
        Row(3L, "z3", 3, 1, "Bea", ts("2026-01-12 10:00:00"), 60.0, null, null),
        Row(4L, "z4", 1, 2, "Ana", ts("2026-02-10 10:00:00"), 80.0, null, null),
        Row(5L, "z5", 3, 1, "Bea", ts("2026-01-20 10:00:00"), 75.0, null, null))),
      CasSchema.supervisiones))
    w
  }

  test("kpis: scalar aggregates, buckets, coverage") {
    val k = CasServing.kpis(wh, "operativas", periodoId = Some(1)).collect().head
    assert(k.getAs[Double]("promedio_general") === 78.75)
    assert(k.getAs[Long]("total_supervisiones") === 4)
    assert(k.getAs[Long]("sucursales_evaluadas") === 3)
    assert(k.getAs[Long]("excelente") === 2)
    assert(k.getAs[Long]("regular") === 1)
    assert(k.getAs[Long]("critico") === 1)
    assert(k.getAs[Long]("total_sucursales") === 4) // Suc E inactive
    assert(k.getAs[Double]("cobertura_pct") === 75.0)
  }

  test("rankingGrupos: tie ranking, unsupervised group unranked, rollups") {
    val r = CasServing.rankingGrupos(wh, "operativas", periodoId = Some(1), tc = tc, rc = rc)
      .collect()
    val byName = r.map(x => x.getAs[String]("grupo") -> x).toMap
    assert(byName("PLOG Norte").getAs[Int]("posicion") === 1)
    assert(byName("PLOG Sur").getAs[Int]("posicion") === 1)   // 90 == 90 tie
    assert(byName("Centro").getAs[Int]("posicion") === 3)     // competition rank skips 2
    assert(byName("Vacio").isNullAt(byName("Vacio").fieldIndex("posicion"))) // W2
    assert(byName("Centro").getAs[Double]("promedio") === 67.5)
    // A11 weighted rollup over both PLOG groups' supervisions
    assert(byName("PLOG Norte").getAs[String]("agrupacion") === "PLOG")
    assert(byName("PLOG Norte").getAs[Double]("promedio_agrupacion") === 90.0)
    // T1 over configured lists
    assert(byName("PLOG Norte").getAs[String]("territorio") === "local")
    assert(byName("PLOG Sur").getAs[String]("territorio") === "foranea")
  }

  test("rankingGrupos territory filter keeps only matching groups") {
    val r = CasServing.rankingGrupos(wh, "operativas", Some(1), Some("local"), tc, rc).collect()
    assert(r.map(_.getAs[String]("grupo")).toSeq === Seq("PLOG Norte"))
  }

  test("historico: dense pivot, avg-of-avgs, EPL row") {
    val (matrix, grupoAvgs, epl) = CasServing.historico(wh, "operativas")
    val m = matrix.collect().map(r => r.getAs[String]("grupo") ->
      (Option(r.getAs[java.lang.Double]("P1")), Option(r.getAs[java.lang.Double]("P2")))).toMap
    assert(m("PLOG Norte") === (Some(90.0), Some(80.0)))
    assert(m("Centro") === (Some(67.5), None))
    assert(m("Vacio") === (None, None)) // dense matrix keeps empty cells
    val ga = grupoAvgs.collect().map(r => r.getAs[String]("grupo") -> r.getAs[Double]("promedio_general")).toMap
    assert(ga("PLOG Norte") === 85.0) // A10 unweighted mean of (90, 80)
    val e = epl.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(e("P1") === 82.5) // mean of 90, 90, 67.5
    assert(e("P2") === 80.0)
  }

  test("historico pivot caps an unbounded period domain: top-N columns + __otros") {
    // 130 periods >> the cap of 24: only the 24 NEWEST (by fecha_inicio)
    // become pivot columns — the header collect is a TakeOrdered of
    // cap+1 rows, bounded at any domain size — and every older period
    // folds into the single __otros column as an A10 average-of-averages.
    val w = Warehouse(spark, Files.createTempDirectory("graft_serve_wide_").toString)
    w.rewrite("grupos_operativos", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1, "Uno", true), Row(2, "Vacio", true))),
      CasSchema.grupos))
    w.rewrite("sucursales", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1, "Suc A", "NL", "local", 25.0, -100.0, 1, 101L, true))),
      CasSchema.sucursales))
    val base = java.time.LocalDate.of(2020, 1, 1)
    w.rewrite("periodos_cas", spark.createDataFrame(
      spark.sparkContext.parallelize((1 to 130).map { i =>
        Row(i, f"P$i%03d", s"M$i",
          java.sql.Date.valueOf(base.plusDays(i.toLong * 7)),
          java.sql.Date.valueOf(base.plusDays(i.toLong * 7 + 6)), i == 130)
      }),
      CasSchema.periodos))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    w.rewrite("supervisiones_operativas", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "z1", 1, 130, "Ana", ts("2026-01-10 10:00:00"), 90.0, null, null), // newest: kept column
        Row(2L, "z2", 1, 1, "Ana", ts("2020-01-10 10:00:00"), 70.0, null, null),   // folded
        Row(3L, "z3", 1, 2, "Ana", ts("2020-01-20 10:00:00"), 50.0, null, null))), // folded
      CasSchema.supervisiones))

    val (matrix, _, _) = CasServing.historico(w, "operativas", maxPivotPeriods = 24)
    val cols = matrix.columns.toSeq
    // 2 key columns + 24 newest period columns + the overflow bucket
    assert(cols.size === 2 + 24 + 1)
    assert(cols.last === CasServing.OtrosCol)
    assert(cols.contains("P130") && cols.contains("P107"))
    assert(!cols.contains("P106") && !cols.contains("P001"))

    val byGrupo = matrix.collect().map(r => r.getAs[String]("grupo") -> r).toMap
    val uno = byGrupo("Uno")
    assert(uno.getAs[java.lang.Double]("P130") === 90.0)
    // avg of the two folded periods' per-period promedios: (70 + 50) / 2
    assert(uno.getAs[java.lang.Double](CasServing.OtrosCol) === 60.0)
    val vacio = byGrupo("Vacio")
    assert(vacio.isNullAt(vacio.fieldIndex("P130")))
    assert(vacio.isNullAt(vacio.fieldIndex(CasServing.OtrosCol)))

    // under the cap nothing changes: the default path has no __otros
    val (small, _, _) = CasServing.historico(wh, "operativas")
    assert(!small.columns.contains(CasServing.OtrosCol))
    assert(small.columns.toSeq.endsWith(Seq("P1", "P2")))
  }

  test("historico tolerates a null periodo codigo: never a column, no driver NPE") {
    val w = Warehouse(spark, Files.createTempDirectory("graft_serve_nullp_").toString)
    w.rewrite("grupos_operativos", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1, "Uno", true))), CasSchema.grupos))
    w.rewrite("sucursales", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1, "Suc A", "NL", "local", 25.0, -100.0, 1, 101L, true))),
      CasSchema.sucursales))
    w.rewrite("periodos_cas", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1, "P1", "Enero", java.sql.Date.valueOf("2026-01-01"), java.sql.Date.valueOf("2026-01-31"), true),
        Row(2, null, "Roto", java.sql.Date.valueOf("2026-02-01"), java.sql.Date.valueOf("2026-02-28"), false))),
      CasSchema.periodos))
    w.rewrite("supervisiones_operativas", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "z1", 1, 1, "Ana", java.sql.Timestamp.valueOf("2026-01-10 10:00:00"), 90.0, null, null))),
      CasSchema.supervisiones))
    // the nullable codigo field previously NPE'd the driver-side header
    // sort; now a null codigo is filtered before the collect
    val (matrix, _, _) = CasServing.historico(w, "operativas")
    assert(matrix.columns.toSeq === Seq("grupo_id", "grupo", "P1"))
    assert(matrix.collect().head.getAs[java.lang.Double]("P1") === 90.0)
  }

  test("null-codigo rows never fold into __otros: both pivot modes drop them") {
    // Crossing the period-count cap must not change what a null-codigo
    // period contributes: the non-overflow matrix drops it (a null pivot
    // value is not in the headers), so the overflow fold has to drop it
    // too — previously `otherwise(__otros)` silently averaged it in.
    val w = Warehouse(spark, Files.createTempDirectory("graft_serve_nullov_").toString)
    w.rewrite("grupos_operativos", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1, "Uno", true))), CasSchema.grupos))
    w.rewrite("sucursales", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1, "Suc A", "NL", "local", 25.0, -100.0, 1, 101L, true))),
      CasSchema.sucursales))
    val base = java.time.LocalDate.of(2020, 1, 1)
    // 26 periods, one with a NULL codigo → 25 pivotable codes > cap 24:
    // overflow mode, with only the oldest (P001) folding into __otros
    w.rewrite("periodos_cas", spark.createDataFrame(
      spark.sparkContext.parallelize((1 to 26).map { i =>
        Row(i, if (i == 25) null else f"P$i%03d", s"M$i",
          java.sql.Date.valueOf(base.plusDays(i.toLong * 7)),
          java.sql.Date.valueOf(base.plusDays(i.toLong * 7 + 6)), i == 26)
      }),
      CasSchema.periodos))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    w.rewrite("supervisiones_operativas", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "z1", 1, 26, "Ana", ts("2020-07-10 10:00:00"), 90.0, null, null), // kept column
        Row(2L, "z2", 1, 1, "Ana", ts("2020-01-10 10:00:00"), 70.0, null, null),  // folded
        Row(3L, "z3", 1, 25, "Ana", ts("2020-06-20 10:00:00"), 50.0, null, null))), // null codigo: dropped
      CasSchema.supervisiones))
    val (matrix, _, _) = CasServing.historico(w, "operativas", maxPivotPeriods = 24)
    assert(matrix.columns.last === CasServing.OtrosCol)
    val uno = matrix.collect().head
    assert(uno.getAs[java.lang.Double]("P026") === 90.0)
    // only P001's promedio folds; 60.0 here means the null-codigo
    // supervision leaked into the overflow bucket
    assert(uno.getAs[java.lang.Double](CasServing.OtrosCol) === 70.0)
  }

  test("historicoHeatmap: top-N slice in promedio_general order (O4)") {
    // grupo averages: PLOG Sur 90.0, PLOG Norte 85.0, Centro 67.5, Vacio
    // no data -> top-2 slice keeps Sur then Norte, app.js:1024 style
    val h = CasServing.historicoHeatmap(wh, "operativas", top = 2).collect()
    assert(h.map(_.getAs[String]("grupo")).toSeq === Seq("PLOG Sur", "PLOG Norte"))
    // matrix columns survive the slice
    assert(h.head.schema.fieldNames.contains("P1"))
  }

  test("tableDump: allowlisted, runtime schema, stringified values (S7)") {
    val d = CasServing.tableDump(wh, "sucursales")
    assert(d.columns.toSeq === graft.etl.CasSchema.sucursales.fieldNames.toSeq)
    assert(d.count() === 5)
    assert(CasServing.tableDump(wh, "sucursales", limit = 3).count() === 3)
    assert(d.schema.fields.forall(_.dataType == org.apache.spark.sql.types.StringType))
    // str(v) keeps nulls null, stringifies the rest
    val row = d.filter(col("id") === "1").collect().head
    assert(row.getAs[String]("zenput_location_id") === "101")
    intercept[IllegalArgumentException] { CasServing.tableDump(wh, "sync_log") }
  }

  test("trend bar height floors at 5 (F13 greatest math)") {
    val w2 = Warehouse(spark, Files.createTempDirectory("graft_f13_").toString)
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    w2.rewrite("supervisiones_operativas", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "y1", 7, 1, "Ana", ts("2026-01-10 10:00:00"), 2.0, null, null),
        Row(2L, "y2", 7, 1, "Ana", ts("2026-01-11 10:00:00"), 88.0, null, null))),
      CasSchema.supervisiones))
    val t = CasServing.trendSucursal(w2, "operativas", sucursalId = 7)
      .collect().map(r => (r.getAs[Double]("calificacion"), r.getAs[Double]("bar_pct")))
    assert(t.toSeq === Seq((2.0, 5.0), (88.0, 88.0)))
  }

  test("periodosList: newest first, capped at 10") {
    val p = CasServing.periodosList(wh).collect()
    assert(p.map(_.getAs[Int]("id")).toSeq === Seq(2, 1))
    assert(p.head.schema.fieldNames.contains("fecha_inicio")) // every column
  }

  test("supervisionAreas: specific supervision's breakdown with periodo name") {
    val w2 = Warehouse(spark, Files.createTempDirectory("graft_supareas_").toString)
    w2.rewrite("periodos_cas", wh.periodos)
    w2.rewrite("supervisiones_operativas", wh.supervisiones("operativas"))
    w2.rewrite("catalogo_areas", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1, "A_SERV", "SERVICIO", 2), Row(2, "A_QUESO", "QUESO", 1))),
      CasSchema.catalogo))
    w2.rewrite("supervision_areas", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 1, 91.0), Row(1L, 2, 62.0), Row(4L, 1, 70.0))),
      CasSchema.detalle))
    // supervision 1 (NOT the branch's latest — that's z4): its own rows only
    val d = CasServing.supervisionAreas(w2, "operativas", supervisionId = 1L).collect()
    assert(d.map(_.getAs[String]("area")).toSeq === Seq("QUESO", "SERVICIO")) // numero order
    assert(d.map(_.getAs[Double]("porcentaje")).toSeq === Seq(62.0, 91.0))
    assert(d.forall(_.getAs[String]("periodo_nombre") === "Enero"))
    assert(d.forall(_.getAs[String]("fecha") === "10/01/2026"))
    assert(d.head.getAs[String]("color") === "critico") // 62 < 70
    // unknown id -> empty, the endpoint's 404 analog
    assert(CasServing.supervisionAreas(w2, "operativas", 999L).isEmpty)
  }

  test("setPeriodoActivo and updatePeriodoFechas rewrite the control table") {
    val w2 = Warehouse(spark, Files.createTempDirectory("graft_adminp_").toString)
    w2.rewrite("periodos_cas", wh.periodos)
    graft.etl.CasEtl.setPeriodoActivo(w2, 2)
    val activos = w2.periodos.filter(col("activo")).collect()
    assert(activos.map(_.getAs[Int]("id")).toSeq === Seq(2)) // all others off
    graft.etl.CasEtl.updatePeriodoFechas(w2, 2,
      java.sql.Date.valueOf("2026-02-02"), java.sql.Date.valueOf("2026-02-27"))
    val p2 = w2.periodos.filter(col("id") === 2).collect().head
    assert(p2.getAs[java.sql.Date]("fecha_inicio").toString === "2026-02-02")
    val p1 = w2.periodos.filter(col("id") === 1).collect().head
    assert(p1.getAs[java.sql.Date]("fecha_inicio").toString === "2026-01-01") // untouched
  }

  test("alertas: HAVING thresholds + severity labels") {
    val a = CasServing.alertas(wh, "operativas", Some(1)).collect()
    assert(a.length === 1)
    assert(a.head.getAs[String]("nombre") === "Suc C")
    assert(a.head.getAs[Double]("promedio") === 67.5)
    assert(a.head.getAs[String]("tipo_alerta") === "critical")
  }

  test("mapa: latest score per branch with severity color") {
    val m = CasServing.mapa(wh, "operativas").collect()
      .map(r => r.getAs[String]("nombre") -> r).toMap
    assert(m("Suc A").getAs[Double]("ultima_calificacion") === 80.0) // z4 is latest
    assert(m("Suc A").getAs[String]("color") === "bueno")
    assert(m("Suc C").getAs[Double]("ultima_calificacion") === 75.0) // z5 over z3
    assert(m("Suc D").getAs[String]("color") === "sin_datos")
    assert(!m.contains("Suc E")) // inactive filtered
  }

  test("detalle: latest supervision's breakdown joined to catalog in numero order") {
    val w = wh
    w.rewrite("catalogo_areas", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1, "A_SERV", "SERVICIO", 2), Row(2, "A_QUESO", "QUESO", 1))),
      graft.etl.CasSchema.catalogo))
    // detail rows for z4 (suc 1's LATEST supervision) and z1 (older)
    w.rewrite("supervision_areas", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(4L, 1, 91.0), Row(4L, 2, 82.0), Row(1L, 1, 10.0))),
      graft.etl.CasSchema.detalle))
    val d = CasServing.detalleSucursal(w, "operativas", sucursalId = 1).collect()
    assert(d.map(_.getAs[String]("codigo")).toSeq === Seq("A_QUESO", "A_SERV")) // numero order
    assert(d.map(_.getAs[Double]("porcentaje")).toSeq === Seq(82.0, 91.0))
    assert(d.forall(_.getAs[String]("zenput_submission_id") === "z4")) // latest only
    assert(d.head.getAs[String]("color") === "bueno")
  }

  test("trend: last-N in chronological order") {
    val t = CasServing.trendSucursal(wh, "operativas", sucursalId = 1, n = 4).collect()
    assert(t.map(_.getAs[Double]("calificacion")).toSeq === Seq(90.0, 80.0)) // z1 then z4
    assert(t.map(_.getAs[String]("fecha_corta")).toSeq === Seq("10/01", "10/02"))
  }

  test("estados: distinct states with counts, inactive excluded") {
    val e = CasServing.estados(wh).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(e.toSeq === Seq(("DF", 1L), ("JA", 1L), ("NL", 1L), ("TM", 1L))) // Suc E (NL) inactive
  }

  test("periodoContexto: containment first, else latest with data") {
    val inJan = CasServing.periodoContexto(wh, "operativas", java.sql.Date.valueOf("2026-01-15"))
      .collect().head
    assert(inJan.getAs[String]("codigo") === "P1")
    assert(inJan.getAs[String]("fuente") === "actual")
    val later = CasServing.periodoContexto(wh, "operativas", java.sql.Date.valueOf("2026-03-15"))
      .collect().head
    assert(later.getAs[String]("codigo") === "P2")
    assert(later.getAs[String]("fuente") === "ultimo_con_datos")
  }
}
