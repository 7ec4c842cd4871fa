package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J7 interval-containment period assignment + J9 location fallback
  * enrichment (reference etl_sync.py:228-233, 280-293).
  */
object PeriodAssign {

  /** Assign each submission its period: submission date (ISO string, first
    * 10 chars — mirroring the reference's `fecha[:10]`) BETWEEN
    * fecha_inicio AND fecha_fin, both ends inclusive. The reference's
    * `LIMIT 1` on overlapping periods is arbitrary; we make it
    * deterministic — earliest fecha_inicio wins (SURVEY.md §7.4).
    * Periods are dozens of rows → broadcast nested-loop join, no shuffle
    * of the fact side.
    */
  def assignPeriod(parsed: DataFrame, periodos: DataFrame): DataFrame = {
    val p = broadcast(periodos.select(
      col("id").as("periodo_id"), col("fecha_inicio"), col("fecha_fin")))
    val withDate = parsed.withColumn("fecha_date",
      to_date(try_to_timestamp(substring(col("date_submitted"), 1, 10), lit("yyyy-MM-dd"))))
    val w = Window.partitionBy(col("zenput_submission_id"))
      .orderBy(col("fecha_inicio").asc_nulls_last)
    withDate
      .join(p, col("fecha_date").between(col("fecha_inicio"), col("fecha_fin")), "left")
      .withColumn("p_rank", row_number().over(w))
      .filter(col("p_rank") === 1)
      .drop("fecha_inicio", "fecha_fin", "p_rank")
  }

  /** J9 — seguridad submissions may arrive without a location; infer it
    * from an operativas master row by the same supervisor on the same day
    * (etl_sync.py:280-293). The reference's LIMIT 1 is arbitrary; we take
    * the smallest matching zenput_location_id. Equi-join on
    * (date, supervisor) — the inferred side is aggregated before the join
    * so each submission matches at most one row.
    */
  def inferLocation(parsed: DataFrame, operativasMaster: DataFrame,
                    sucursales: DataFrame): DataFrame = {
    val opLoc = operativasMaster
      .join(sucursales.select(col("id").as("s_id"), col("zenput_location_id").as("s_loc")),
        col("sucursal_id") === col("s_id"))
      .select(to_date(col("fecha_supervision")).as("op_date"),
        col("supervisor").as("op_supervisor"), col("s_loc"))
      .groupBy(col("op_date"), col("op_supervisor"))
      .agg(min(col("s_loc")).as("inferred_loc"))
    parsed
      .join(opLoc,
        to_date(try_to_timestamp(substring(col("date_submitted"), 1, 10), lit("yyyy-MM-dd"))) === col("op_date") &&
          col("supervisor") === col("op_supervisor"),
        "left")
      .withColumn("zenput_location_id",
        coalesce(col("zenput_location_id"), col("inferred_loc")))
      .drop("op_date", "op_supervisor", "inferred_loc")
  }
}
