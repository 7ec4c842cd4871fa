package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semi-structured parsing + extraction (SURVEY.md §2.8 T4-T7).
  *
  * The reference walks each submission's answers array in Python row loops
  * (etl_sync.py:122-194); here each extractor is a set-at-a-time dataflow:
  * from_json → explode → broadcast-joined catalog lookup → window dedup.
  * Everything shuffles at most once, on the (submission, code) key.
  */
object SubmissionParse {

  /** Raw JSON strings → typed submission frame (F11). */
  def parse(raw: DataFrame, jsonCol: String = "json"): DataFrame =
    raw
      .select(from_json(col(jsonCol), CasSchema.submission).as("sub"))
      .select(
        col("sub.id").cast("string").as("zenput_submission_id"),
        col("sub.smetadata.date_submitted").as("date_submitted"),
        col("sub.smetadata.lat").as("lat"),
        col("sub.smetadata.lon").as("lon"),
        col("sub.smetadata.location.id").as("zenput_location_id"),
        col("sub.smetadata.created_by.display_name").as("supervisor"),
        col("sub.answers").as("answers"))
      .filter(col("zenput_submission_id").isNotNull)

  /** T6 — general score: the FIRST answer (in answers order, matching the
    * reference's loop at etl_sync.py:160-177) whose normalized title is one
    * of the two known score titles. Null if absent.
    */
  def generalScore(answers: Column): Column = {
    val matches = filter(answers, a =>
      a.getField("field_type") === "formula" &&
        upper(trim(a.getField("title")))
          .isin("PORCENTAJE %", "CALIFICACION PORCENTAJE %"))
    when(size(matches) > 0, element_at(matches, 1).getField("value"))
  }

  /** Title normalization for area matching (etl_sync.py:123-127): upper,
    * strip CALIFICACION/CALIFICACIÓN/PORCENTAJE/%, trim.
    */
  def cleanTitle(title: Column): Column =
    trim(regexp_replace(upper(title), "CALIFICACION|CALIFICACIÓN|PORCENTAJE|%", ""))

  /** T4 + T7 + W6 — explode answers to (submission, area codigo, value)
    * rows against an area catalog (codigo, nombre-key, numero).
    *
    * Matching tiers (etl_sync.py:128-139): exact clean-title == key; then
    * fuzzy substring either way (lowest `numero` wins, mirroring the
    * reference's dict order); then the CALIFICACION_GENERAL sentinel for
    * bare "PORCENTAJE %" titles. First matching ANSWER wins per (submission,
    * codigo) — `if codigo not in areas` at etl_sync.py:154-156.
    *
    * Output: zenput_submission_id, codigo, porcentaje.
    */
  def extractAreas(parsed: DataFrame, areaCatalog: DataFrame): DataFrame = {
    val exploded = parsed
      .select(col("zenput_submission_id"), posexplode(col("answers")).as(Seq("pos", "a")))
      .filter(col("a.field_type") === "formula" &&
        upper(col("a.title")).contains("PORCENTAJE") &&
        col("a.value").isNotNull)
      .select(col("zenput_submission_id"), col("pos"),
        col("a.title").as("title"), col("a.value").as("value"))
      .withColumn("clean", cleanTitle(col("title")))

    val cat = broadcast(areaCatalog.select(
      col("codigo").as("cat_codigo"), upper(col("nombre")).as("cat_key"), col("numero")))

    // tier 1: exact; tier 2: substring either direction; tier 3: sentinel
    val joined = exploded
      .join(cat,
        col("clean") === col("cat_key") ||
          col("cat_key").contains(col("clean")) ||
          col("clean").contains(col("cat_key")),
        "left")
      .withColumn("tier",
        when(col("clean") === col("cat_key"), 1)
          .when(col("cat_codigo").isNotNull, 2)
          .otherwise(3))
      .withColumn("codigo",
        when(col("cat_codigo").isNotNull, col("cat_codigo"))
          .when(upper(trim(col("title"))).isin("PORCENTAJE %", "PORCENTAJE"),
            lit("CALIFICACION_GENERAL")))
      .filter(col("codigo").isNotNull)

    // best catalog match per answer: exact beats fuzzy, then dict order
    val perAnswer = Window.partitionBy(col("zenput_submission_id"), col("pos"))
      .orderBy(col("tier"), col("numero").asc_nulls_last)
    // first answer wins per (submission, codigo)
    val perCode = Window.partitionBy(col("zenput_submission_id"), col("codigo"))
      .orderBy(col("pos"))

    joined
      .withColumn("match_rank", row_number().over(perAnswer))
      .filter(col("match_rank") === 1)
      .withColumn("first_rank", row_number().over(perCode))
      .filter(col("first_rank") === 1)
      .select(col("zenput_submission_id"), col("codigo"), col("value").as("porcentaje"))
  }

  /** T5 — KPI extraction (etl_sync.py:179-194): answer title contains
    * "<KEY> PORCENTAJE" or "<KEY> CALIFICACION"; first matching KEY in
    * catalog order (`break`), and — unlike areas — the LAST matching answer
    * wins per code (`kpis[code] = value` with no guard).
    */
  def extractKpis(parsed: DataFrame, kpiCatalog: DataFrame): DataFrame = {
    val exploded = parsed
      .select(col("zenput_submission_id"), posexplode(col("answers")).as(Seq("pos", "a")))
      .filter(col("a.field_type") === "formula" && col("a.value").isNotNull)
      .select(col("zenput_submission_id"), col("pos"),
        upper(col("a.title")).as("title_up"), col("a.value").as("value"))

    val cat = broadcast(kpiCatalog.select(
      col("codigo").as("cat_codigo"), upper(col("nombre")).as("cat_key"), col("numero")))

    val joined = exploded
      .join(cat,
        col("title_up").contains(concat(col("cat_key"), lit(" PORCENTAJE"))) ||
          col("title_up").contains(concat(col("cat_key"), lit(" CALIFICACION"))))

    val perAnswer = Window.partitionBy(col("zenput_submission_id"), col("pos"))
      .orderBy(col("numero"))
    val perCode = Window.partitionBy(col("zenput_submission_id"), col("cat_codigo"))
      .orderBy(col("pos").desc) // LAST answer wins

    joined
      .withColumn("match_rank", row_number().over(perAnswer))
      .filter(col("match_rank") === 1)
      .withColumn("last_rank", row_number().over(perCode))
      .filter(col("last_rank") === 1)
      .select(col("zenput_submission_id"),
        col("cat_codigo").as("codigo"), col("value").as("porcentaje"))
  }
}
