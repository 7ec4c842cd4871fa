package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Derived-attribute classifiers (SURVEY.md §2.8 T1-T3).
  *
  * All are pure `when`-chains over Columns — Catalyst-visible (constant
  * folding, codegen) where the reference used opaque Python functions
  * (app.py:32-55). No UDFs: a UDF would block predicate pushdown when a
  * filter lands on the derived column.
  */
object Classify {

  /** T2 — severity bucketizer (reference app.py:32-42): `>=` thresholds,
    * exactly 90.0 → "excelente"; null → "sin_datos".
    */
  def severity(score: Column): Column =
    when(score.isNull, "sin_datos")
      .when(score >= 90, "excelente")
      .when(score >= 80, "bueno")
      .when(score >= 70, "regular")
      .otherwise("critico")

  /** Severity over an arbitrary numeric domain: rescale thresholds by
    * `scale` (the reference's scores are 0-100; testdata measures aren't).
    */
  def severityScaled(score: Column, scale: Double): Column =
    when(score.isNull, "sin_datos")
      .when(score >= 90 * scale, "excelente")
      .when(score >= 80 * scale, "bueno")
      .when(score >= 70 * scale, "regular")
      .otherwise("critico")

  /** T1 — territory classifier (reference app.py:44-55): membership of a
    * name in two hard-coded lists, case-insensitive → local/foranea/mixto.
    */
  def territory(name: Column, local: Seq[String], foranea: Seq[String]): Column = {
    val n = lower(name)
    when(local.map(p => n.contains(p.toLowerCase)).reduce(_ || _), "local")
      .when(foranea.map(p => n.contains(p.toLowerCase)).reduce(_ || _), "foranea")
      .otherwise("mixto")
  }

  /** T3 — roll-up ("agrupación") key by name prefix
    * (reference app.py:57-63): first matching prefix wins, else the name
    * itself (group is its own roll-up).
    */
  def rollupKey(name: Column, prefixes: Map[String, String]): Column =
    prefixes.foldLeft(when(lit(false), lit(""))) { case (acc, (prefix, key)) =>
      acc.when(name.startsWith(prefix), key)
    }.otherwise(name)
}
