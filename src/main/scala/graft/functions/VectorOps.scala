package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over ArrayType columns, built entirely from
  * codegen'd higher-order functions (zip_with/aggregate) — no UDF, no
  * serialization boundary, safe inside whole-stage codegen.
  *
  * All math is done in Double regardless of the storage type (testdata
  * embeddings are float32): both Spark and any SQL oracle then fold the
  * same per-element sequence left-to-right, keeping results reproducible.
  */
object VectorOps {

  /** Elementwise cast to double. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential left-fold dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def normSq(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d  = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(d / (na * nb))
  }
}
