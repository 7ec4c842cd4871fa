package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over ArrayType columns.
  *
  * The dot product — the only kernel that runs per candidate PAIR, not per
  * row — is a native codegen'd expression ([[NativeVector.DotProduct]]);
  * the interpreted HOF formulation it replaces is kept as `dotHof` for the
  * equivalence spec. Everything per-row (casts) stays HOF.
  *
  * All math is done in Double regardless of the storage type (testdata
  * embeddings are float32): both Spark and any SQL oracle then fold the
  * same per-element sequence left-to-right, keeping results reproducible.
  */
object VectorOps {

  private val B = org.apache.spark.sql.graftshim.ColumnBridge

  /** Elementwise cast to double. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential left-fold dot product (native, codegen'd). */
  def dot(a: Column, b: Column): Column =
    B.column(NativeVector.DotProduct(B.expression(a), B.expression(b)))

  /** The readable HOF formulation of [[dot]] — interpreted, per-element;
    * exists as the semantic reference the native kernel is specced
    * against (NativeHashesSpec pattern).
    */
  def dotHof(a: Column, b: Column): Column =
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
