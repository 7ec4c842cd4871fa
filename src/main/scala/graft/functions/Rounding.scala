package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** Portable cross-engine rounding.
  *
  * `round(double, d)` is NOT portable between engines: Spark rounds the
  * double's shortest decimal rendering ("8443.925" → .93) while DuckDB
  * rounds the binary value (8443.9249… → .92). A value sitting on a
  * .xxxxx5 boundary can therefore flip the last digit differently per
  * engine — and flip any threshold filter applied to the rounded value.
  *
  * floor(x·10^d + 0.5)/10^d is pure double arithmetic — identical
  * operations on the identical input on both engines, so the results are
  * bit-identical wherever the input doubles are (which they are whenever
  * both engines fold the same arithmetic in the same order). Used for the
  * money averages (Relational) and the ANN cosine columns (TextOps).
  */
object Rounding {

  def halfUp(c: Column, d: Int): Column =
    floor(c * math.pow(10, d) + 0.5) / math.pow(10, d)

  /** DuckDB twin of [[halfUp]] — same scale literal, same op order. */
  def halfUpSql(x: String, d: Int): String = {
    val scale = math.pow(10, d).toLong
    s"(floor(($x) * $scale.0 + 0.5) / $scale.0)"
  }
}
