package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (latest-prior-event) join — the brief's canonical "operator Spark
  * lacks". The efficient distributed formulation COMPOSES built-ins
  * (preference (a) of the extension ladder): tag both sides, union, and
  * take a running `last(right_payload, ignoreNulls)` over one
  * (key, ts)-sorted window. ONE shuffle on the key, no range-join
  * explosion, no custom SparkPlan required — a BroadcastNestedLoop or
  * custom exec would do strictly more work.
  *
  * Inclusivity: a right row AT the same timestamp matches (right sorts
  * before left on the tie-break column).
  */
object AsOf {

  /** Left rows + a `matched` struct holding the latest right row with
    * right.ts <= left.ts within the same key (null when none exists).
    * `matched` carries the right ts plus every other non-key right column.
    */
  def join(left: DataFrame, right: DataFrame, key: String, tsCol: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val rPayload = tsCol +: right.columns.filterNot(c => c == key || c == tsCol).toSeq
    val r = right.select(col(key), col(tsCol),
      struct(rPayload.map(col): _*).as("__rpay"))
    val rpayType = r.schema("__rpay").dataType

    val lTagged = left.select(
      (leftCols.map(col) :+ lit(1).as("__side") :+
        lit(null).cast(rpayType).as("__rpay")): _*)
    val rTagged = r
      .select((Seq(col(key), col(tsCol), lit(0).as("__side"), col("__rpay")) ++
        leftCols.filterNot(c => c == key || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
      .select(lTagged.columns.map(col).toIndexedSeq: _*) // align order

    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("matched", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) :+ col("matched")): _*)
  }
}
