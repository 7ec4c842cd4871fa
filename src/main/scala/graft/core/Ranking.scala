package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W1/W2 — competition rank with ties, null-measure rows unranked
  * (reference app.py:605-646: rows with no supervisions are excluded from
  * the ranking universe and appended with posicion=None).
  *
  * Scale note: the rank window is unpartitioned, which funnels the ranked
  * set through one task. That is correct here by construction — ranking is
  * only ever applied to aggregated frames whose cardinality is the number
  * of groups/branches (tens to thousands), never to fact rows. Do not use
  * on unaggregated data.
  */
object Ranking {

  def rankWithNullsUnranked(df: DataFrame, measure: String, out: String = "posicion"): DataFrame = {
    val w = Window.orderBy(col(measure).desc)
    val ranked = df
      .filter(col(measure).isNotNull)
      .withColumn(out, rank().over(w))
    val unranked = df
      .filter(col(measure).isNull)
      .withColumn(out, lit(null).cast("int"))
    ranked.unionByName(unranked)
  }
}
