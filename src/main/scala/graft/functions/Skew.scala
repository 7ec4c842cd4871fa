package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling patterns for hot keys at scale. AQE's skew-join split
  * covers sort-merge joins automatically; these explicit forms cover the
  * cases AQE can't: skewed aggregation keys, and broadcast-averse joins
  * where one key dominates a partition.
  *
  * Both are deterministic — the salt derives from xxhash64 of stable
  * columns, never rand() — so re-runs and retried tasks agree.
  */
object Skew {

  /** Two-phase salted aggregation: partial aggregate on (key, salt) spreads
    * a hot key over `salts` reducers, then the final aggregate merges the
    * partials. Caller supplies partial/final measure pairs that compose
    * (sum/sum, count/sum, min/min, ...).
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String, salts: Int,
                     saltSource: Column): DataFrame =
    df
      .withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("sum_value"),
           sum(col("__pcnt")).as("cnt"))

  /** Salted equi-join: the skewed big side gets a deterministic salt in
    * [0, salts); the small side is replicated `salts` times (explode), so
    * each (key, salt) bucket joins independently. Output equals the plain
    * join — SkewSpec asserts it.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
                 saltSource: Column): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
