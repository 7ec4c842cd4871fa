package graft

import org.apache.spark.sql.functions._

import graft.functions.Skew

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  // 90% of rows on one hot key
  private lazy val big = ((1 to 900).map(i => ("hot", i.toDouble)) ++
    (1 to 100).map(i => (s"k${i % 10}", i.toDouble))).toDF("key", "v")

  test("salted aggregation equals direct aggregation") {
    val direct = big.groupBy("key")
      .agg(sum("v").as("sum_value"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(big, "key", "v", salts = 8, saltSource = col("v"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted === direct)
  }

  test("salted join equals plain join") {
    val small = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("key", "label")
    val plain = big.join(small, "key")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(big, small, "key", salts = 8, saltSource = col("v"))
      .select("key", "v", "label")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2))).toSet
    assert(salted === plain)
  }

  test("salting actually spreads the hot key across buckets") {
    val spread = big.withColumn("__salt", pmod(xxhash64(col("v")), lit(8)))
      .filter(col("key") === "hot")
      .select("__salt").distinct().count()
    assert(spread === 8)
  }

  test("q39 joins on (bucket_id, __salt) with the hot key spanning the salt space") {
    val df = graft.queries.Relational.q39SkewedJoin(spark, sf())
    // the physical join must key on the salt (shuffle path, not broadcast):
    // that is what splits the hot bucket across reducers
    val joinKeys = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
        j.leftKeys.map(_.toString).mkString(",")
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
        j.leftKeys.map(_.toString).mkString(",")
    }
    assert(joinKeys.exists(k => k.contains("bucket_id") && k.contains("__salt")),
      s"no shuffled join keyed on (bucket_id, __salt); joins: $joinKeys")
    assert(df.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }.isEmpty, "dim was broadcast — the salted shuffle path was not exercised")
    // the deliberate hot key (bucket 1) really spans all 8 salts
    val spread = graft.core.Tables.events(spark, sf())
      .withColumn("bucket_id", when(col("user_id") % 4 === 0, 1L).otherwise(col("user_id")))
      .filter(col("bucket_id") === 1L)
      .withColumn("__salt", pmod(xxhash64(col("event_id")), lit(8)))
      .select("__salt").distinct().count()
    assert(spread === 8)
  }
}
