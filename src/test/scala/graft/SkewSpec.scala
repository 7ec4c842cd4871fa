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
}
