package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** The co-located join story for repeated fact⋈fact joins at scale:
  * bucketed tables joined on the bucket key need no Exchange at all.
  */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed tables join without a shuffle") {
    val a = (1L to 2000L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (1L to 2000L).map(i => (i, i * 2.0)).toDF("k", "vb")
    a.write.bucketBy(4, "k").sortBy("k").mode("overwrite").saveAsTable("bk_a")
    b.write.bucketBy(4, "k").sortBy("k").mode("overwrite").saveAsTable("bk_b")

    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // Exchanges are inserted by EnsureRequirements (executedPlan), and
      // AQE wraps executedPlan — disable it so the plan is inspectable
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("bk_a").join(spark.table("bk_b"), "k")
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty, "bucketed join must not add an Exchange")
      assert(joined.count() === 2000)

      // contrast: the same join over unbucketed parquet scans shuffles
      val o = spark.read.parquet(s"${sf()}/orders.parquet")
      val c = spark.read.parquet(s"${sf()}/customer.parquet")
      val plain = o.join(c, o("o_custkey") === c("c_custkey"))
      val plainShuffles = plain.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(plainShuffles.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
