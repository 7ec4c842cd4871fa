package graft

import org.apache.spark.sql.functions._

import graft.functions.AsOf

class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of join picks the latest right row at-or-before each left row") {
    val left = Seq(
      (1L, ts("2026-01-01 10:00:00"), "p1"),
      (1L, ts("2026-01-01 12:00:00"), "p2"),
      (2L, ts("2026-01-01 09:00:00"), "p3")) // no prior right row
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2026-01-01 09:30:00"), 100.0),
      (1L, ts("2026-01-01 10:00:00"), 200.0), // equal ts: matches p1 (inclusive)
      (1L, ts("2026-01-01 11:00:00"), 300.0),
      (2L, ts("2026-01-01 23:00:00"), 400.0)) // after p3 -> no match
      .toDF("user_id", "ts", "score")

    val got = AsOf.join(left, right, "user_id", "ts")
      .select(col("tag"), col("matched.score").as("score"))
      .collect().map(r => (r.getString(0), Option(r.getAs[java.lang.Double]("score")).map(_.toDouble)))
      .toMap
    assert(got("p1") === Some(200.0)) // equal-ts right row wins over 09:30
    assert(got("p2") === Some(300.0)) // latest before 12:00
    assert(got("p3") === None)        // nothing at-or-before
  }

  test("as-of join plans a single shuffle") {
    val left = Seq((1L, ts("2026-01-01 10:00:00"), "x")).toDF("user_id", "ts", "tag")
    val right = Seq((1L, ts("2026-01-01 09:00:00"), 1.0)).toDF("user_id", "ts", "score")
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val shuffles = AsOf.join(left, right, "user_id", "ts")
        .queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
      assert(shuffles.length === 1)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
