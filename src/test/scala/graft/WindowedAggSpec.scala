package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Sessionize.Event
import graft.streaming.WindowedAgg

class WindowedAggSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming windowed agg (complete mode) equals the batch result") {
    implicit val sqlCtx = spark.sqlContext
    val events = graft.core.Tables.eventsTs(spark, sf())
      .select(col("user_id"), col("ts"), col("value"),
        col("event_type"))
    val rows = events.as[(Long, java.sql.Timestamp, Double, String)].collect()

    val input = MemoryStream[(Long, java.sql.Timestamp, Double, String)]
    val streamDf = input.toDF().toDF("user_id", "ts", "value", "event_type")
    val q = WindowedAgg.hourly(streamDf)
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("complete").start()
    try {
      input.addData(rows.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("hourly_out")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = WindowedAgg.hourly(events)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
