package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Event, Session}

class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // user 1: two sessions (45-min gap); user 2: one session
  private val fixture = Seq(
    Event(1L, ts("2026-01-01 10:00:00"), 1.0),
    Event(1L, ts("2026-01-01 10:10:00"), 2.0),
    Event(1L, ts("2026-01-01 10:55:00"), 4.0), // 45 min after -> new session
    Event(2L, ts("2026-01-01 09:00:00"), 8.0),
    Event(2L, ts("2026-01-01 09:29:00"), 16.0)) // 29 min -> same session

  test("batch sessionization: gap splits, totals, bounds") {
    val got = Sessionize.sessionsBatch(fixture.toDF())
      .orderBy("user_id", "session_no")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_no"),
        r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))
    assert(got.toSeq === Seq((1L, 1L, 2L, 3.0), (1L, 2L, 1L, 4.0), (2L, 1L, 2L, 24.0)))
  }

  test("streaming flatMapGroupsWithState matches batch sessionization") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = Sessionize.sessionsStreaming(input.toDS())
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      input.addData(fixture: _*)
      query.processAllAvailable()
      // watermark-advancing sentinel: far-future event for an unused user
      // flushes every open session via event-time timeout
      input.addData(Event(999L, ts("2026-01-02 00:00:00"), 0.0))
      query.processAllAvailable()
      input.addData(Event(998L, ts("2026-01-03 00:00:00"), 0.0))
      query.processAllAvailable()

      val streamed = spark.table("sessions_out").as[Session].collect()
        .filter(_.user_id < 900)
        .map(s => (s.user_id, s.session_start, s.session_end, s.n_events, s.total_value))
        .toSet
      val batch = Sessionize.sessionsBatch(fixture.toDF()).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("session_start"),
          r.getAs[java.sql.Timestamp]("session_end"), r.getAs[Long]("n_events"),
          r.getAs[Double]("total_value")))
        .toSet
      assert(streamed === batch)
    } finally query.stop()
  }

  test("batch sessionization over testdata events conserves event count") {
    val ev = graft.core.Tables.eventsTs(spark, sf())
    val sessions = Sessionize.sessionsBatch(ev)
    assert(sessions.agg(sum("n_events")).first().getLong(0) === ev.count())
    assert(sessions.count() > 0)
  }
}
