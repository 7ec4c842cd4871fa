package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamDedup

/** record for the MemoryStream encoder */
case class SDoc(doc_id: Long, ts: Timestamp, text: String)

class StreamDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def t(minute: Int) = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  private def run(stream: MemoryStream[SDoc], name: String)
                 (batches: Seq[Seq[SDoc]]): Seq[Long] = {
    val q = StreamDedup.withinWatermark(
        stream.toDF(), Seq("doc_id"), "ts", "10 minutes")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).collect().map(_.getAs[Long]("doc_id")).toSeq.sorted
  }

  test("duplicates within the watermark delay collapse, in and across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SDoc]
    val out = run(stream, "sd_within")(Seq(
      // in-batch repeat of 1; 2 distinct
      Seq(SDoc(1L, t(0), "a"), SDoc(1L, t(1), "a"), SDoc(2L, t(2), "b")),
      // cross-batch repeat of 1, still within 10 min of the original
      Seq(SDoc(1L, t(5), "a"), SDoc(3L, t(6), "c"))))
    assert(out === Seq(1L, 2L, 3L))
  }

  test("state is bounded: a repeat after the watermark passed re-emits (batch dedup's job)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SDoc]
    val out = run(stream, "sd_expired")(Seq(
      Seq(SDoc(1L, t(0), "a")),
      // advances the watermark to 10:50 - 10min = 10:40 > 10:00 + delay →
      // key 1's state is evicted
      Seq(SDoc(2L, t(50), "b")),
      // same key, above the watermark: emitted AGAIN — the documented
      // contract boundary (long-separated repeats belong to t01 downstream)
      Seq(SDoc(1L, t(55), "a"))))
    assert(out === Seq(1L, 1L, 2L))
  }

  test("content-identity dedup collapses re-crawled bodies under different ids") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SDoc]
    val q = StreamDedup.byContent(stream.toDF(), "ts", "10 minutes")
      .writeStream.format("memory").queryName("sd_content").outputMode("append").start()
    try {
      stream.addData(SDoc(1L, t(0), "same body"), SDoc(2L, t(1), "same body"),
                     SDoc(3L, t(2), "other body"))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("sd_content").collect().map(_.getAs[Long]("doc_id")).toSeq.sorted
    assert(out === Seq(1L, 3L)) // first arrival wins per content digest
    // the internal digest column does not leak: output schema == input schema
    assert(spark.table("sd_content").columns.toSeq === Seq("doc_id", "ts", "text"))
  }
}
