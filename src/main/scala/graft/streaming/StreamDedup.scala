package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermark-bounded exact dedup of a continuous document stream — the
  * streaming face of t01 (exact dedup) for a corpus ingested as it
  * arrives rather than scanned at rest.
  *
  * At 100 TB of continuous ingestion the naive stream dedup
  * (`dropDuplicates` with no watermark) keeps every key ever seen in
  * state forever — state grows with the corpus and the job eventually
  * dies. `dropDuplicatesWithinWatermark` keeps state only for keys whose
  * event time is newer than the watermark: duplicates that arrive within
  * `delay` of the original are dropped with O(arrival-rate × delay)
  * state, independent of stream length. Duplicates separated by MORE
  * than `delay` pass through — by contract — and are the batch dedup's
  * job downstream (t01 over the landed corpus). That split (cheap
  * bounded-state online dedup for the common near-in-time repeat —
  * re-crawls, retried uploads — plus a periodic exact batch pass for the
  * long tail) is how continuous pipelines actually run.
  */
object StreamDedup {

  /** One row per distinct `keyCols` combination among rows arriving
    * within the watermark delay of each other; first arrival wins.
    * STREAMING-ONLY by Spark's contract (`dropDuplicatesWithinWatermark`
    * rejects batch frames at analysis) — the batch equivalent is plain
    * `dropDuplicates`/t01 over the landed corpus. StreamDedupSpec pins
    * in-batch, cross-batch, and state-expiry behavior.
    */
  def withinWatermark(docs: DataFrame, keyCols: Seq[String],
                      eventCol: String, delay: String): DataFrame =
    docs.withWatermark(eventCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Internal digest column; underscore-prefixed so it cannot collide
    * with a real payload column under normal naming.
    */
  private val ContentKey = "__graft_content_key"

  /** Content-identity variant: dedup by exact text digest — md5, the
    * SAME 128-bit key t01 uses, so the online and batch passes agree on
    * what "identical content" means (a 64-bit hash would make collision
    * loss plausible at 10^8-key state sizes; at 128 bits it is not) —
    * so re-crawled bodies with different ids collapse too. The digest is
    * computed once, pre-state, and dropped after — the survivor stream
    * has the input schema; payload columns ride along untouched.
    */
  def byContent(docs: DataFrame, eventCol: String, delay: String): DataFrame = {
    require(!docs.columns.contains(ContentKey),
      s"input already has a $ContentKey column")
    withinWatermark(
      docs.withColumn(ContentKey, md5(col("text"))),
      Seq(ContentKey), eventCol, delay)
      .drop(ContentKey)
  }
}
