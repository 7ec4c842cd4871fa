package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked tumbling-window aggregation — the readStream → window →
  * agg shape (the streaming form of q27's hourly rollup). The watermark
  * bounds state: windows older than (max event time - delay) are finalized
  * and evicted, so state is O(active windows × groups), independent of
  * stream length.
  */
object WindowedAgg {

  /** Works on both batch and streaming frames (identical semantics — the
    * Spark contract this module leans on; WindowedAggSpec proves it on the
    * same data).
    */
  def hourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 2).as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("hour_start"),
        col("event_type"), col("n_events"), col("total_value"))
}
