package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Shared frame-materialization helpers for the incremental index
  * paths (probe + append reference the same batch-sized frame several
  * times; recomputing a shingle/minhash or coding pipeline per
  * reference is the waste these cut).
  */
object Frames {

  /** Eager lineage cut — reliable `checkpoint()` when the session has a
    * checkpoint dir (storage reclaimed by the context cleaner),
    * `localCheckpoint()` otherwise. A `persist()` would pin storage
    * with no owner to release it after the returned plan escapes.
    */
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()

  /** [[cut]] unless the frame is ALREADY a materialized checkpoint
    * (LogicalRDD) — a caller sharing one materialized banding/coding
    * across probe + append is not copied again.
    */
  def cutIfPlain(df: DataFrame): DataFrame = df.queryExecution.analyzed match {
    case _: LogicalRDD => df
    case _             => cut(df)
  }
}
