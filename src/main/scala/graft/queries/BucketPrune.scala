package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partition-pruned index reads driven by a batch's bucket codes.
  *
  * Every incremental probe/append in [[BandIndex]] / [[EmbIndex]]
  * restricts the settled index scan to the partitions the batch's own
  * codes hash into. For any sane micro-batch the distinct-code set is
  * tiny and an inlined static IN-filter is the strongest possible
  * pruning (a literal `PartitionFilters` entry, independent of runtime
  * heuristics). But the fan-out dial grows with corpus size
  * ([[BandIndex.BkBuckets]] ≈ corpus_bytes / partition_scan_budget —
  * order 10^5-10^6 at 100 TB), so a pathological giant batch could
  * otherwise collect a six-figure driver-side list and compile a
  * six-figure-element IN. Above [[MaxInline]] distinct codes the probe
  * therefore swaps to a BROADCAST LEFT-SEMI JOIN on the bucket column:
  * the batch's distinct-code frame (still far smaller than the batch)
  * broadcasts once and Spark's dynamic partition pruning turns it into
  * a runtime partition filter on the scan, so the read stays pruned
  * with no driver-side value list at all.
  *
  * Deciding which side of the threshold a batch is on costs one
  * `limit(MaxInline+1)` collect — bounded at MaxInline+1 rows
  * REGARDLESS of batch size, so the driver never materializes an
  * unbounded code list even to decide. Threshold documented in
  * SCALE.md.
  */
object BucketPrune {

  /** Max distinct bucket codes inlined as a static IN-filter; above
    * this the probe uses the broadcast-semi-join fallback. 1024
    * literals keep plan size and driver memory trivial while covering
    * every test corpus and any sane production fan-out × batch
    * combination.
    */
  val MaxInline = 1024

  /** `index` restricted to the distinct values of `buckets`' single
    * column `bucketCol` (the index's partition column): static
    * IN-filter when the distinct set is ≤ maxInline, broadcast
    * semi-join otherwise. `buckets` should be a projection of an
    * already-materialized batch frame — it is evaluated once (the
    * bounded threshold probe) on the inline path and once more as the
    * broadcast side on the fallback path.
    *
    * Bucket codes are non-negative by construction everywhere this is
    * used (pmod / sign-bit codes); the `>= 0` tag on the broadcast side
    * is semantically a no-op but marks the side as selectively filtered
    * so the dynamic-partition-pruning rule considers the join.
    */
  def restrict(index: DataFrame, bucketCol: String, buckets: DataFrame,
               maxInline: Int = MaxInline): DataFrame = {
    val distinctB = buckets.select(col(bucketCol)).distinct()
    val sample = distinctB.limit(maxInline + 1).collect().map(_.get(0))
    if (sample.length <= maxInline)
      index.filter(col(bucketCol).isin(sample.toIndexedSeq: _*))
    else
      index.join(broadcast(distinctB.filter(col(bucketCol) >= 0)),
        Seq(bucketCol), "left_semi")
  }
}
