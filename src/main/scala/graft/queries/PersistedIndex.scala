package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.etl.Warehouse

/** The ONE persistence lifecycle every index family here rides —
  * [[BandIndex]] (MinHash bands), [[EmbIndex]] (single-table sign
  * codes), [[BandEmbIndex]] (banded OR-amplification sign codes)
  * previously triplicated the same five operations with near-identical
  * stamp and torn-append reasoning; this trait is that posture written
  * once, so a fourth family (or a dial change to the shared protocol)
  * cannot drift the three apart:
  *
  *  - '''seed''': full (re)build as one versioned, partitioned rewrite —
  *    a pointer-flip commit, so a crash mid-build leaves the previous
  *    generation live;
  *  - '''ensure''': the [[StampedTable]] staleness protocol — built once
  *    per (corpus content, dial) stamp, repeat calls serve the committed
  *    generation with zero setup jobs (the coded frame is BY-NAME so a
  *    memoized repeat never constructs it);
  *  - '''append''': grow by an ingest batch, IDEMPOTENT under replay at
  *    [[repairKeys]] granularity. The key set is chosen per family so
  *    the repair granularity matches the COMMIT granularity (one key =
  *    one row in one partition file): a multi-row-per-id family
  *    (bands/tables) keyed on the id alone would see a torn append —
  *    some of an id's rows committed, a crash, redelivery — as "already
  *    indexed" and permanently drop the missing rows (silent recall
  *    loss). The anti-join is PARTITION-PRUNED to the batch's own
  *    partitions — valid because every stored column re-derives
  *    deterministically from the batch row, so an existing row for a
  *    batch key necessarily sits where the fresh one would land. That
  *    makes content IMMUTABILITY per id the precondition: a mutated
  *    re-ingest codes elsewhere, escapes the pruned check, and
  *    duplicates rows — `checked = true` runs the anti-join unpruned
  *    (one key-columns pass of the whole index) for mutable feeds;
  *  - '''compact''': coalesce per-batch append litter to one file per
  *    partition, rows verbatim, pointer-flip commit;
  *  - '''rows''': the live generation with the partition column riding
  *    the projection, so downstream probes can land a PARTITION filter.
  *
  * Probe logic (the increment pair joins) stays per-family — the three
  * probe geometries share no useful shape; only the state machine does.
  */
private[graft] trait PersistedIndex {

  /** Warehouse table this family persists into. */
  def tableName: String

  /** Full stored schema, `corpus_stamp` included. */
  def schema: StructType

  /** The bounded-fan-out Hive partition column (derived, deterministic,
    * ≤ the family's fan-out cap directories per generation at ANY dial).
    */
  def partitionCol: String

  /** Idempotency anti-join keys — exactly one stored row per key, in
    * exactly one partition file (repair granularity == commit
    * granularity; see the trait note).
    */
  def repairKeys: Seq[String]

  /** The slice of the live index the append's idempotency check reads —
    * default: partition-pruned to the batch's own [[partitionCol]]
    * values (static IN-filter up to `maxInline` distinct values,
    * broadcast semi-join past it — [[BucketPrune.restrict]]). A family
    * with a second prunable level (e.g. [[EmbIndex]]'s row-group-stat
    * bucket filter) overrides.
    */
  protected def restrictLanded(index: DataFrame, batch: DataFrame,
                               maxInline: Int): DataFrame =
    BucketPrune.restrict(index, partitionCol, batch, maxInline)

  /** The persisted live generation, stamp column dropped, partition
    * column riding the projection (schema order).
    */
  def rows(wh: Warehouse): DataFrame =
    wh.read(tableName, schema)
      .select(schema.fieldNames.filterNot(_ == "corpus_stamp").map(col).toSeq: _*)

  /** Full (re)build over already-coded rows: one versioned, partitioned
    * rewrite (pointer-flip commit).
    */
  protected def seedRows(wh: Warehouse, coded: DataFrame): Unit =
    wh.rewrite(tableName,
      coded.withColumn("corpus_stamp", lit("seed")),
      partitionBy = Seq(partitionCol))

  /** [[StampedTable.ensure]] with this family's table/schema/layout —
    * the caller's stamp must carry every dial baked into the stored
    * rows AND the fan-out (a pre-fan-out or re-dialed layout must
    * rebuild, not silently probe the wrong partitions).
    */
  protected def ensureRows(wh: Warehouse, stamp: String)(coded: => DataFrame): Unit =
    StampedTable.ensure(wh, tableName, schema, stamp,
      partitionBy = Seq(partitionCol))(coded)

  /** Grow the index by an already-coded batch — the pruned, idempotent,
    * replay-repairing append described in the trait note.
    */
  protected def appendRows(wh: Warehouse, batchCoded: DataFrame,
                           maxInline: Int = BucketPrune.MaxInline,
                           checked: Boolean = false): Unit = {
    val bc = Frames.cutIfPlain(batchCoded)
    val landed =
      if (checked) rows(wh)
      else restrictLanded(rows(wh), bc, maxInline)
    val fresh = bc.join(landed.select(repairKeys.map(col): _*), repairKeys, "left_anti")
    wh.appendLive(tableName,
      fresh.withColumn("corpus_stamp", lit("append")),
      partitionBy = Seq(partitionCol))
  }

  /** Coalesce the per-batch append litter — one file per partition,
    * rows (stamps included) verbatim, pointer-flip commit.
    */
  def compact(wh: Warehouse): Unit =
    wh.compact(tableName, schema, partitionBy = Seq(partitionCol))
}
