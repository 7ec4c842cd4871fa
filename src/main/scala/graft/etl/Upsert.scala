package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generalized MERGE for a parquet warehouse (no Delta in this stack):
  * the reference's ON CONFLICT DO NOTHING (S5) and backfill-update (J10)
  * as one reusable operator.
  *
  * merge(existing, incoming, key):
  *   - rows only in existing  → kept as-is
  *   - rows only in incoming  → inserted
  *   - rows in both           → incoming wins (whole-row update)
  *
  * SQL MERGE raises on duplicate source keys; a distributed engine can't
  * cheaply detect them up front, so instead the incoming side is reduced
  * to one row per key before joining: by the `prefer` ordering when given
  * (first row per key under that ordering wins), else by the full-row
  * ordering over the remaining ORDERABLE columns — deterministic whenever
  * duplicate rows are distinguishable by those columns (rows differing
  * only in non-orderable columns like maps tie arbitrarily; pass `prefer`
  * to pin those), so re-running the same merge or retrying a task keeps
  * the same survivor, and the target never fans out.
  *
  * Parquet has no point updates, so a merge is a rewrite of the target —
  * at 100 TB that is bounded by partitioning: merge partition-by-partition
  * (only partitions containing matched keys are rewritten; the hook is
  * `Warehouse.appendPartitioned`'s layout plus a join-pruned rewrite set).
  */
object Upsert {

  /** One row per key: first under `prefer` if given, else first under the
    * full-row ordering (deterministic, unlike dropDuplicates).
    */
  private def onePerKey(df: DataFrame, key: String, prefer: Seq[Column]): DataFrame = {
    val ordering =
      if (prefer.nonEmpty) prefer
      else df.schema.fields
        .filter(f => f.name != key &&
          org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType))
        .map(f => col(f.name).asc_nulls_last).toSeq
    if (ordering.isEmpty) df.dropDuplicates(key) // nothing orderable: rows indistinguishable anyway
    else df.withColumn("__rn",
        row_number().over(Window.partitionBy(key).orderBy(ordering: _*)))
      .filter(col("__rn") === 1).drop("__rn")
  }

  def merge(existing: DataFrame, incoming: DataFrame, key: String,
            prefer: Seq[Column] = Nil): DataFrame = {
    require(existing.columns.sameElements(incoming.columns),
      s"merge requires identical schemas: ${existing.columns.toSeq} vs ${incoming.columns.toSeq}")
    val one = onePerKey(incoming, key, prefer)
    val untouched = existing.join(one.select(col(key)), Seq(key), "left_anti")
    untouched.unionByName(one)
  }

  /** Insert-only variant (ON CONFLICT DO NOTHING): existing rows win. */
  def insertIfAbsent(existing: DataFrame, incoming: DataFrame, key: String,
                     prefer: Seq[Column] = Nil): DataFrame = {
    require(existing.columns.sameElements(incoming.columns))
    existing.unionByName(
      onePerKey(incoming, key, prefer)
        .join(existing.select(col(key)), Seq(key), "left_anti"))
  }

  /** Column-level patch (the J10 backfill shape): update only `patchCol`
    * where the predicate holds and a patch value exists; all other cells
    * untouched. Duplicate patch keys reduce to one row per key like
    * [[merge]], so the target row count is always preserved.
    */
  def patchColumn(target: DataFrame, patches: DataFrame, key: String,
                  patchCol: String, onlyWhere: Column,
                  prefer: Seq[Column] = Nil): DataFrame = {
    val p = broadcast(onePerKey(patches, key, prefer)
      .select(col(key), col(patchCol).as("__patch")))
    target.join(p, Seq(key), "left")
      .withColumn(patchCol,
        when(onlyWhere && col("__patch").isNotNull, col("__patch"))
          .otherwise(col(patchCol)))
      .drop("__patch")
  }
}
