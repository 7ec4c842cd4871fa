package graft.etl

import org.apache.spark.sql.DataFrame
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
  * Parquet has no point updates, so a merge is a rewrite of the target —
  * at 100 TB that is bounded by partitioning: merge partition-by-partition
  * (only partitions containing matched keys are rewritten; the hook is
  * `Warehouse.appendPartitioned`'s layout plus a join-pruned rewrite set).
  */
object Upsert {

  def merge(existing: DataFrame, incoming: DataFrame, key: String): DataFrame = {
    require(existing.columns.sameElements(incoming.columns),
      s"merge requires identical schemas: ${existing.columns.toSeq} vs ${incoming.columns.toSeq}")
    val untouched = existing.join(incoming.select(col(key)), Seq(key), "left_anti")
    untouched.unionByName(incoming)
  }

  /** Insert-only variant (ON CONFLICT DO NOTHING): existing rows win. */
  def insertIfAbsent(existing: DataFrame, incoming: DataFrame, key: String): DataFrame = {
    require(existing.columns.sameElements(incoming.columns))
    existing.unionByName(
      incoming.join(existing.select(col(key)), Seq(key), "left_anti"))
  }

  /** Column-level patch (the J10 backfill shape): update only `patchCol`
    * where the predicate holds and a patch value exists; all other cells
    * untouched.
    */
  def patchColumn(target: DataFrame, patches: DataFrame, key: String,
                  patchCol: String, onlyWhere: org.apache.spark.sql.Column): DataFrame = {
    val p = broadcast(patches.select(col(key), col(patchCol).as("__patch")))
    target.join(p, Seq(key), "left")
      .withColumn(patchCol,
        when(onlyWhere && col("__patch").isNotNull, col("__patch"))
          .otherwise(col(patchCol)))
      .drop("__patch")
  }
}
