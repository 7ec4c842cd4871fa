package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.etl.Warehouse
import graft.queries.TextOps

/** PERSISTED dedup-cluster state — the reference's checkpoint posture
  * (etl_sync.py:356-385: sync state survives runs, each batch advances
  * it) applied to near-dup clustering: the full (doc_id, cluster)
  * assignment lives in a versioned warehouse table, and each ingest
  * batch advances it through [[TextOps.dedupClustersIncrement]] — the
  * propagation touches only the batch's edge neighborhood, never the
  * settled corpus.
  *
  * {{{
  * ClusterState.seed(wh, corpusIds, pairs)          // first full build
  * // per ingest batch:
  * ClusterState.advance(wh, batchIds, batchPairs)   // contracted increment
  * ClusterState.clusters(wh)                        // presentation (size > 1)
  * }}}
  *
  * Crash safety comes from the warehouse's versioned rewrite: the new
  * assignment lands in a fresh version directory and the pointer flip is
  * the only commit step, so a crash mid-advance leaves the previous
  * state generation live (and the rewrite reading its own table's prior
  * generation is safe by construction — different directories).
  */
object ClusterState {

  val TableName = "dedup_clusters"

  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("cluster", LongType)))

  /** The current full assignment (empty with the right schema if never
    * seeded — [[advance]] on an unseeded table is just a seed of the
    * increment).
    */
  def read(wh: Warehouse): DataFrame = wh.read(TableName, Schema)

  /** Full (re)build: assignment over the whole corpus, committed as a
    * fresh generation.
    */
  def seed(wh: Warehouse, nodes: DataFrame, pairs: DataFrame): Unit =
    wh.rewrite(TableName, TextOps.clusterAssignmentOf(nodes, pairs))

  /** Advance the state by one ingest batch: contracted increment over
    * the batch's edge neighborhood, committed as a fresh generation.
    */
  def advance(wh: Warehouse, newNodes: DataFrame, incPairs: DataFrame): Unit =
    wh.rewrite(TableName, TextOps.dedupClustersIncrement(read(wh), newNodes, incPairs))

  /** The maintained state presented like [[TextOps.dedupClustersOf]]:
    * canonical member + cluster_size, singletons dropped.
    */
  def clusters(wh: Warehouse): DataFrame = TextOps.presentClusters(read(wh))
}
