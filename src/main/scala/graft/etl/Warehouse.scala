package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Parquet-backed warehouse with empty-safe reads: a table that has never
  * been written reads as an empty frame with the right schema, so every
  * anti-join and count works on first run (the reference gets this from
  * pre-existing Postgres tables, README.md:74-84).
  */
case class Warehouse(spark: SparkSession, dir: String) {

  private def path(name: String) = s"$dir/$name"

  def read(name: String, schema: StructType): DataFrame = {
    val p = new java.io.File(path(name))
    if (p.exists() && p.listFiles() != null && p.listFiles().exists(_.getName.endsWith(".parquet")))
      spark.read.schema(schema).parquet(path(name))
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  def append(name: String, df: DataFrame): Unit =
    df.write.mode("append").parquet(path(name))

  /** Hive-style partitioned append — the 100TB layout for fact tables:
    * partition masters by periodo_id (or shipdate month) so every
    * periodo-filtered serving query prunes to one directory, and dynamic
    * partition pruning handles the dim-join case. PartitioningSpec proves
    * the scan's PartitionFilters kick in.
    */
  def appendPartitioned(name: String, df: DataFrame, cols: String*): Unit =
    df.write.mode("append").partitionBy(cols: _*).parquet(path(name))

  /** Read a partitioned table (partition columns come back from the
    * directory layout, so no explicit schema).
    */
  def readPartitioned(name: String): DataFrame =
    spark.read.parquet(path(name))

  /** Small control/dimension tables are rewritten atomically per run
    * (checkpoints, sync_log rollups, periodos after a transition).
    * Write-to-temp + swap: overwrite-in-place would break readers of the
    * same path within the job.
    */
  def rewrite(name: String, df: DataFrame): Unit = {
    val tmp = path(name + "_tmp_rewrite")
    df.write.mode("overwrite").parquet(tmp)
    val target = new java.io.File(path(name))
    def delete(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(delete))
      f.delete()
    }
    delete(target)
    if (!new java.io.File(tmp).renameTo(target))
      throw new java.io.IOException(s"rewrite of $name failed")
  }

  /** Materialize a computed increment before appending it to tables its
    * own lineage reads (anti-joins against the target): parquet round-trip
    * through a staging dir breaks the lazy re-read-after-write hazard.
    */
  def stage(df: DataFrame): DataFrame = {
    val p = path("_staging/" + java.util.UUID.randomUUID().toString.take(8))
    df.write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }

  def supervisiones(tipo: String): DataFrame =
    read(s"supervisiones_$tipo", CasSchema.supervisiones)
  def detalle(tipo: String): DataFrame =
    read(if (tipo == "operativas") "supervision_areas" else "seguridad_kpis", CasSchema.detalle)
  def periodos: DataFrame   = read("periodos_cas", CasSchema.periodos)
  def grupos: DataFrame     = read("grupos_operativos", CasSchema.grupos)
  def sucursales: DataFrame = read("sucursales", CasSchema.sucursales)
  def catalogo(tipo: String): DataFrame =
    read(if (tipo == "operativas") "catalogo_areas" else "catalogo_kpis_seguridad", CasSchema.catalogo)
  def checkpoints: DataFrame = read("sync_checkpoints", CasSchema.checkpoints)
  def syncLog: DataFrame     = read("sync_log", CasSchema.syncLog)
}
