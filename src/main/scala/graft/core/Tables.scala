package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-provided testdata star schema (TESTDATA.md).
  *
  * The reference reads row-oriented Postgres tables (app.py:24-27); here every
  * table is a columnar parquet scan so Catalyst gets predicate pushdown,
  * column pruning, and the vectorized reader for free. At the 100TB design
  * point these readers are the place to swap in a partitioned/bucketed
  * warehouse layout without touching any query code.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = read(s, d, "lineitem")
  /** events with `ts` normalized to LONG NANOS since epoch — the column
    * contract every consumer (sessionization gaps, q38's range frame,
    * as-of arithmetic) is written against. The driver's generator has
    * emitted two physical types across rounds: parquet TIMESTAMP(NANOS)
    * (read as a long via `nanosAsLong` — Spark's reader rejects it
    * otherwise; set per-read so this works under any session) and plain
    * TIMESTAMP_NTZ micros. Dispatch on the OBSERVED schema, not the
    * round: the NTZ form is cast through TimestampType and scaled to
    * nanos. cast(NTZ → timestamp) interprets the wall-clock in the
    * SESSION time zone, so the zone is pinned to UTC per-read alongside
    * nanosAsLong — the DuckDB oracle's `epoch_ns(ts)` treats naive
    * timestamps as UTC, and a driver-owned non-UTC session would
    * otherwise shift every ts by the zone offset. The oracle needs no
    * twin switch — `epoch_ns(ts)` accepts either physical type.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = read(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ =>
        import org.apache.spark.sql.functions._
        // The pin is SCOPED, not session-global: cast(NTZ → timestamp)
        // binds the session zone into the Cast at ANALYSIS time
        // (ResolveTimeZone), and DataFrame construction analyzes eagerly,
        // so setting UTC around the withColumn below fixes the
        // interpretation permanently in the returned plan while the
        // caller's zone is restored before returning — an embedding
        // application with a deliberately non-UTC session keeps it
        // (spec-pinned: zone preserved AND nanos identical).
        val prior = s.conf.getOption("spark.sql.session.timeZone")
        s.conf.set("spark.sql.session.timeZone", "UTC")
        try df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
        finally prior match {
          case Some(z) => s.conf.set("spark.sql.session.timeZone", z)
          case None    => s.conf.unset("spark.sql.session.timeZone")
        }
    }
  }

  /** events with ts converted to a proper TimestampType column (micros).
    * Integer division — a double round-trip would lose precision above
    * 2^53 ns.
    */
  def eventsTs(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    events(s, d).withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  /** S1's alternative mapping (SURVEY §2.1): the reference reads live
    * Postgres tables (app.py:24-27, etl_sync.py:87-88); the Spark-side
    * analog is `spark.read.jdbc` behind the same schema contract as the
    * parquet readers — swap the source, keep every query untouched. Thin
    * by design: Spark's JDBC source already handles dialects, pushdown of
    * filters/column pruning into the remote SQL, and fetch batching.
    *
    * `partition` = (column, lowerBound, upperBound, numPartitions) turns
    * the read into numPartitions RANGE-SLICED parallel queries — the only
    * way a JDBC scan scales past one connection. At warehouse scale the
    * bounds come from a cheap min/max probe (or the table's id sequence),
    * and numPartitions is sized to what the database endpoint tolerates,
    * NOT to the cluster's core count: a 1000-executor cluster pointing
    * 1000 connections at one Postgres is a denial of service, which is
    * exactly why the reference syncs Postgres into a warehouse
    * incrementally instead of querying it per request.
    */
  def readJdbc(s: SparkSession, url: String, table: String,
               partition: Option[(String, Long, Long, Int)] = None,
               props: java.util.Properties = new java.util.Properties()): DataFrame =
    partition match {
      case Some((column, lo, hi, n)) => s.read.jdbc(url, table, column, lo, hi, n, props)
      case None                      => s.read.jdbc(url, table, props)
    }

  /** Content stamp of a table path for cache invalidation: every data
    * file's name, length and mtime. Unlike a bare directory mtime this
    * changes whenever the listing or file contents-length change — and is
    * meaningful on object stores too, where directory mtimes are synthetic
    * (S3A) but per-object length+mtime are real.
    */
  def contentStamp(s: SparkSession, tablePath: String): String = {
    val p = new org.apache.hadoop.fs.Path(tablePath)
    try {
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      val st = fs.getFileStatus(p)
      val entries =
        if (st.isDirectory) fs.listStatus(p).toSeq.sortBy(_.getPath.getName)
        else Seq(st)
      val listing = entries
        .map(e => s"${e.getPath.getName}:${e.getLen}:${e.getModificationTime}")
        .mkString(",")
      // DIGEST, not the raw listing: stamps ride warehouse tables as a
      // per-ROW column (StampedTable.ensure), and a raw listing grows
      // with the corpus's file count — measured at the 5M-doc corpus
      // (1000 part files, ~80 KB stamp): the banded-index seed's
      // repartition shuffled stamp × rows ≈ 800 GB of payload and filled
      // the disk before any query ran. Parquet dictionary-encodes the
      // repeated string to nothing at REST; the shuffle's row format
      // does not. A fixed-width digest carries the same equality
      // semantics (that is all any consumer checks) at 50-odd bytes.
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(listing.getBytes("UTF-8")).map("%02x".format(_)).mkString
      s"files=${entries.size}:md5=$md"
    } catch {
      // a failed listing must never equal any other stamp — including a
      // PRIOR failed listing — or a cache keyed on the stamp could serve
      // a stale frame across a rewrite it failed to observe. Unique per
      // call → always a cache miss → recompute (safe, merely slower).
      case _: java.io.IOException => s"unreadable:${java.util.UUID.randomUUID()}"
    }
  }
}
