package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** A second writer (another JVM/pipeline) attempted a mutating warehouse
  * operation while this warehouse's writer lease was held. The
  * single-writer contract is now CHECKED, not conventional — see
  * [[Warehouse]]'s lease section.
  */
class ConcurrentWriterException(msg: String) extends IllegalStateException(msg)

object Warehouse {
  /** JVM-stable writer identity: every Warehouse instance in this process
    * is ONE writer (the deployment unit is a pipeline process), so
    * nested/sequential operations across instances re-enter the same
    * lease instead of self-colliding; the lease guards CROSS-PROCESS
    * concurrency, which is the corruption hazard (two vacuums
    * interleaving their keep-set deletes).
    */
  private[etl] val OwnerId: String =
    s"${java.lang.ProcessHandle.current().pid()}@" +
      s"${java.net.InetAddress.getLocalHost.getHostName}/" +
      java.util.UUID.randomUUID().toString.take(8)

  /** Lease freshness window: a lease file older than this is presumed
    * abandoned (crashed writer) and is stolen with a log line. Generous
    * relative to any maintenance op at test scale; long production
    * compactions renew via [[Warehouse.renewWriterLease]].
    */
  private[etl] val LeaseTtlMs: Long = 15 * 60 * 1000L
}

/** Parquet-backed warehouse with empty-safe reads: a table that has never
  * been written reads as an empty frame with the right schema, so every
  * anti-join and count works on first run (the reference gets this from
  * pre-existing Postgres tables, README.md:74-84).
  *
  * Rewritten tables are VERSIONED: each `rewrite` lands a fresh
  * `name.__vNNNNNN` directory and then flips a one-line pointer file
  * (`name.__current`). The pointer rename is the only commit step, so a
  * crash at any moment leaves either the old pointer (old data intact) or
  * no pointer — recovered by picking the newest version directory that
  * carries Spark's `_SUCCESS` marker. At no point is the table absent,
  * which the old delete-then-rename scheme could not guarantee. All path
  * operations go through Hadoop's FileSystem API, so the same code runs
  * against HDFS/S3A/ABFS, not just the local disk used in tests.
  */
case class Warehouse(spark: SparkSession, dir: String) {

  private def path(name: String) = s"$dir/$name"

  private def hconf = spark.sessionState.newHadoopConf()
  private def fs: FileSystem = new Path(dir).getFileSystem(hconf)

  private def pointerPath(name: String) = new Path(dir, s"$name.__current")
  private def versionName(name: String, v: Long) = f"$name.__v$v%06d"

  // ------------------------------------------------------- writer lease
  /** The single-writer contract, ENFORCED: every mutating operation
    * (rewrite / appendLive / compact / vacuum / vacuumAll) runs under a
    * warehouse-wide lease file. A second PROCESS attempting a mutation
    * while the lease is fresh gets a loud [[ConcurrentWriterException]]
    * instead of silently interleaving version GC with another writer's
    * keep-set (the unrecoverable outcome the old quiescence convention
    * merely documented). Within one process the lease is re-entrant (one
    * [[Warehouse.OwnerId]] per JVM — compact's internal rewrite,
    * vacuumAll's per-table vacuums). A lease older than
    * [[Warehouse.LeaseTtlMs]] is presumed abandoned by a crashed writer
    * and stolen with a log line; long operations renew via
    * [[renewWriterLease]]. Expiry reads the lease file's MTIME, not
    * embedded clocks, so skewed writers disagree by FS granularity, not
    * wall-clock drift.
    */
  private def leasePath = new Path(dir, "__writer.lease")

  private def leaseInfo(): Option[(String, Long)] =
    try {
      val st = fs.getFileStatus(leasePath)
      val owner =
        try {
          val in = fs.open(leasePath)
          try new String(in.readAllBytes(), "UTF-8").linesIterator.nextOption().getOrElse("")
          finally in.close()
        } catch { case _: java.io.IOException => "" }
      Some((owner, st.getModificationTime))
    } catch { case _: java.io.FileNotFoundException => None }

  private def createLease(op: String): Unit = {
    val out = fs.create(leasePath, false) // create-exclusive: loses the race loudly
    try out.write(s"${Warehouse.OwnerId}\n$op\n".getBytes("UTF-8")) finally out.close()
  }

  /** Acquire (or re-enter) the writer lease. Returns true iff THIS call
    * created the file and must delete it on release.
    */
  private def acquireWriterLease(op: String): Boolean = leaseInfo() match {
    case Some((owner, _)) if owner == Warehouse.OwnerId =>
      false // re-entrant: the outer operation releases
    case Some((owner, mtime))
      if System.currentTimeMillis() - mtime <= Warehouse.LeaseTtlMs =>
      throw new ConcurrentWriterException(
        s"warehouse $dir is write-locked by '$owner' " +
          s"(lease ${System.currentTimeMillis() - mtime} ms old, ttl ${Warehouse.LeaseTtlMs} ms); " +
          s"refusing concurrent '$op' — two writers interleaving retention GC corrupts version history")
    case Some((owner, _)) =>
      System.err.println(s"[warehouse] stealing expired writer lease of '$owner' at $dir for '$op'")
      fs.delete(leasePath, false)
      try { createLease(op); true }
      catch { case _: java.io.IOException =>
        throw new ConcurrentWriterException(
          s"warehouse $dir: lost the steal race for the expired lease; refusing '$op'") }
    case None =>
      try { createLease(op); true }
      catch { case _: java.io.IOException =>
        throw new ConcurrentWriterException(
          s"warehouse $dir: another writer acquired the lease concurrently; refusing '$op'") }
  }

  private def releaseWriterLease(): Unit =
    try {
      if (leaseInfo().exists(_._1 == Warehouse.OwnerId)) fs.delete(leasePath, false)
    } catch { case _: java.io.IOException => () }

  /** Refresh a held lease's mtime — call from inside a long-running
    * maintenance op so it is not presumed dead and stolen mid-flight.
    */
  def renewWriterLease(): Unit =
    if (leaseInfo().exists(_._1 == Warehouse.OwnerId))
      try fs.setTimes(leasePath, System.currentTimeMillis(), -1)
      catch { case _: java.io.IOException => () }

  private def withWriterLease[T](op: String)(body: => T): T = {
    val acquired = acquireWriterLease(op)
    try body finally if (acquired) releaseWriterLease()
  }

  /** Hold the writer lease across a MULTI-TABLE advance whose individual
    * writes dispatch from several threads (the ingest's concurrent
    * appends). Re-entrancy is keyed on the per-JVM [[Warehouse.OwnerId]],
    * so the inner appendLive calls re-enter regardless of thread — but
    * WITHOUT an outer holder, two fresh threads racing the create-
    * exclusive would throw [[ConcurrentWriterException]] against their
    * own process, and the first finisher would release the lease out
    * from under the others. The outer scope closes both: one acquire,
    * one release, after every branch lands.
    */
  private[graft] def withWriterScope[T](op: String)(body: => T): T =
    withWriterLease(op)(body)

  /** History generations mirror the data-version scheme: each write lands a
    * NEW `name.__history.NNNNNN` file (tmp + rename-to-fresh-name — never a
    * delete in the commit path), readers resolve the newest suffix, and
    * older generations are swept best-effort AFTER the new one is live. A
    * crash at any moment leaves at least one intact generation, so the
    * "absent history ⇒ seed from raw version dirs" upgrade path can no
    * longer be triggered by a mid-commit crash (which would let stray dirs
    * from crashed writes into the committed set). The bare `name.__history`
    * file is the pre-generation layout, read when no suffixed file exists.
    */
  private def legacyHistoryPath(name: String) = new Path(dir, s"$name.__history")

  /** Every numeric history file with its length. A ZERO-LENGTH entry is a
    * CLAIM (create-exclusive placeholder from [[appendHistory]]) whose
    * writer crashed before renaming its entry list over it, or is still
    * inside that window — never a generation. Numbering must count claims
    * (so a stale one cannot stall seq assignment forever) but resolution
    * must skip them: an empty newest "generation" would read as an empty
    * entry list, sending appendHistory down the seed-from-version-dirs
    * path — re-admitting stray dirs, the exact hazard generations close.
    */
  private def rawHistoryFiles(name: String): Seq[(Long, Path, Long)] = {
    val stats = try fs.globStatus(new Path(dir, s"$name.__history.*"))
                catch { case _: java.io.FileNotFoundException => null }
    Option(stats).map(_.toSeq).getOrElse(Nil).flatMap { st =>
      st.getPath.getName.stripPrefix(s"$name.__history.").toLongOption
        .map(seq => (seq, st.getPath, st.getLen))
    }.sortBy(_._1)
  }

  /** Committed (non-claim) history generations, oldest→newest. */
  private def historyFiles(name: String): Seq[(Long, Path)] =
    rawHistoryFiles(name).collect { case (seq, p, len) if len > 0 => (seq, p) }

  /** The last committed pointer targets, oldest→newest — the only
    * directories a reader can ever have resolved through the pointer.
    * Retention windows count THESE, not raw version dirs: a stray from a
    * crashed uncommitted write must not occupy a reader-window slot.
    * An absent file reads Nil; any OTHER read failure propagates — the
    * GC caller treats it as "window unknown, skip reclamation", never as
    * an empty window (which would delete still-referenced versions).
    */
  private def history(name: String): Seq[String] = {
    def readFile(target: Path): Seq[String] = {
      val in = fs.open(target)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      txt.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    }
    historyFiles(name).lastOption.map(_._2) match {
      case None =>
        // no generation files: absent legacy file genuinely means "never
        // written" — the seed-from-version-dirs upgrade path is correct
        try readFile(legacyHistoryPath(name))
        catch { case _: java.io.FileNotFoundException => Nil }
      case Some(gen) =>
        try readFile(gen)
        catch {
          case _: java.io.FileNotFoundException =>
            // a concurrent commit swept this generation between resolving
            // and opening it. That is NOT "absent history" (seeding from
            // raw version dirs here would admit stray dirs — the hazard
            // generations exist to close): re-resolve once, and if the
            // newest generation vanishes again treat the read as transient
            // so appendHistory returns None and this rewrite skips GC.
            historyFiles(name).lastOption.map(_._2) match {
              case Some(gen2) =>
                try readFile(gen2)
                catch {
                  case e: java.io.FileNotFoundException => throw new java.io.IOException(
                    s"history generation for $name vanished twice mid-read (concurrent sweeps)", e)
                }
              case None => throw new java.io.IOException(
                s"history generations for $name vanished mid-read (concurrent sweep)")
            }
        }
    }
  }

  /** History plus the new entry, SEEDED for the upgrade path: a table
    * whose version dirs predate the history file (it reads ABSENT, not
    * failed) treats every existing version as committed — they were
    * written by the pre-history scheme, so any of them may be
    * reader-visible. A TRANSIENT read failure is different: the committed
    * set is unknown, and fabricating it from raw version dirs would let a
    * stray occupy a window slot and be recorded as committed — so the
    * caller gets None, skips GC for this rewrite, and leaves the history
    * file untouched for the next rewrite to read (the missing vname entry
    * is covered by the prevLive keep until then).
    */
  private def appendHistory(name: String, vname: String,
                            prevLive: Option[String]): Option[Seq[String]] = {
    val read =
      try {
        val h = history(name)
        if (h.nonEmpty) h
        else listVersions(name).map(_._2.getName).filterNot(_ == vname)
      } catch { case _: java.io.IOException => return None }
    // SELF-HEAL a lost append: the history write below is best-effort, so
    // the file may lack the previous rewrite's entry. The pre-rewrite live
    // target is committed BY DEFINITION (readers resolved through the
    // pointer), so if it is version-named and absent, restore it — without
    // this, a single swallowed write would silently narrow the committed
    // window below RetainVersions two rewrites later. Consecutive lost
    // writes degrade by at most one generation per loss (documented bound).
    val prior = prevLive match {
      case Some(pl) if pl.startsWith(s"$name.__v") && !read.contains(pl) => read :+ pl
      case _ => read
    }
    val entries = (prior :+ vname).takeRight(16)
    try {
      val raw = rawHistoryFiles(name)
      val existing = raw.collect { case (seq, p, len) if len > 0 => (seq, p) }
      // seq counts CLAIMS too: a crashed writer's zero-length claim at
      // max+1 would otherwise make every later writer recompute the same
      // seq, lose the claim, and skip GC forever — numbering past it
      // leaves the stale claim inert (invisible to readers, reclaimed by
      // vacuum) while history advances
      val seq = raw.lastOption.map(_._1).getOrElse(0L) + 1
      // the fixed tmp name parses as suffix "tmp" → non-numeric → invisible
      // to historyFiles, so a stray from a crash never resolves as a
      // generation; rename targets a FRESH name, so no delete precedes it
      // tmp is WRITER-UNIQUE: a fixed shared tmp name would let a
      // concurrent writer overwrite our entry list between our write and
      // our rename, landing ITS entries under OUR claimed generation.
      // The random suffix parses as non-numeric → invisible to
      // historyFiles, so a stray from a crash never resolves as a
      // generation; rename targets a fresh name, so no delete precedes it.
      val tmp = new Path(dir,
        s"$name.__history.tmp${java.util.UUID.randomUUID().toString.take(8)}")
      val out = fs.create(tmp, true)
      try out.write((entries.mkString("\n") + "\n").getBytes("UTF-8")) finally out.close()
      val target = new Path(dir, f"$name.__history.$seq%06d")
      // Claim the seq with a create-exclusive BEFORE the rename:
      // rename-returns-false-on-existing-destination is only an HDFS
      // guarantee — Hadoop's local filesystem renames with POSIX
      // semantics, silently OVERWRITING the destination, so two
      // concurrent writers computing the same seq would clobber a
      // generation there. The claim races in two shapes, BOTH of which
      // must read as claim-lost: createNewFile returning false (it saw
      // the other writer's file), and createNewFile THROWING
      // FileAlreadyExistsException (Hadoop's createNewFile is
      // exists-then-create, so the race loser's create(overwrite=false)
      // throws instead of returning false — letting that IOException
      // reach the blanket catch below would return Some and run GC, the
      // exact outcome the claim exists to prevent). A lost claim means
      // another writer owns this seq: OUR committed set was never durably
      // recorded and a concurrent writer's view may diverge from it —
      // skip GC this rewrite rather than sweep against a set no reader
      // can resolve. Residual window: on HDFS-like stores
      // create(overwrite=false) is an atomic namespace op, closing the
      // race completely; Hadoop's LOCAL create is itself check-then-act,
      // so two local writers landing inside that narrower window can
      // still both claim — a dev/test-only scenario (multi-writer
      // warehouses run on HDFS-like stores), bounded by the one-
      // generation self-heal either way. A crash BETWEEN claim and rename
      // leaves the zero-length claim at the real generation name — it is
      // invisible to resolution (see rawHistoryFiles), numbering steps
      // past it, and vacuum reclaims it, so it can never shadow the
      // previous intact generation.
      val claimed = try fs.createNewFile(target)
                    catch { case _: java.io.IOException => false }
      if (!claimed) { fs.delete(tmp, false); return None }
      if (!fs.rename(tmp, target)) {
        // POSIX rename overwrote the zero-length claim and returned true;
        // an HDFS-semantics store instead refuses to rename onto our own
        // claim — clear it and land the content. Delete ONLY what is
        // verifiably a claim (zero-length): if the first false was
        // transient and another writer's createNewFile landed at the
        // target in between, an unconditional delete would destroy THEIR
        // claim and let our second rename commit under a seq they believe
        // they own — both writers would then proceed as committed for the
        // same generation. Anything non-empty (or vanished-and-still-
        // unrenameable) is the collision exit. Our own claim cannot be
        // told apart from another writer's by content — both are empty —
        // but deleting an empty claim is safe in either case: the loser's
        // rename returns false and takes this same exit.
        val claimLen = try Some(fs.getFileStatus(target).getLen)
                       catch { case _: java.io.FileNotFoundException => None }
        if (claimLen.exists(_ > 0)) { fs.delete(tmp, false); return None }
        claimLen.foreach(_ => fs.delete(target, false))
        if (!fs.rename(tmp, target)) { fs.delete(tmp, false); return None }
      }
      // only after the new generation is live: sweep superseded ones
      existing.foreach { case (_, p) => fs.delete(p, false) }
      if (fs.exists(legacyHistoryPath(name))) fs.delete(legacyHistoryPath(name), false)
    } catch { case _: java.io.IOException => () }
    Some(entries)
  }

  private def listVersions(name: String): Seq[(Long, Path)] = {
    val glob = new Path(dir, s"$name.__v*")
    val stats = try fs.globStatus(glob) catch { case _: java.io.IOException => null }
    Option(stats).map(_.toSeq).getOrElse(Nil).flatMap { st =>
      val base = st.getPath.getName
      base.stripPrefix(s"$name.__v").toLongOption.map(_ -> st.getPath)
    }.sortBy(_._1)
  }

  private def readPointer(name: String): Option[Path] = {
    val p = pointerPath(name)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val target = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      Some(new Path(dir, target)).filter(fs.exists)
    }
  }

  /** The directory currently holding `name`'s data: committed pointer
    * first; else crash recovery (newest version with a `_SUCCESS` marker);
    * else the flat append-layout directory.
    */
  private def resolve(name: String): Path =
    readPointer(name)
      .orElse(listVersions(name).reverse.collectFirst {
        case (_, p) if fs.exists(new Path(p, "_SUCCESS")) => p
      })
      .getOrElse(new Path(dir, name))

  private def hasParquet(p: Path): Boolean =
    fs.exists(p) && (
      // every committed rewrite lands a _SUCCESS marker in the version
      // dir — one existence probe answers "is there a committed write
      // here" without listing anything. The per-entry probe below is the
      // fallback for legacy flat/append dirs (no marker), where on an
      // object store it costs up to one LIST per col=value subdirectory.
      fs.exists(new Path(p, "_SUCCESS")) ||
        fs.listStatus(p).exists { st =>
          st.getPath.getName.endsWith(".parquet") ||
            // Hive-layout versioned tables (rewrite(..., partitionBy)): data
            // files live one level down, under col=value dirs
            (st.isDirectory && st.getPath.getName.contains("=") &&
              fs.listStatus(st.getPath).exists(_.getPath.getName.endsWith(".parquet")))
        })

  def read(name: String, schema: StructType): DataFrame = {
    val p = resolve(name)
    if (hasParquet(p)) spark.read.schema(schema).parquet(p.toString)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  def append(name: String, df: DataFrame): Unit =
    withWriterLease(s"append:$name") {
      df.write.mode("append").parquet(resolve(name).toString)
    }

  /** Hive-style partitioned append — the 100TB layout for fact tables:
    * partition masters by periodo_id (or shipdate month) so every
    * periodo-filtered serving query prunes to one directory, and dynamic
    * partition pruning handles the dim-join case. PartitioningSpec proves
    * the scan's PartitionFilters kick in. Partitioned tables are
    * append-only, so they stay on the flat layout.
    */
  def appendPartitioned(name: String, df: DataFrame, cols: String*): Unit =
    withWriterLease(s"appendPartitioned:$name") {
      df.write.mode("append").partitionBy(cols: _*).parquet(path(name))
    }

  /** Read a partitioned table (partition columns come back from the
    * directory layout, so no explicit schema).
    */
  def readPartitioned(name: String): DataFrame =
    spark.read.parquet(path(name))

  /** Append into the directory `name` currently RESOLVES to — for a
    * versioned table, its live version dir — the grow-in-place path for
    * append-only artifacts (IVF inverted lists, the LSH band index): a
    * batch's rows land in their existing partition subdirectories without
    * rewriting the settled corpus's files. NOT atomic like [[rewrite]]:
    * a crash mid-append can leave a partial batch on disk, so callers
    * MUST be replay-idempotent (both callers anti-join what is already
    * there before appending — the reference ETL's idempotent-upsert
    * posture). Concurrent readers of the live version see the batch's
    * rows appear file-by-file; full snapshot isolation needs [[rewrite]].
    * Note for [[graft.queries.StampedTable]]-managed tables: appended
    * rows carry the APPEND-TIME stamp, so the table holds mixed stamps
    * and a later plain ensure may spuriously re-materialize (safe — the
    * rebuild is the fallback, never wrong data).
    */
  def appendLive(name: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit =
    withWriterLease(s"appendLive:$name") {
      // same one-file-per-touched-dir shaping as [[rewrite]]: a batch
      // left on its arrival partitioning writes (tasks holding the dir's
      // rows) files per dir per batch, and a year of appends turns every
      // partition dir into thousands of files before compact can catch
      // up. The shuffle is batch-sized — the cheapest stage of any
      // append.
      val shaped =
        if (partitionBy.nonEmpty) df.repartition(partitionBy.map(df.col): _*) else df
      shaped.write.mode("append")
        .option("maxRecordsPerFile", MaxRecordsPerFile)
        .partitionBy(partitionBy: _*).parquet(resolve(name).toString)
    }

  /** Compact a table grown by [[appendLive]]: re-commit the live rows as
    * ONE fresh generation with the per-batch file litter coalesced — at
    * scale every append leaves ≥ 1 file per touched partition per batch,
    * and a year of daily batches turns each partition directory into
    * hundreds of small files whose open/footer overhead dominates the
    * probe reads this layout exists to keep cheap. Rows (ALL columns,
    * including any stamp column) are preserved verbatim; partitioned
    * tables are shuffled onto their partition columns so each `col=value`
    * directory lands as one task's output (a directory larger than one
    * task's budget wants `spark.sql.files.maxRecordsPerFile` on top),
    * unpartitioned tables coalesce to `numFiles`. Readers are never
    * torn: this is the same pointer-flip commit as [[rewrite]] — the
    * appended generation keeps serving until the compacted one commits,
    * and a crash mid-compact leaves it live (the reference's posture of
    * VACUUM-equivalents never blocking reads).
    */
  def compact(name: String, schema: StructType, partitionBy: Seq[String] = Nil,
              numFiles: Int = 1): Unit = withWriterLease(s"compact:$name") {
    val df = read(name, schema)
    // partitioned tables: [[rewrite]] itself packs one file per
    // `col=value` dir now — no second shuffle here
    val packed = if (partitionBy.nonEmpty) df else df.repartition(numFiles)
    rewrite(name, packed, partitionBy)
  }

  /** Small control/dimension tables are rewritten atomically per run
    * (checkpoints, sync_log rollups, periodos after a transition): write a
    * new version directory, flip the pointer, GC superseded versions.
    * The new version is a different directory, so a rewrite whose input
    * lineage reads the table it replaces (periodos, checkpoints) never
    * overwrites what it is still reading.
    */
  def rewrite(name: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit = withWriterLease(s"rewrite:$name") {
    // what readers resolved BEFORE this rewrite (pointer, crash-recovered
    // version, or the legacy flat dir) — the one directory GC must keep
    val prevLive = resolve(name)
    val next = listVersions(name).lastOption.map(_._1).getOrElse(0L) + 1
    val vname = versionName(name, next)
    // partitionBy gives a versioned table the Hive layout (col=value dirs
    // inside the version dir) so partition-pruned reads work under the
    // same pointer-flip commit — the IVF inverted-list table's shape.
    // Shuffle onto the partition columns FIRST: without it every write
    // task fans a file into every partition dir it holds rows for —
    // shuffle.partitions × |values| tiny files from a single seed
    // (measured: a bits=13 seed wrote 144k sub-2KB files, and the
    // open/footer overhead of that litter is exactly what this layout's
    // probe reads must not pay; on an object store it is fatal). One
    // value → one task → one file per dir; a skewed giant partition
    // still splits via maxRecordsPerFile rather than stalling a reader
    // on one huge file. Probe-index tables are value-partitioned fine-
    // grained (hundreds to thousands of dirs), so task parallelism
    // survives the shuffle; high-volume fact appends, where per-task
    // parallelism INSIDE one partition value matters more than file
    // count, go through [[appendPartitioned]], which deliberately keeps
    // the parallel layout.
    val shaped =
      if (partitionBy.nonEmpty) df.repartition(partitionBy.map(df.col): _*) else df
    shaped.write.mode("overwrite")
      .option("maxRecordsPerFile", MaxRecordsPerFile)
      .partitionBy(partitionBy: _*).parquet(path(vname))

    // commit: tmp pointer + rename. Rename is atomic on local FS and HDFS;
    // between delete and rename there is no pointer, and resolve() then
    // picks this newest _SUCCESS-marked version — still consistent.
    val ptr = pointerPath(name)
    val tmp = new Path(dir, s"$name.__current.tmp")
    val out = fs.create(tmp, true)
    try out.write(vname.getBytes("UTF-8")) finally out.close()
    if (fs.exists(ptr)) fs.delete(ptr, false)
    if (!fs.rename(tmp, ptr))
      throw new java.io.IOException(s"rewrite of $name failed to commit pointer")
    val committedOpt = appendHistory(name, vname, Some(prevLive.getName))

    // best-effort GC keeps what pre-rewrite readers resolved (prevLive, by
    // identity — NOT by version number, which a stray uncommitted dir from
    // a crashed write would shift), the new version, AND the newest
    // RetainVersions COMMITTED generations (pointer-target history — a
    // stray dir never occupies a reader-window slot, since no reader can
    // have resolved it through the pointer): a DataFrame whose scan
    // resolved TWO OR MORE rewrites ago may still be unevaluated, and a
    // one-generation window would delete its files mid-flight — the very
    // hazard versioning removes. Strays are swept here; multi-generation
    // reclamation belongs solely to `vacuum`, which the caller invokes
    // when no older readers can exist.
    committedOpt.foreach { committed =>
      val recent = committed.takeRight(RetainVersions)
      val keep = (recent :+ vname :+ prevLive.getName).toSet
      listVersions(name).foreach { case (_, p) =>
        if (!keep.contains(p.getName)) fs.delete(p, true) }
    }
  }

  /** Version directories `rewrite` retains beyond the live one — bounds
    * how far behind a still-unevaluated reader plan may lag before only
    * `vacuum` (not a routine rewrite) could break it.
    */
  val RetainVersions = 3

  /** Per-file row cap on the one-task-per-partition-value layout
    * [[rewrite]]/[[appendLive]] shape into: a skewed partition value
    * splits into bounded files instead of becoming one unsplittable
    * multi-GB parquet (a reader can parallelize across files; it cannot
    * parallelize a single row group it has to open). 5M rows ≈
    * 100-500 MB of the row shapes these tables hold.
    */
  val MaxRecordsPerFile = 5000000L

  /** Reclaim all superseded storage for `name` (older versions and the
    * legacy flat directory). Call when no reader holds a plan resolved
    * before the last rewrite — e.g. between runs. Keeps whatever
    * [[resolve]] currently returns — in the crash window with no pointer,
    * that is the newest complete version, never nothing.
    */
  def vacuum(name: String): Unit = withWriterLease(s"vacuum:$name") {
    val live = resolve(name).getName
    listVersions(name).foreach { case (_, p) =>
      if (p.getName != live) fs.delete(p, true) }
    val flat = new Path(dir, name)
    if (live != name && fs.exists(flat)) fs.delete(flat, true)
    // reset the retention history to the sole surviving generation, and
    // reclaim tmp strays left by crashed writers (tmp names are
    // writer-unique since round 6, so they no longer self-overwrite; a
    // LIVE concurrent writer losing its tmp here just skips GC for that
    // rewrite — vacuum is already documented as a quiescent operation)
    try {
      // rawHistoryFiles, not historyFiles: zero-length claims from crashed
      // writers are invisible to resolution and must be reclaimed HERE —
      // numbering steps past them, so nothing else ever removes them
      rawHistoryFiles(name).foreach { case (_, p, _) => fs.delete(p, false) }
      Option(fs.globStatus(new Path(dir, s"$name.__history.tmp*")))
        .getOrElse(Array.empty).foreach(st => fs.delete(st.getPath, false))
      // ...and the fixed-name pointer tmp a rewrite crashed between
      // create and rename would leave (one file per table at most).
      // _staging/ dirs are deliberately NOT swept here: they are
      // warehouse-wide, so a per-table vacuum could delete another
      // table's in-flight staged increment.
      val pointerTmp = new Path(dir, s"$name.__current.tmp")
      if (fs.exists(pointerTmp)) fs.delete(pointerTmp, false)
      if (fs.exists(legacyHistoryPath(name))) fs.delete(legacyHistoryPath(name), false)
      if (live.startsWith(s"$name.__v")) appendHistory(name, live, None)
    } catch { case _: java.io.IOException => () }
  }

  /** Bounded-retention reclamation — [[vacuum]] for tables that keep
    * being rewritten BETWEEN full quiesces (the lifecycle warehouses
    * rewrite their state tables per batch, and routine rewrites only ever
    * sweep strays, so generations otherwise accumulate until a quiescent
    * moment that may never come). Keeps whatever [[resolve]] currently
    * returns (in the crash window with no pointer, that is the newest
    * complete version — a live target is NEVER deleted) plus the newest
    * `retainLast` COMMITTED generations BESIDES live (live-exclusive, so
    * the window is not silently one narrower when live is itself the
    * newest committed generation — the usual case), so a
    * still-unevaluated reader plan up to `retainLast` rewrites old keeps
    * resolving. An unreadable
    * history means the committed window is unknown: skip reclamation
    * entirely rather than guess (deleting a still-referenced version is
    * the one unrecoverable outcome). Like [[vacuum]], assumes no
    * concurrent WRITER on this table (an uncommitted in-flight version
    * dir reads as a stray and would be swept); readers are safe within
    * the retention window. `retainLast <= 0` degrades to the full
    * [[vacuum]].
    */
  def vacuum(name: String, retainLast: Int): Unit = withWriterLease(s"vacuum:$name:$retainLast") {
    if (retainLast <= 0) vacuum(name) // re-enters the held lease
    else {
      val live = resolve(name).getName
      val committed =
        try Some(history(name)) catch { case _: java.io.IOException => None }
      committed.foreach { committedNames =>
        val keep = (committedNames.filterNot(_ == live).takeRight(retainLast) :+ live).toSet
        listVersions(name).foreach { case (_, p) =>
          if (!keep.contains(p.getName)) fs.delete(p, true) }
        // the legacy flat dir is a generation like any other: reclaim it
        // only when neither live nor the retention window still names it
        val flat = new Path(dir, name)
        if (!keep.contains(name) && fs.exists(flat) && fs.getFileStatus(flat).isDirectory)
          fs.delete(flat, true)
      }
    }
  }

  /** [[vacuum]](name, retainLast) for EVERY versioned table of this
    * warehouse — names discovered from pointer files and version-dir
    * prefixes (a table that lost its pointer mid-crash is still found
    * and its newest complete version still kept). The bounded-retention
    * maintenance pass a deployment schedules against a state warehouse;
    * same quiescence contract as [[vacuum]].
    */
  def vacuumAll(retainLast: Int): Unit = withWriterLease(s"vacuumAll:$retainLast") {
    def names(glob: String, strip: String => Option[String]): Seq[String] = {
      val stats = try fs.globStatus(new Path(dir, glob))
                  catch { case _: java.io.IOException => null }
      Option(stats).map(_.toSeq).getOrElse(Nil)
        .flatMap(st => strip(st.getPath.getName))
    }
    val fromPointers = names("*.__current", n => Some(n.stripSuffix(".__current")))
    val fromVersions = names("*.__v*", { n =>
      val i = n.lastIndexOf(".__v")
      if (i > 0 && n.drop(i + 4).forall(_.isDigit)) Some(n.take(i)) else None
    })
    (fromPointers ++ fromVersions).distinct.foreach(vacuum(_, retainLast))
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
