package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.etl.Warehouse

/** Crash-safety of the versioned rewrite (VERDICT r1 item 9): at every
  * interruption point of `rewrite` the table stays readable — old data
  * before the pointer flip, new data after — and the append→rewrite→append
  * lifecycle (backfill shape) keeps one consistent directory.
  */
class WarehouseSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  private def fresh() = Warehouse(spark, Files.createTempDirectory("graft_ws_").toString)

  private def names(wh: Warehouse, n: String = "t"): Set[String] =
    wh.read(n, schema).collect().map(_.getString(1)).toSet

  test("rewrite supersedes; GC retains a version window; vacuum reclaims") {
    val wh = fresh()
    (1 to 5).foreach(i => wh.rewrite("t", Seq((1L, s"v$i")).toDF("id", "name")))
    assert(names(wh) === Set("v5"))
    // the newest RetainVersions survive routine rewrites (a reader plan
    // resolved several rewrites ago may still be unevaluated); only
    // vacuum — an explicit no-older-readers declaration — reclaims further
    val fs = new Path(wh.dir).getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.globStatus(new Path(wh.dir, "t.__v*")).length === wh.RetainVersions)
    wh.vacuum("t")
    assert(fs.globStatus(new Path(wh.dir, "t.__v*")).length === 1)
    assert(names(wh) === Set("v5"))
  }

  test("partitioned rewrite/appendLive pack one file per partition dir (no task fan-out litter)") {
    // without the pre-write shuffle a seed fans shuffle.partitions files
    // into EVERY value dir (measured at the sf10 decade²: a bits=13 seed
    // wrote 144k sub-2KB files). One value → one task → one file per dir,
    // for the initial rewrite AND for each subsequent appended batch.
    val wh = fresh()
    val pschema = StructType(Seq(
      StructField("id", LongType), StructField("bucket", LongType)))
    def filesPerDir(n: String): Map[String, Int] = {
      val fs = new Path(wh.dir).getFileSystem(spark.sessionState.newHadoopConf())
      // one rewrite ran → exactly one version dir is the live one
      val live = fs.globStatus(new Path(wh.dir, s"$n.__v*")).map(_.getPath).toSeq match {
        case Seq(p) => p
        case other  => fail(s"expected one version dir, got $other")
      }
      fs.listStatus(live).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
        .map(s => s.getPath.getName ->
          fs.listStatus(s.getPath).count(_.getPath.getName.endsWith(".parquet"))).toMap
    }
    val seed = spark.range(0, 1000).selectExpr("id", "id % 16 AS bucket")
      .repartition(8) // adversarial arrival partitioning: every task holds every bucket
    wh.rewrite("pt", seed, partitionBy = Seq("bucket"))
    val afterSeed = filesPerDir("pt")
    assert(afterSeed.size === 16)
    assert(afterSeed.values.forall(_ === 1), s"seed litter: $afterSeed")
    wh.appendLive("pt",
      spark.range(1000, 1100).selectExpr("id", "id % 4 AS bucket").repartition(8),
      partitionBy = Seq("bucket"))
    val afterAppend = filesPerDir("pt")
    assert((0 until 4).forall(b => afterAppend(s"bucket=$b") === 2), s"append litter: $afterAppend")
    assert((4 until 16).forall(b => afterAppend(s"bucket=$b") === 1))
    assert(wh.read("pt", pschema).count() === 1100)
  }

  test("vacuum(retainLast): bounded retention keeps live + N committed generations") {
    val wh = fresh()
    (1 to 6).foreach(i => wh.rewrite("t", Seq((1L, s"v$i")).toDF("id", "name")))
    val fs = new Path(wh.dir).getFileSystem(spark.sessionState.newHadoopConf())
    wh.vacuum("t", retainLast = 2)
    // live (v6) + the 2 newest committed generations BESIDES it — the
    // keep is live-exclusive so the documented reader window holds even
    // when live is itself the newest committed generation (the usual
    // case): 3 dirs survive
    assert(fs.globStatus(new Path(wh.dir, "t.__v*")).length === 3)
    assert(names(wh) === Set("v6"))
    // a lagging reader EXACTLY retainLast rewrites old still completes
    // after the vacuum — the documented window bound itself, not one
    // inside it
    wh.rewrite("t", Seq((1L, "v7")).toDF("id", "name"))
    val lagging = wh.read("t", schema) // resolves v7 NOW
    wh.rewrite("t", Seq((1L, "v8")).toDF("id", "name"))
    wh.rewrite("t", Seq((1L, "v9")).toDF("id", "name")) // lagging is 2 back
    wh.vacuum("t", retainLast = 2)
    assert(lagging.collect().map(_.getString(1)).toSet === Set("v7"))
    // retainLast <= 0 degrades to the full vacuum
    wh.vacuum("t", retainLast = 0)
    assert(fs.globStatus(new Path(wh.dir, "t.__v*")).length === 1)
    assert(names(wh) === Set("v9"))
  }

  test("vacuumAll: discovers every table (incl. pointer-less), bounded retention, live kept") {
    val wh = fresh()
    (1 to 5).foreach(i => wh.rewrite("a", Seq((1L, s"a$i")).toDF("id", "name")))
    (1 to 5).foreach(i => wh.rewrite("b", Seq((1L, s"b$i")).toDF("id", "name")))
    val fs = new Path(wh.dir).getFileSystem(spark.sessionState.newHadoopConf())
    // b loses its pointer (crash window) — discovery must still find it
    fs.delete(new Path(wh.dir, "b.__current"), false)
    wh.vacuumAll(retainLast = 1)
    assert(names(wh, "a") === Set("a5"))
    assert(names(wh, "b") === Set("b5"))
    // live + 1 prior committed generation each (live-exclusive keep)
    assert(fs.globStatus(new Path(wh.dir, "a.__v*")).length === 2)
    assert(fs.globStatus(new Path(wh.dir, "b.__v*")).length === 2)
  }

  test("vacuum(retainLast) in the crash window (no pointer) keeps what resolve returns") {
    val wh = fresh()
    (1 to 3).foreach(i => wh.rewrite("t", Seq((1L, s"v$i")).toDF("id", "name")))
    val fs = new Path(wh.dir).getFileSystem(spark.sessionState.newHadoopConf())
    // crash between pointer delete and rename: no pointer on disk
    fs.delete(new Path(wh.dir, "t.__current"), false)
    wh.vacuum("t", retainLast = 1)
    // the newest complete version was the live target — never deleted
    assert(names(wh) === Set("v3"))
  }

  test("a reader lagging TWO rewrites still completes (multi-generation window)") {
    val wh = fresh()
    wh.rewrite("t", Seq((1L, "gen1")).toDF("id", "name"))
    val pre = wh.read("t", schema) // plan resolves gen1 NOW
    wh.rewrite("t", Seq((1L, "gen2")).toDF("id", "name"))
    wh.rewrite("t", Seq((1L, "gen3")).toDF("id", "name"))
    // two rewrites later the gen1 files must still exist — the one-
    // generation GC deleted them and failed exactly this evaluation
    assert(pre.collect().map(_.getString(1)).toSet === Set("gen1"))
    assert(names(wh) === Set("gen3"))
  }

  test("a reader resolved before a rewrite still completes after it") {
    val wh = fresh()
    wh.rewrite("t", Seq((1L, "before")).toDF("id", "name"))
    val pre = wh.read("t", schema) // plan resolves the current version NOW
    wh.rewrite("t", Seq((1L, "after")).toDF("id", "name"))
    // evaluation happens post-rewrite; the pre-rewrite version must still
    // be on disk for this job to succeed
    assert(pre.collect().map(_.getString(1)).toSet === Set("before"))
    assert(names(wh) === Set("after"))
  }

  test("a stray uncommitted version (crash before pointer flip) is invisible") {
    val wh = fresh()
    wh.rewrite("t", Seq((1L, "committed")).toDF("id", "name"))
    // simulate: rewrite wrote its data dir, crashed before touching the pointer
    Seq((1L, "uncommitted")).toDF("id", "name")
      .write.parquet(s"${wh.dir}/t.__v000099")
    assert(names(wh) === Set("committed"))
    // and the next rewrite numbers PAST the stray, then commits over it
    wh.rewrite("t", Seq((1L, "after")).toDF("id", "name"))
    assert(names(wh) === Set("after"))
  }

  test("a missing pointer (crash mid-commit) recovers the newest complete version") {
    val wh = fresh()
    wh.rewrite("t", Seq((1L, "v1")).toDF("id", "name"))
    wh.rewrite("t", Seq((1L, "v2")).toDF("id", "name"))
    val fs = new Path(wh.dir).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(wh.dir, "t.__current"), false)
    assert(names(wh) === Set("v2"))
  }

  test("recovery skips a version directory without _SUCCESS (crash mid-write)") {
    val wh = fresh()
    wh.rewrite("t", Seq((1L, "good")).toDF("id", "name"))
    Seq((1L, "torn")).toDF("id", "name").write.parquet(s"${wh.dir}/t.__v000099")
    val fs = new Path(wh.dir).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(wh.dir, "t.__v000099/_SUCCESS"), false)
    fs.delete(new Path(wh.dir, "t.__current"), false)
    assert(names(wh) === Set("good"))
  }

  test("vacuum with a missing pointer keeps the newest complete version") {
    val wh = fresh()
    wh.rewrite("t", Seq((1L, "v1")).toDF("id", "name"))
    wh.rewrite("t", Seq((1L, "v2")).toDF("id", "name"))
    val fs = new Path(wh.dir).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(wh.dir, "t.__current"), false) // crash mid-commit
    wh.vacuum("t")
    // the recovered live version must survive the vacuum, not be swept
    assert(names(wh) === Set("v2"))
    assert(fs.globStatus(new Path(wh.dir, "t.__v*")).length === 1)
  }

  test("GC keeps the live previous version by identity, not version number") {
    val wh = fresh()
    wh.rewrite("t", Seq((1L, "live-prev")).toDF("id", "name")) // v1, pointer -> v1
    // stray: a later rewrite crashed after writing v2, before the flip
    Seq((1L, "stray")).toDF("id", "name").write.parquet(s"${wh.dir}/t.__v000002")
    val pre = wh.read("t", schema) // resolves pointer -> v1
    wh.rewrite("t", Seq((1L, "new")).toDF("id", "name")) // v3; GC must keep v1
    assert(pre.collect().map(_.getString(1)).toSet === Set("live-prev"))
    val fs = new Path(wh.dir).getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(new Path(wh.dir, "t.__v000001")))  // live previous kept
    // the stray was never a pointer target, so it occupies no reader-
    // window slot — swept by the rewrite's GC, not retained
    assert(!fs.exists(new Path(wh.dir, "t.__v000002")))
    assert(names(wh) === Set("new"))
  }

  test("upgrade path: version dirs predating the history file stay in the reader window") {
    val wh = fresh()
    wh.rewrite("t", Seq((1L, "old1")).toDF("id", "name"))
    val pre = wh.read("t", schema) // reader holds the pre-history generation
    // simulate a warehouse written by the pre-history scheme
    val fs = new Path(wh.dir).getFileSystem(spark.sessionState.newHadoopConf())
    Option(fs.globStatus(new Path(wh.dir, "t.__history*")))
      .foreach(_.foreach(st => fs.delete(st.getPath, false)))
    wh.rewrite("t", Seq((1L, "new1")).toDF("id", "name"))
    wh.rewrite("t", Seq((1L, "new2")).toDF("id", "name"))
    // the seed treats pre-history versions as committed — the window must
    // not collapse to just the post-upgrade generations
    assert(pre.collect().map(_.getString(1)).toSet === Set("old1"))
    assert(names(wh) === Set("new2"))
  }

  test("history resolves the newest generation; stale generations and tmp strays are inert") {
    val wh = fresh()
    wh.rewrite("t", Seq((1L, "gen1")).toDF("id", "name")) // v1 committed, history gen written
    val fs = new Path(wh.dir).getFileSystem(spark.sessionState.newHadoopConf())
    def put(p: String, txt: String): Unit = {
      val out = fs.create(new Path(wh.dir, p), true)
      try out.write(txt.getBytes("UTF-8")) finally out.close()
    }
    // crash debris: a STALE older generation naming a dir that never was a
    // pointer target, and an abandoned tmp — neither may affect resolution
    put("t.__history.000000", "t.__v000099\n")
    put("t.__history.tmp", "t.__v000098\n")
    val pre = wh.read("t", schema)
    wh.rewrite("t", Seq((1L, "gen2")).toDF("id", "name"))
    assert(pre.collect().map(_.getString(1)).toSet === Set("gen1"))
    assert(names(wh) === Set("gen2"))
    // the commit swept superseded generations: exactly one numeric
    // generation file remains, and it is the newest
    val gens = fs.globStatus(new Path(wh.dir, "t.__history.*")).map(_.getPath.getName)
      .filter(_.stripPrefix("t.__history.").forall(_.isDigit))
    assert(gens.length === 1)
    // vacuum reclaims abandoned tmp strays (writer-unique names no longer
    // self-overwrite, so crash debris would otherwise linger forever)
    assert(fs.exists(new Path(wh.dir, "t.__history.tmp")))
    wh.vacuum("t")
    assert(fs.globStatus(new Path(wh.dir, "t.__history.tmp*")).isEmpty)
    assert(names(wh) === Set("gen2")) // the live table is untouched
  }

  test("a crashed claim (zero-length newest generation) neither shadows history nor stalls numbering") {
    val wh = fresh()
    wh.rewrite("t", Seq((1L, "gen1")).toDF("id", "name")) // v1, committed
    val pre = wh.read("t", schema)                        // reader holds v1
    val fs = new Path(wh.dir).getFileSystem(spark.sessionState.newHadoopConf())
    // crash debris pair: an uncommitted version dir AND a zero-length
    // claim at the next history seq (a writer died between createNewFile
    // and renaming its entry list over it). Were the empty claim resolved
    // as the newest generation, history would read as an EMPTY entry list
    // and the next rewrite would seed the committed set from raw version
    // dirs — admitting the stray into a reader-window slot and pushing v1
    // out two rewrites later.
    Seq((1L, "stray")).toDF("id", "name").write.parquet(s"${wh.dir}/t.__v000002")
    val maxSeq = fs.globStatus(new Path(wh.dir, "t.__history.*")).map(_.getPath.getName)
      .flatMap(_.stripPrefix("t.__history.").toLongOption).max
    assert(fs.createNewFile(new Path(wh.dir, f"t.__history.${maxSeq + 1}%06d")))
    wh.rewrite("t", Seq((1L, "gen2")).toDF("id", "name"))
    wh.rewrite("t", Seq((1L, "gen3")).toDF("id", "name"))
    assert(pre.collect().map(_.getString(1)).toSet === Set("gen1"),
      "the empty claim shadowed the intact generation and the stray seed narrowed the window")
    assert(names(wh) === Set("gen3"))
    // numbering moved PAST the stale claim (a same-seq retry would lose
    // the claim and skip GC on every future rewrite)
    val committed = fs.globStatus(new Path(wh.dir, "t.__history.*"))
      .flatMap(st => st.getPath.getName.stripPrefix("t.__history.").toLongOption
        .map(_ -> st.getLen))
    assert(committed.exists { case (seq, len) => seq > maxSeq + 1 && len > 0 })
    // the stale claim itself is reclaimed by vacuum, not left forever
    wh.vacuum("t")
    val after = fs.globStatus(new Path(wh.dir, "t.__history.*"))
      .filter(_.getPath.getName.stripPrefix("t.__history.").forall(_.isDigit))
    assert(after.nonEmpty && after.forall(_.getLen > 0))
    assert(names(wh) === Set("gen3"))
  }

  test("a stray never shrinks the reader window (retention counts committed generations)") {
    val wh = fresh()
    wh.rewrite("t", Seq((1L, "gen1")).toDF("id", "name")) // v1, committed
    val pre = wh.read("t", schema)                        // reader holds v1
    // crashed rewrite: v2 fully written (_SUCCESS) but never pointed to
    Seq((1L, "stray")).toDF("id", "name").write.parquet(s"${wh.dir}/t.__v000002")
    wh.rewrite("t", Seq((1L, "gen2")).toDF("id", "name")) // v3
    wh.rewrite("t", Seq((1L, "gen3")).toDF("id", "name")) // v4
    // two committed rewrites later the v1 reader is still inside the
    // window — a version-dir count would have let the stray push v1 out
    assert(pre.collect().map(_.getString(1)).toSet === Set("gen1"))
    assert(names(wh) === Set("gen3"))
  }

  // --- transient-failure paths, driven through the fault-injecting
  // flaky:// FileSystem (FlakyFs): concurrent-sweep FNF races and
  // generation-rename collisions must SKIP GC, never corrupt the window
  private def flakyWh(): Warehouse = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.flaky.impl", classOf[FlakyFs].getName)
    FlakyFs.reset()
    Warehouse(spark, "flaky://" + Files.createTempDirectory("graft_flaky_").toString)
  }
  private def isHistoryGen(n: String): Boolean =
    n.startsWith("t.__history.") && n.stripPrefix("t.__history.").forall(_.isDigit)
  private def versionDirs(wh: Warehouse): Int = {
    val fs = new Path(wh.dir).getFileSystem(spark.sessionState.newHadoopConf())
    fs.globStatus(new Path(wh.dir, "t.__v*")).length
  }

  test("history generation swept mid-read (one FNF): retried, GC proceeds") {
    val wh = flakyWh()
    try {
      (1 to 4).foreach(i => wh.rewrite("t", Seq((1L, s"v$i")).toDF("id", "name")))
      assert(versionDirs(wh) === wh.RetainVersions)
      FlakyFs.failOpens(1)(isHistoryGen) // the race hits once; retry lands
      wh.rewrite("t", Seq((1L, "v5")).toDF("id", "name"))
      assert(!FlakyFs.armed, "injected FNF was not consumed")
      assert(versionDirs(wh) === wh.RetainVersions) // GC ran normally
      assert(names(wh) === Set("v5"))
    } finally FlakyFs.reset()
  }

  test("history generation vanishing twice is transient, not absent: GC skipped, then self-heals") {
    val wh = flakyWh()
    try {
      (1 to 4).foreach(i => wh.rewrite("t", Seq((1L, s"v$i")).toDF("id", "name")))
      assert(versionDirs(wh) === wh.RetainVersions)
      // both the first read AND the retry hit FNF: the committed set is
      // unknown — were this treated as "absent history", the seed from raw
      // version dirs would fabricate a committed set and GC against it
      FlakyFs.failOpens(2)(isHistoryGen)
      wh.rewrite("t", Seq((1L, "v5")).toDF("id", "name"))
      assert(!FlakyFs.armed, "injected FNFs were not consumed")
      assert(versionDirs(wh) === wh.RetainVersions + 1) // GC skipped this rewrite
      assert(names(wh) === Set("v5"))
      // next rewrite reads the intact history, self-heals the lost entry
      // (prevLive is committed by definition) and GC catches back up
      wh.rewrite("t", Seq((1L, "v6")).toDF("id", "name"))
      assert(versionDirs(wh) === wh.RetainVersions)
      assert(names(wh) === Set("v6"))
    } finally FlakyFs.reset()
  }

  test("history seq collision (claim lost to a concurrent writer): GC skipped, then self-heals") {
    // The collision guard is the create-exclusive CLAIM, not rename-
    // returns-false (POSIX local rename silently overwrites, so rename
    // could never guard here). A writer whose claim appears BEFORE our
    // seq listing never collides — we list past it and take the next seq
    // — so the race is between the listing and the createNewFile, and
    // the injected create-false models exactly that: the other writer
    // claimed our computed seq first.
    val wh = flakyWh()
    try {
      (1 to 4).foreach(i => wh.rewrite("t", Seq((1L, s"v$i")).toDF("id", "name")))
      assert(versionDirs(wh) === wh.RetainVersions)
      FlakyFs.failCreates(1)(isHistoryGen)
      wh.rewrite("t", Seq((1L, "v5")).toDF("id", "name")) // must not throw
      assert(!FlakyFs.armed, "injected create failure was not consumed")
      assert(versionDirs(wh) === wh.RetainVersions + 1) // GC skipped this rewrite
      assert(names(wh) === Set("v5"))
      wh.rewrite("t", Seq((1L, "v6")).toDF("id", "name")) // self-heal + GC resumes
      assert(versionDirs(wh) === wh.RetainVersions)
      assert(names(wh) === Set("v6"))
    } finally FlakyFs.reset()
  }

  test("claim lost via FileAlreadyExistsException (Hadoop's other loser shape): GC skipped") {
    // createNewFile is exists-then-create, so the race loser can surface
    // as a thrown FileAlreadyExistsException rather than false. Both
    // shapes must read as claim-lost; the exception reaching the blanket
    // IOException catch would return Some and run GC — the exact outcome
    // the claim exists to prevent.
    val wh = flakyWh()
    try {
      (1 to 4).foreach(i => wh.rewrite("t", Seq((1L, s"v$i")).toDF("id", "name")))
      assert(versionDirs(wh) === wh.RetainVersions)
      FlakyFs.failCreateThrows(1)(isHistoryGen)
      wh.rewrite("t", Seq((1L, "v5")).toDF("id", "name")) // must not throw
      assert(!FlakyFs.armed, "injected create exception was not consumed")
      assert(versionDirs(wh) === wh.RetainVersions + 1) // GC skipped this rewrite
      assert(names(wh) === Set("v5"))
      wh.rewrite("t", Seq((1L, "v6")).toDF("id", "name")) // self-heal + GC resumes
      assert(versionDirs(wh) === wh.RetainVersions)
      assert(names(wh) === Set("v6"))
    } finally FlakyFs.reset()
  }

  test("HDFS-semantics rename refusal onto our own claim: retried once, GC proceeds") {
    // After a successful claim, an HDFS-like store refuses rename onto the
    // existing (our own) target — the writer clears the claim and retries;
    // the history lands and GC runs normally.
    val wh = flakyWh()
    try {
      (1 to 4).foreach(i => wh.rewrite("t", Seq((1L, s"v$i")).toDF("id", "name")))
      assert(versionDirs(wh) === wh.RetainVersions)
      FlakyFs.failRenames(1)(isHistoryGen)
      wh.rewrite("t", Seq((1L, "v5")).toDF("id", "name"))
      assert(!FlakyFs.armed, "injected rename failure was not consumed")
      assert(versionDirs(wh) === wh.RetainVersions) // GC ran normally
      assert(names(wh) === Set("v5"))
    } finally FlakyFs.reset()
  }

  test("rename failing twice (claim cleared, target reappeared): GC skipped") {
    val wh = flakyWh()
    try {
      (1 to 4).foreach(i => wh.rewrite("t", Seq((1L, s"v$i")).toDF("id", "name")))
      assert(versionDirs(wh) === wh.RetainVersions)
      FlakyFs.failRenames(2)(isHistoryGen)
      wh.rewrite("t", Seq((1L, "v5")).toDF("id", "name")) // must not throw
      assert(!FlakyFs.armed, "injected rename failures were not consumed")
      assert(versionDirs(wh) === wh.RetainVersions + 1) // GC skipped this rewrite
      assert(names(wh) === Set("v5"))
      wh.rewrite("t", Seq((1L, "v6")).toDF("id", "name")) // self-heal + GC resumes
      assert(versionDirs(wh) === wh.RetainVersions)
      assert(names(wh) === Set("v6"))
    } finally FlakyFs.reset()
  }

  test("append → rewrite → append stays one consistent table (backfill shape)") {
    val wh = fresh()
    wh.append("t", Seq((1L, "a")).toDF("id", "name"))
    wh.append("t", Seq((2L, "b")).toDF("id", "name"))
    assert(names(wh) === Set("a", "b"))
    wh.rewrite("t", wh.read("t", schema).withColumn("name",
      org.apache.spark.sql.functions.upper($"name")))
    assert(names(wh) === Set("A", "B"))
    // the flat legacy dir stays until vacuum (pre-rewrite readers may
    // still scan it) but is no longer what reads/appends resolve to
    wh.append("t", Seq((3L, "c")).toDF("id", "name"))
    assert(names(wh) === Set("A", "B", "c"))
    wh.vacuum("t")
    val fs = new Path(wh.dir).getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new Path(wh.dir, "t")))
    assert(names(wh) === Set("A", "B", "c"))
  }

  test("never-written table reads empty with the right schema") {
    val wh = fresh()
    val df = wh.read("nope", schema)
    assert(df.count() === 0)
    assert(df.schema === schema)
  }

  test("writer lease: a foreign fresh lease blocks every mutator loudly; expired leases are stolen") {
    val wh = fresh()
    wh.rewrite("t", Seq((1L, "v1")).toDF("id", "name")) // acquire + release works
    val fs = new Path(wh.dir).getFileSystem(spark.sessionState.newHadoopConf())
    val lease = new Path(wh.dir, "__writer.lease")
    assert(!fs.exists(lease), "lease not released after a completed rewrite")
    // simulate a LIVE writer in another process: foreign owner, fresh mtime
    val out = fs.create(lease, false)
    out.write("9999@other-host/deadbeef\nvacuumAll:2\n".getBytes("UTF-8")); out.close()
    intercept[graft.etl.ConcurrentWriterException] {
      wh.rewrite("t", Seq((1L, "v2")).toDF("id", "name"))
    }
    intercept[graft.etl.ConcurrentWriterException] { wh.vacuum("t", retainLast = 1) }
    intercept[graft.etl.ConcurrentWriterException] {
      wh.appendLive("t", Seq((2L, "x")).toDF("id", "name"))
    }
    // the blocked rewrite must not have advanced the table
    assert(names(wh) === Set("v1"))
    // a crashed writer's lease (mtime beyond the TTL) is stolen, the op
    // proceeds, and the thief's lease is released after it
    fs.setTimes(lease, System.currentTimeMillis() - 16 * 60 * 1000L, -1)
    wh.rewrite("t", Seq((1L, "v2")).toDF("id", "name"))
    assert(names(wh) === Set("v2"))
    assert(!fs.exists(lease), "stolen lease not released after the op")
  }

  test("writer lease is re-entrant within the process: compact and vacuumAll nest their inner ops") {
    val wh = fresh()
    (1 to 3).foreach(i => wh.rewrite("t", Seq((1L, s"v$i")).toDF("id", "name")))
    wh.appendLive("t", Seq((2L, "w")).toDF("id", "name"))
    wh.compact("t", schema)   // compact → rewrite under one lease
    wh.vacuumAll(1)           // vacuumAll → per-table vacuum under one lease
    assert(names(wh) === Set("v3", "w"))
    val fs = new Path(wh.dir).getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new Path(wh.dir, "__writer.lease")))
  }
}
