package graft

import java.util.concurrent.atomic.AtomicInteger

import scala.util.{Failure, Success, Try}

import graft.sources.{PageFetcher, RestFetchers}

/** A cluster-safe fetcher the reflective path instantiates per executor:
  * 25 rows total → pages of 10, 10, 5 (short page ends the stream).
  */
class FixedPagesFetcher extends PageFetcher {
  override def fetch(offset: Int, pageSize: Int): Try[Seq[String]] =
    Success((offset until math.min(offset + pageSize, 25))
      .map(i => s"""{"id":$i}"""))
}

/** Class transport over mutable companion-object state: every reflective
  * zero-arg instance sees the same growable dataset — the shape of a
  * fetcherClass hitting a live endpoint that gains rows between actions.
  */
class GrowableFetcher extends PageFetcher {
  override def fetch(offset: Int, pageSize: Int): Try[Seq[String]] = {
    GrowableFetcher.calls.incrementAndGet()
    val t = GrowableFetcher.total.get()
    Success(if (offset >= t) Nil
    else (offset until math.min(offset + pageSize, t)).map(i => s"""{"id":$i}"""))
  }
}
object GrowableFetcher {
  val total = new AtomicInteger(20)
  val calls = new AtomicInteger(0)
}

class RestSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def readRest(extra: (String, String)*) = {
    val base = spark.read.format("graft.sources.RestSource")
    extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  test("parallel page ranges cover the stream exactly once, in offset order") {
    RestFetchers.register("sixty") { (offset, pageSize) =>
      Success((offset until math.min(offset + pageSize, 60)).map(i => s"""{"id":$i}"""))
    }
    try {
      val df = readRest("fetcher" -> "sixty", "pageSize" -> "7",
        "maxPages" -> "20", "pagesPerPartition" -> "3")
      // > 1 input partition actually planned (the parallel-fetch claim)
      assert(df.rdd.getNumPartitions > 1)
      val rows = df.orderBy("offset").as[(String, Int)].collect()
      assert(rows.map(_._2).toSeq === (0 until 60))
      assert(rows.map(_._1).distinct.length === 60) // no duplicated pages
    } finally RestFetchers.unregister("sixty")
  }

  test("short page ends a partition's stream; ranges past the end are empty") {
    val calls = new AtomicInteger
    RestFetchers.register("short") { (offset, pageSize) =>
      calls.incrementAndGet()
      Success(if (offset >= 12) Nil
      else (offset until math.min(offset + pageSize, 12)).map(i => s"r$i"))
    }
    try {
      val df = readRest("fetcher" -> "short", "pageSize" -> "5",
        "maxPages" -> "8", "pagesPerPartition" -> "2")
      assert(df.count() === 12)
      // planner probe (pages 0,1,2 → bound 3) + reads of pages 0,1,2:
      // ≤6 per planning pass, and Spark may plan twice for one action —
      // far under the 4-range × 2-page naive fetch plus probes
      assert(calls.get() <= 12)
    } finally RestFetchers.unregister("short")
  }

  test("planner probe bounds fetch count by data size, not maxPages") {
    val calls = new AtomicInteger
    RestFetchers.register("tiny") { (offset, pageSize) =>
      calls.incrementAndGet()
      Success(if (offset >= 50) Nil
      else (offset until math.min(offset + pageSize, 50)).map(i => s"r$i"))
    }
    try {
      val df = readRest("fetcher" -> "tiny", "pageSize" -> "100",
        "maxPages" -> "1000", "pagesPerPartition" -> "8")
      assert(df.count() === 50)
      // without the galloping probe this read plans 125 ranges and issues
      // ≥125 requests; with it: one probe + one read per planning pass
      assert(calls.get() <= 6)
    } finally RestFetchers.unregister("tiny")
  }

  test("probed page bound is memoized across actions: one probe sequence per fetcher") {
    val calls = new AtomicInteger
    RestFetchers.register("memo") { (offset, pageSize) =>
      calls.incrementAndGet()
      Success(if (offset >= 50) Nil
      else (offset until math.min(offset + pageSize, 50)).map(i => s"r$i"))
    }
    try {
      val df = readRest("fetcher" -> "memo", "pageSize" -> "100",
        "maxPages" -> "1000", "pagesPerPartition" -> "8")
      assert(df.count() === 50)
      val afterFirst = calls.get()
      assert(df.count() === 50)
      assert(df.count() === 50)
      // each later action re-plans the scan (fresh Scan instance) but must
      // hit the memoized bound: exactly the ONE data-page read remains
      assert(calls.get() - afterFirst === 2,
        s"re-planning re-probed the API: ${calls.get() - afterFirst} calls for 2 actions")
    } finally RestFetchers.unregister("memo")
  }

  test("re-registering a fetcher name drops its memoized bound") {
    val calls = new AtomicInteger
    def reg(total: Int): Unit = RestFetchers.register("grow") { (offset, pageSize) =>
      calls.incrementAndGet()
      Success(if (offset >= total) Nil
      else (offset until math.min(offset + pageSize, total)).map(i => s"r$i"))
    }
    reg(50)
    try {
      val opts = Seq("fetcher" -> "grow", "pageSize" -> "10",
        "maxPages" -> "1000", "pagesPerPartition" -> "2")
      assert(readRest(opts: _*).count() === 50)
      reg(75) // the endpoint grew; re-registration is the same-JVM signal
      assert(readRest(opts: _*).count() === 75)
    } finally RestFetchers.unregister("grow")
  }

  test("a cache hit past its TTL revalidates: growth is seen within one cheap request") {
    val total = new AtomicInteger(20)
    val calls = new AtomicInteger
    RestFetchers.register("ttl") { (offset, pageSize) =>
      calls.incrementAndGet()
      val t = total.get()
      Success(if (offset >= t) Nil
      else (offset until math.min(offset + pageSize, t)).map(i => s"r$i"))
    }
    try {
      // probeTtlMs=0: every later planning treats the memo as stale and
      // runs the one-request last-page-still-short check
      val opts = Seq("fetcher" -> "ttl", "pageSize" -> "10", "maxPages" -> "100",
        "pagesPerPartition" -> "2", "probeTtlMs" -> "0")
      assert(readRest(opts: _*).count() === 20)
      total.set(45)
      // the probed last page is now full -> revalidation re-probes and the
      // new pages are planned, no re-registration, no probeCache=false
      assert(readRest(opts: _*).count() === 45)
      // a STILL-short endpoint revalidates without a re-probe: one check
      // request plus the 5 data pages (x2 if Spark re-plans), never the
      // full gallop sequence again
      val before = calls.get()
      assert(readRest(opts: _*).count() === 45)
      assert(calls.get() - before <= 8,
        s"still-short revalidation cost ${calls.get() - before} calls — looks like a re-probe")
    } finally RestFetchers.unregister("ttl")
  }

  test("growth proven but re-probe fails: full static planning, never the stale bound") {
    // Past the TTL the revalidation sees the old last page full (growth
    // PROVEN), then the re-probe hits a transient failure. Serving the
    // cached bound would silently truncate the result; the contract is
    // the cold probe-failure fallback — plan maxPages — and the fallback
    // is not cached, so the next planning re-probes.
    val total = new AtomicInteger(20)
    val failAt40Once = new AtomicInteger(0) // arm: fail the FIRST request at offset 40
    RestFetchers.register("growfail") { (offset, pageSize) =>
      if (offset == 40 && failAt40Once.getAndDecrement() > 0)
        Failure(new RuntimeException("http 429 (injected)"))
      else {
        val t = total.get()
        Success(if (offset >= t) Nil
        else (offset until math.min(offset + pageSize, t)).map(i => s"r$i"))
      }
    }
    try {
      val opts = Seq("fetcher" -> "growfail", "pageSize" -> "10", "maxPages" -> "8",
        "pagesPerPartition" -> "2", "probeTtlMs" -> "0")
      assert(readRest(opts: _*).count() === 20) // bound 3 cached
      total.set(45)
      failAt40Once.set(1)
      // revalidation: page 2 now full -> re-probe gallops 0,1,2,4 and the
      // offset-40 request fails -> fallback plans all 8 pages; the reader
      // that later hits offset 40 succeeds (the injection was one-shot)
      assert(readRest(opts: _*).count() === 45,
        "a proven-stale bound must fall back to static planning, not truncate")
    } finally RestFetchers.unregister("growfail")
  }

  test("invalidateClassBound forces a class-transport re-probe before the TTL") {
    // fetcherClass has no registry event to invalidate on: within the TTL
    // the memoized bound serves stale (documented), and the explicit hook
    // is the caller's signal that the endpoint changed NOW
    GrowableFetcher.total.set(20)
    val opts = Seq("fetcherClass" -> classOf[GrowableFetcher].getName,
      "pageSize" -> "10", "maxPages" -> "100", "pagesPerPartition" -> "2")
    graft.sources.RestSource.invalidateClassBound(classOf[GrowableFetcher].getName)
    assert(readRest(opts: _*).count() === 20) // bound 3 cached (page 2 empty)
    GrowableFetcher.total.set(35)
    // stale-within-TTL: the cached 3-page bound reads 10 of the 15 new rows
    assert(readRest(opts: _*).count() === 30)
    graft.sources.RestSource.invalidateClassBound(classOf[GrowableFetcher].getName)
    assert(readRest(opts: _*).count() === 35)
  }

  test("probeCache=false follows live data growth without re-registration") {
    val total = new AtomicInteger(20)
    RestFetchers.register("live") { (offset, pageSize) =>
      val t = total.get()
      Success(if (offset >= t) Nil
      else (offset until math.min(offset + pageSize, t)).map(i => s"r$i"))
    }
    try {
      val opts = Seq("fetcher" -> "live", "pageSize" -> "10", "maxPages" -> "100",
        "pagesPerPartition" -> "2", "probeCache" -> "false")
      assert(readRest(opts: _*).count() === 20)
      total.set(35)
      assert(readRest(opts: _*).count() === 35)
    } finally RestFetchers.unregister("live")
  }

  test("a failing page fails the task (all-or-nothing), unlike PagedFetch's partial keep") {
    RestFetchers.register("boom") { (offset, _) =>
      if (offset == 0) Success(Seq.fill(5)("row")) else Failure(new RuntimeException("http 500"))
    }
    try {
      val thrown = intercept[org.apache.spark.SparkException] {
        readRest("fetcher" -> "boom", "pageSize" -> "5",
          "maxPages" -> "4", "pagesPerPartition" -> "4").count()
      }
      assert(thrown.getMessage.contains("http 500") ||
        Option(thrown.getCause).exists(_.getMessage.contains("http 500")))
    } finally RestFetchers.unregister("boom")
  }

  test("fetcherClass path: reflective instantiation, rows flow into CasEtl's raw-json shape") {
    val df = readRest("fetcherClass" -> classOf[FixedPagesFetcher].getName,
      "pageSize" -> "10", "maxPages" -> "5", "pagesPerPartition" -> "2")
    val rows = df.orderBy("offset").collect()
    assert(rows.length === 25)
    assert(rows.head.getString(0) === """{"id":0}""")
    // the json column is CasEtl.sync's rawJson contract
    val parsed = spark.read.json(df.select("json").as[String])
    assert(parsed.count() === 25)
  }
}
