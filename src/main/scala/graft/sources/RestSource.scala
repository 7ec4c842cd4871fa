package graft.sources

import java.util

import scala.util.Try

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 for offset-paginated REST extraction — the S2 source
  * (reference `fetch_zenput`, etl_sync.py:90-120) as a first-class Spark
  * connector: `spark.read.format("graft.sources.RestSource")`.
  *
  * The reference fetches pages one at a time on a single thread. Offset
  * pagination is RANDOMLY ADDRESSABLE, so this source plans one input
  * partition per page-range and lets executors fetch in parallel —
  * `maxPages / pagesPerPartition` concurrent streams against the API
  * instead of one. A short or empty page ends that partition's stream
  * (exactly the reference's stop rule, applied per-range); ranges past
  * the end of the data return nothing. Output rows are
  * (json STRING, offset INT), so downstream dedup/ordering never depends
  * on fetch interleaving.
  *
  * Failure contract: a partition whose fetch errors fails the TASK, and
  * Spark's task retry re-fetches that page range (idempotent by offset).
  * This is all-or-nothing per Spark's execution model — the deliberate
  * contrast with [[graft.etl.PagedFetch]]'s sequential log-and-keep-
  * partial driver loop, which remains the faithful reproduction of the
  * reference's semantics; this source is the 1000-executor version.
  *
  * Transport injection: `fetcher` names an entry in [[RestFetchers]]
  * (same-JVM: tests, local mode); `fetcherClass` names a zero-arg
  * [[PageFetcher]] implementation instantiated reflectively ON EACH
  * EXECUTOR (cluster mode — the class carries its own HTTP config).
  *
  * Options: `fetcher` | `fetcherClass` (one required), `pageSize` (100),
  * `maxPages` (1000), `pagesPerPartition` (8), `probeCache` (true),
  * `probeTtlMs` (300000).
  *
  * Planning cost: Spark re-plans an UNCACHED scan on every action, so the
  * page-bound probe (see [[RestScan]]) is memoized JVM-wide per
  * (fetcher, pageSize, maxPages) — repeated actions re-use one probe
  * sequence instead of re-hitting a rate-limited API per action. The memo
  * is NOT trusted forever: a cache hit older than `probeTtlMs` pays ONE
  * revalidation request — "is the probed last page still short?" — and
  * re-probes only if the endpoint actually grew, so a long-lived driver
  * reading a growing dataset sees new pages within one TTL, for any
  * transport (`fetcher` and `fetcherClass` alike). Within the TTL a hit
  * costs zero requests. Immediate-consistency escape hatches:
  * `probeCache=false` plans a fresh probe per action; re-registering a
  * `fetcher` name drops its bound; for `fetcherClass` transports (which
  * have no registry event) call [[RestSource.invalidateClassBound]].
  * Independently of the probe, `.cache()` the DataFrame if the same
  * extraction feeds several actions — that also skips the re-fetch of the
  * data pages themselves.
  */
class RestSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = RestSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new RestTable(new CaseInsensitiveStringMap(properties))
}

object RestSource {
  val Schema: StructType = StructType(Seq(
    StructField("json", StringType, nullable = false),
    StructField("offset", IntegerType, nullable = false)))

  /** Drop any memoized page bound probed through `fetcherClass`. Class
    * transports have no registry (un)register event to invalidate on, so
    * a caller that KNOWS the endpoint changed (e.g. after triggering an
    * upstream load) can force the next planning to re-probe instead of
    * waiting out the TTL revalidation.
    */
  def invalidateClassBound(fetcherClass: String): Unit =
    RestScan.invalidateBound("class:" + fetcherClass)
}

/** Cluster-safe transport: implementations are zero-arg-constructible and
  * fetch one page of raw JSON rows at `offset` (size `pageSize`).
  */
trait PageFetcher extends Serializable {
  def fetch(offset: Int, pageSize: Int): Try[Seq[String]]
}

/** Same-JVM fetcher registry for tests and local mode. (Re)registering or
  * unregistering a name drops any memoized page bound for it — swapping
  * the fetcher behind a name is the same-JVM signal that the data behind
  * it changed.
  */
object RestFetchers {
  private val registry =
    scala.collection.concurrent.TrieMap.empty[String, (Int, Int) => Try[Seq[String]]]
  def register(name: String)(f: (Int, Int) => Try[Seq[String]]): Unit = {
    registry.put(name, f)
    RestScan.invalidateBound(s"name:$name")
  }
  def unregister(name: String): Unit = {
    registry.remove(name)
    RestScan.invalidateBound(s"name:$name")
  }
  private[sources] def get(name: String): (Int, Int) => Try[Seq[String]] =
    registry.getOrElse(name,
      throw new IllegalArgumentException(s"no registered REST fetcher named '$name'"))
}

private[sources] class RestTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_rest"
  override def schema(): StructType = RestSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // `properties` passed to getTable can lose the read options on some
    // paths; the ScanBuilder options are authoritative
    val opts = if (caseInsensitiveOptions.isEmpty) options else caseInsensitiveOptions
    () => new RestScan(opts)
  }
}

private[sources] class RestScan(options: CaseInsensitiveStringMap) extends Scan with Batch {
  private val pageSize = options.getInt("pageSize", 100)
  private val maxPages = options.getInt("maxPages", 1000)
  private val pagesPerPartition = options.getInt("pagesPerPartition", 8)
  private val probeCache = options.getBoolean("probeCache", true)
  private val probeTtlMs = options.getLong("probeTtlMs", 300000L)
  private val fetcherName = Option(options.get("fetcher"))
  private val fetcherClass = Option(options.get("fetcherClass"))
  require(fetcherName.isDefined || fetcherClass.isDefined,
    "RestSource requires option 'fetcher' (registry name) or 'fetcherClass' (PageFetcher impl)")
  require(pageSize > 0 && maxPages > 0 && pagesPerPartition > 0)

  private def fetcherKey: String =
    fetcherClass.map("class:" + _).getOrElse("name:" + fetcherName.get)

  override def readSchema(): StructType = RestSource.Schema
  override def toBatch: Batch = this

  /** Driver-side galloping probe for the real page count: without it,
    * every read plans `ceil(maxPages/pagesPerPartition)` ranges and each
    * range past the end of the data still burns one request discovering
    * it is empty — ~125 calls for a one-page tenant with the defaults,
    * against APIs that are typically rate-limited. Probing pages
    * 0,1,2,4,8,… until a short/empty page costs ≤ log2(maxPages)+2
    * requests (a short page bounds the data by the stop rule, so nothing
    * past it needs planning; readers re-fetch the probed pages — that
    * duplication is the log-sized price of the bound). A probe failure
    * (None) falls back to static full planning: flaky endpoints keep the
    * task-retry failure contract instead of failing at planning.
    */
  private def probedPageBound(): Option[Int] = {
    if (maxPages <= pagesPerPartition) return Some(maxPages)
    val fetch = RestTransport.resolve(fetcherName, fetcherClass)
    var j = 0
    while (j < maxPages) {
      fetch(j * pageSize, pageSize) match {
        case scala.util.Success(rows) if rows.size < pageSize =>
          return Some(math.min(j + 1, maxPages))
        case scala.util.Success(_) => j = math.max(1, j * 2)
        case scala.util.Failure(_) => return None
      }
    }
    Some(maxPages)
  }

  /** Cheap staleness check for a memoized bound: the probe ended because
    * page `bound - 1` came back short, so if that page is STILL short the
    * data cannot have grown past the bound — one request instead of a
    * re-probe. A full page means the endpoint grew: re-probe; if THAT
    * probe then fails transiently, the stale bound is now PROVEN
    * truncating, so the fallback is full static planning (the cold
    * probe-failure contract), never the stale bound — and the fallback is
    * not cached, so the next planning re-probes. A failed revalidation
    * request keeps the cached bound WITHOUT refreshing its stamp, so the
    * next planning retries instead of trusting a bound it couldn't check.
    * A bound at `maxPages` is the cap, not data-derived — nothing past it
    * would be planned anyway, so it revalidates trivially.
    */
  private sealed trait Revalidation
  private case class StillValid(bound: Int) extends Revalidation
  private case class GrownTo(bound: Int) extends Revalidation     // re-probed, cacheable
  private case object GrownProbeFailed extends Revalidation       // plan maxPages, do NOT cache
  private case object Unverifiable extends Revalidation           // keep stale, retry next pass

  private def revalidatedBound(cached: Int): Revalidation = {
    if (cached >= maxPages) return StillValid(cached)
    val fetch = RestTransport.resolve(fetcherName, fetcherClass)
    fetch((cached - 1) * pageSize, pageSize) match {
      case scala.util.Success(rows) if rows.size < pageSize => StillValid(cached)
      case scala.util.Success(_) =>
        (try probedPageBound() catch { case scala.util.control.NonFatal(_) => None })
          .map(GrownTo(_)).getOrElse(GrownProbeFailed)
      case scala.util.Failure(_) => Unverifiable
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // Spark builds a FRESH Scan per action on an uncached plan, so the
    // probed bound memoizes JVM-wide (keyed by fetcher + pageSize +
    // maxPages, the inputs the probe depends on), not per instance.
    // Only successful probes are cached — a flaky planning probe must not
    // pin full static planning forever. A hit past its TTL pays the
    // one-request revalidation above before being trusted.
    val key = (fetcherKey, pageSize, maxPages)
    def freshProbe(): Int = {
      val probed = try probedPageBound()
                   catch { case scala.util.control.NonFatal(_) => None }
      if (probeCache) probed.foreach(RestScan.cacheBound(key, _))
      probed.getOrElse(maxPages)
    }
    val bound = (if (probeCache) RestScan.cachedBound(key) else None) match {
      case Some((b, ageMs)) if ageMs <= probeTtlMs => b
      case Some((b, _)) =>
        revalidatedBound(b) match {
          case StillValid(nb)   => RestScan.cacheBound(key, nb); nb
          case GrownTo(nb)      => RestScan.cacheBound(key, nb); nb
          case GrownProbeFailed => maxPages // proven stale: full static planning, uncached
          case Unverifiable     => b // stale stamp retries next planning
        }
      case None => freshProbe()
    }
    val nParts = math.max(1, math.ceil(bound.toDouble / pagesPerPartition).toInt)
    Array.tabulate(nParts) { i =>
      RestRange(i * pagesPerPartition, math.min((i + 1) * pagesPerPartition, bound),
        pageSize, fetcherName, fetcherClass)
    }
  }
  override def createReaderFactory(): PartitionReaderFactory = new RestReaderFactory
}

private[sources] object RestScan {
  private val boundCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Int), (Int, Long)]
  /** The memoized bound plus its age in ms (monotonic clock). */
  private[sources] def cachedBound(key: (String, Int, Int)): Option[(Int, Long)] =
    boundCache.get(key).map { case (b, at) =>
      (b, (System.nanoTime() - at) / 1000000L)
    }
  private[sources] def cacheBound(key: (String, Int, Int), bound: Int): Unit =
    boundCache.put(key, (bound, System.nanoTime()))
  /** Drop every memoized bound for one fetcher (any pageSize/maxPages). */
  private[sources] def invalidateBound(fetcherKey: String): Unit =
    boundCache.keys.filter(_._1 == fetcherKey).foreach(boundCache.remove)
}

/** Shared transport resolution for the planner's probe and the executor
  * readers: registry name (same JVM) or reflective zero-arg class.
  */
private[sources] object RestTransport {
  def resolve(fetcherName: Option[String],
              fetcherClass: Option[String]): (Int, Int) => Try[Seq[String]] =
    fetcherClass match {
      case Some(cls) =>
        val f = Class.forName(cls).getDeclaredConstructor()
          .newInstance().asInstanceOf[PageFetcher]
        (off, ps) => f.fetch(off, ps)
      case None => RestFetchers.get(fetcherName.get)
    }
}

private[sources] case class RestRange(pageFrom: Int, pageUntil: Int, pageSize: Int,
                                      fetcherName: Option[String],
                                      fetcherClass: Option[String]) extends InputPartition

private[sources] class RestReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new RestReader(partition.asInstanceOf[RestRange])
}

private[sources] class RestReader(range: RestRange) extends PartitionReader[InternalRow] {
  private val fetch: (Int, Int) => Try[Seq[String]] =
    RestTransport.resolve(range.fetcherName, range.fetcherClass)

  private var page = range.pageFrom
  private var exhausted = false
  private var rows: Iterator[(String, Int)] = Iterator.empty
  private var current: (String, Int) = _

  private def advancePage(): Boolean = {
    if (exhausted || page >= range.pageUntil) return false
    val offset = page * range.pageSize
    val fetched = fetch(offset, range.pageSize).get // throw → task fails → Spark retries
    page += 1
    if (fetched.size < range.pageSize) exhausted = true // reference stop rule
    rows = fetched.iterator.zipWithIndex.map { case (j, i) => (j, offset + i) }
    fetched.nonEmpty || advancePage()
  }

  override def next(): Boolean = {
    while (!rows.hasNext) if (!advancePage()) return false
    current = rows.next()
    true
  }

  override def get(): InternalRow =
    InternalRow(UTF8String.fromString(current._1), current._2)

  override def close(): Unit = ()
}
