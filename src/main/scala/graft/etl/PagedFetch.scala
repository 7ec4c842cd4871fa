package graft.etl

import scala.annotation.tailrec
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S2 — the REST page-stream driver (reference `fetch_zenput`,
  * etl_sync.py:90-120): offset pagination with limit 100, stop on an empty
  * or short page, and the reference's failure contract — a failed fetch
  * logs and returns the rows accumulated so far (partial extract; the
  * checkpoint makes the next run pick up where this one stopped).
  *
  * The transport is injectable: the page fetcher owns its own HTTP
  * concerns (the reference uses a 30 s request timeout); this driver adds
  * bounded per-page retries on top. `maxRetries = 0` reproduces the
  * reference's break-on-first-error exactly.
  *
  * Pagination is inherently driver-side in both systems — the page stream
  * is a sequential protocol, and its volume (one incremental sync's worth
  * of JSON) is checkpoint-bounded, not corpus-scale. The cluster-parallel
  * work starts where the fetched frame enters [[CasEtl.sync]].
  */
object PagedFetch {

  val PageSize = 100

  /** `rows`: everything fetched before the stop; `complete`: false iff the
    * run ended on a fetch error rather than a short/empty page; `pages`:
    * pages that returned data.
    */
  final case class FetchResult(rows: Vector[String], complete: Boolean, pages: Int)

  def fetchAll(fetchPage: Int => Try[Seq[String]],
               pageSize: Int = PageSize,
               maxRetries: Int = 0): FetchResult = {
    @tailrec def attempt(offset: Int, retriesLeft: Int): Try[Seq[String]] =
      fetchPage(offset) match {
        case Failure(_) if retriesLeft > 0 => attempt(offset, retriesLeft - 1)
        case other => other
      }
    @tailrec def loop(offset: Int, acc: Vector[String], pages: Int): FetchResult =
      attempt(offset, maxRetries) match {
        case Failure(e) =>
          // reference behavior (etl_sync.py:115-118): log, keep the partial
          System.err.println(
            s"[graft.etl] page fetch failed at offset $offset after ${maxRetries + 1} attempt(s): ${e.getMessage}")
          FetchResult(acc, complete = false, pages)
        case Success(rows) if rows.isEmpty =>
          FetchResult(acc, complete = true, pages)
        case Success(rows) if rows.size < pageSize =>
          FetchResult(acc ++ rows, complete = true, pages + 1)
        case Success(rows) =>
          loop(offset + pageSize, acc ++ rows, pages + 1)
      }
    loop(0, Vector.empty, 0)
  }

  /** Fetched page stream → the raw-JSON frame [[CasEtl.sync]] consumes. */
  def toRawJson(s: SparkSession, rows: Seq[String]): DataFrame = {
    import s.implicits._
    rows.toDF("json")
  }
}
