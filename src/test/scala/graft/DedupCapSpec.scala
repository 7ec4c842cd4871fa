package graft

import graft.queries.TextOps

/** Band-bucket caps on both near-dup candidate generators: a boilerplate
  * corpus (thousands of identical docs) must NOT go quadratic in one
  * bucket — oversized buckets are dropped, genuine near-dups in normal
  * buckets still pair.
  */
class DedupCapSpec extends SparkTestBase {
  import spark.implicits._

  private val boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor"
  // an identical pair: guaranteed to collide under both generators, so the
  // tests stay about cap semantics, not near-dup sensitivity
  private val realA = "the quick brown fox jumps over the lazy dog and keeps on running far away today"
  private val realB = realA

  private def corpus(nBoiler: Int) =
    ((1 to nBoiler).map(i => (i.toLong, boiler)) ++
      Seq((100001L, realA), (100002L, realB))).toDF("doc_id", "text")

  test("t06 minhash pairs: oversized band buckets are dropped, not joined") {
    val docs = corpus(50)
    // cap 10 << 50 identical docs: the boilerplate bucket must vanish;
    // without the cap the same corpus yields 50*49/2 boilerplate pairs
    val capped = TextOps.minhashPairsOf(docs, maxBucket = 10).collect()
    assert(capped.forall(r => r.getLong(0) >= 100001L),
      "no boilerplate pair may survive the cap")
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((100001L, 100002L)),
      "the genuine near-dup pair must still be found")
    val uncapped = TextOps.minhashPairsOf(docs).count()
    assert(uncapped === 50L * 49 / 2 + 1, "sanity: uncapped corpus is quadratic")
  }

  test("t07 simhash pairs: oversized band buckets are dropped, not joined") {
    val docs = corpus(50)
    val capped = TextOps.simhashPairsOf(docs, maxBucket = 10).collect()
    assert(capped.forall(r => r.getLong(0) >= 100001L))
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((100001L, 100002L)),
      "the genuine near-dup pair must still be found")
    val uncapped = TextOps.simhashPairsOf(docs).count()
    assert(uncapped === 50L * 49 / 2 + 1, "sanity: uncapped corpus is quadratic")
  }
}
