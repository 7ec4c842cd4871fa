package graft

import org.apache.spark.sql.functions._

import graft.queries.{Lsh, TextOps}
import graft.tools.ScaleData

/** The banded (OR-amplification) near-dup family (t54) — the round-13
  * answer to the measured explode-domination of the single-table
  * Hamming-ball probe: L independent sign-bit tables over disjoint
  * plane windows, OR'd, with the table count sized by the closed-form
  * recall-floor policy [[Lsh.bandTablesFor]]. These tests pin the
  * policy arithmetic, the plane-window family's compatibility with the
  * single-table family, the tables=1 equivalence (t54 generalizes t15),
  * exact-verify soundness + recall on clustered geometry, and the
  * pinned join strategy.
  */
class BandedLshSpec extends SparkTestBase {

  test("bandTablesFor: closed-form recall-floor policy arithmetic") {
    // reference: smallest L with 1-(1-perBand)^L >= floor
    def ref(bits: Int, radius: Int): Int = {
      val p = Lsh.BandFlipP
      def choose(n: Int, k: Int): Double =
        (1 to k).foldLeft(1.0)((a, i) => a * (n - i + 1) / i)
      val per = (0 to radius).map(k =>
        choose(bits, k) * math.pow(p, k) * math.pow(1 - p, bits - k)).sum
      (1 to 64).find(l => 1 - math.pow(1 - per, l) >= Lsh.BandRecallFloor).get
    }
    for (bits <- Seq(6, 10, 12, 15, 18); radius <- Seq(1);
         bitsR0 <- Seq(6, 10, 12)) {
      assert(Lsh.bandTablesFor(bits, radius) === ref(bits, radius), s"($bits, $radius)")
      assert(Lsh.bandTablesFor(bitsR0, 0) === ref(bitsR0, 0), s"($bitsR0, 0)")
    }
    // pure banding (radius 0) at wide codes needs L x bits beyond the
    // plane pool (23 x 15 = 345 > 256) — the dial fails fast, the same
    // contract as masksWithin's hard cap; radius-1 dials stay in-pool
    // through bits 18 (9 x 18 = 162)
    intercept[IllegalArgumentException](Lsh.bandTablesFor(15, 0))
    // the measured anchors: band4:12:1 (the probe's winning dial) and the
    // second-decade width
    assert(Lsh.bandTablesFor(12, 1) === 4)
    assert(Lsh.bandTablesFor(15, 1) === 6)
    // pure banding needs more tables — the radius-1 in-band probe is
    // cheaper per unit recall at these widths
    assert(Lsh.bandTablesFor(12, 0) === 14)
    // wider codes need more tables (monotone in bits at fixed radius)
    val ls = Seq(8, 10, 12, 14, 16).map(Lsh.bandTablesFor(_, 1))
    assert(ls === ls.sorted)
  }

  test("planesForTable: disjoint windows, table 0 == the single-table family") {
    assert(Lsh.planesForTable(0, 12) === Lsh.planesFor(12))
    assert(Lsh.planesForTable(0, 30) === Lsh.planesFor(30))
    // pool prefix is bit-identical to the audited single-table planes
    assert(Lsh.allPlanesPool.take(Lsh.MaxBits) === Lsh.allPlanes)
    // windows tile the pool without overlap
    val w0 = Lsh.planesForTable(0, 12)
    val w1 = Lsh.planesForTable(1, 12)
    assert(Lsh.allPlanesPool.slice(12, 24) === w1)
    assert(w0 !== w1)
    // out-of-pool dials fail fast
    intercept[IllegalArgumentException](Lsh.planesForTable(21, 12)) // 22*12 > 256
  }

  test("bucketsOfTables (native one-pass kernel) == per-table when-chain reference, edge cases included") {
    import spark.implicits._
    import graft.functions.{VectorOps => V}
    val (tT, tB) = (4, 13)
    // real corpus vectors through BOTH formulations — interpreted eval
    // and whole-stage codegen paths both land here
    val e = graft.core.Tables.embeddings(spark, sf())
      .select(col("vec_id"), V.toDouble(col("embedding")).as("emb"))
    val both = e.select(col("vec_id"),
        Lsh.bucketsOfTables(col("emb"), tB, tT).as("native"),
        array((0 until tT).map(t => Lsh.bucketOfTable(col("emb"), tB, t)): _*).as("ref"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"vec ${r.getLong(0)}")
    }
    // single-table code == the when-chain reference
    val single = e.select(Lsh.bucketOf(col("emb"), tB).as("native"),
      Lsh.bucketOfRef(col("emb"), tB).as("ref")).collect()
    assert(single.forall(r => r.getLong(0) === r.getLong(1)))
    // edge cases, matching the reference's when(null > 0, _).otherwise(0)
    // semantics: null array, wrong dimension, null element -> all-zero
    // codes, row KEPT (not a null array that posexplode would drop)
    val edges = Seq(
      (1L, null.asInstanceOf[Array[java.lang.Double]]),
      (2L, Array[java.lang.Double](1.0, 2.0, 3.0)), // dim != Lsh.Dim
      (3L, (Array.fill[java.lang.Double](Lsh.Dim - 1)(1.0) :+
        null.asInstanceOf[java.lang.Double]))
    ).toDF("vec_id", "emb")
    val edgeRows = edges.select(col("vec_id"),
      Lsh.bucketsOfTables(col("emb"), tB, tT).as("native")).collect()
    assert(edgeRows.length === 3)
    edgeRows.foreach { r =>
      assert(r.getSeq[Long](1) === Seq.fill(tT)(0L), s"edge vec ${r.getLong(0)}")
    }
  }

  test("t54 with tables=1 reproduces the single-table t15 at the same (bits, radius)") {
    val t15 = TextOps.t15CosineNearDup(spark, sf(), Lsh.Bits, 2)
      .collect().map(_.toSeq).toSeq
    val t54 = TextOps.t54NearDupBandedOf(
        graft.core.Tables.embeddings(spark, sf()), tables = 1, bits = Lsh.Bits, radius = 2)
      .collect().map(_.toSeq).toSeq
    assert(t54 === t15)
  }

  test("t54 default dial == explicit dial (the registered query is the policy)") {
    val byDefault = TextOps.t54NearDupBanded(spark, sf()).collect().map(_.toSeq).toSeq
    val explicit = TextOps.t54NearDupBandedOf(graft.core.Tables.embeddings(spark, sf()),
      TextOps.DialBandTables, TextOps.DialBandBits, TextOps.DialBandRadius)
      .collect().map(_.toSeq).toSeq
    assert(byDefault === explicit)
  }

  test("t54 on clustered geometry: sound (subset of exact) and recall >= 0.9 on genuine dups at band4:12:1") {
    import graft.functions.{VectorOps => V}
    val emb = ScaleData.clusteredEmbeddings(spark, 2000, nCenters = 40, noise = 0.04)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val e = emb.select(col("vec_id"), V.toDouble(col("embedding")).as("emb"))
    val exact = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", round(V.cosine(col("a.emb"), col("b.emb")), 6))
      .filter(col("cos") >= TextOps.CosTau)
      .select(col("a.vec_id"), col("b.vec_id"), col("cos")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val got = TextOps.t54NearDupBandedOf(emb, tables = 4, bits = 12, radius = 1)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact.keySet))
    val dup = exact.toSeq.collect { case (p, c) if c >= 0.8 => p }
    val recallDup = dup.count(got).toDouble / dup.size
    val recallAll = exact.keysIterator.count(got).toDouble / exact.size
    info(f"band4:12:1 recall: $recallDup%.3f on ${dup.size} genuine-dup pairs, " +
      f"$recallAll%.3f overall — fanout 52 vs the (15, 3) single table's 576")
    // the policy's design floor (BandRecallFloor = 0.9), measured 0.931:
    // HIGHER recall than the 576-mask single-table dial at 11x less fan-out
    assert(recallDup >= 0.9)
  }

  test("direct t54 construction: candidate join pinned shuffle-hash; exploded probe side never broadcasts") {
    // sparkPlan (pre-AQE), the same hook PlanShapeSpec uses: strategy
    // picks are visible before adaptive re-planning wraps them.
    // Target is the DIRECT construction (t54NearDupBandedOf), the
    // reference implementation whose exploded candidate set must not
    // broadcast; since round 17 the registered t54 query routes through
    // the slim sliced self-probe, whose opposite shape is pinned below.
    val plan = TextOps.t54NearDupBandedOf(graft.core.Tables.embeddings(spark, sf()),
        TextOps.DialBandTables, TextOps.DialBandBits, TextOps.DialBandRadius)
      .queryExecution.sparkPlan
    def nodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: p.children.flatMap(nodes)
    val all = nodes(plan)
    assert(all.exists(_.isInstanceOf[org.apache.spark.sql.execution.joins.ShuffledHashJoinExec]),
      s"expected a pinned ShuffledHashJoin in:\n$plan")
    val bcJoins = all.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    // the only legitimate broadcast is the tiny oversized-bucket anti-join
    assert(bcJoins.forall(_.joinType.toString.contains("LeftAnti")),
      s"exploded probe side must not broadcast:\n$plan")
  }

  test("routed t54 (self-probe): no vector payload ever crosses an exchange") {
    // The registered query's invariant is the probe family's: candidates
    // never shuffle — slim probe rows and per-slice vectors broadcast,
    // the frame's cut streams, and every Exchange carries only slim
    // columns (pair ids, counts, cosines). A vector-typed column crossing
    // an exchange would reintroduce the payload shuffle that ENOSPC'd the
    // round-17 3M-vector seed.
    val plan = TextOps.t54NearDupBanded(spark, sf()).queryExecution.sparkPlan
    def nodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: p.children.flatMap(nodes)
    val exchanges = nodes(plan).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    exchanges.foreach { e =>
      val wide = e.output.filter(_.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
      assert(wide.isEmpty,
        s"exchange carries vector payload ${wide.map(_.name).mkString(",")} in:\n$plan")
    }
  }
}
