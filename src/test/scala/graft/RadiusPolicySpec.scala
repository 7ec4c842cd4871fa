package graft

import org.apache.spark.sql.functions._

import graft.queries.{Lsh, TextOps}
import graft.tools.ScaleData

/** The scale-safe probe-radius policy ([[Lsh.radiusFor]]) — the round-11
  * verdict's one open `weak`: at the production `bitsFor` dial a
  * hand-held radius 4 compounds C(bits, 4) ≈ bits⁴/24 masks across
  * decades (386 at bits=10 → 1093 at 13 — the measured 9-13×/decade²
  * term in t40/t42/t43). The policy holds the Hamming-ball mask count
  * under a fixed budget by stepping the radius down as codes widen, so
  * the DEFAULT dial path (bits from `bitsFor`, radius left to policy)
  * has a ~flat probe fan-out at any corpus size. These tests pin the
  * policy's arithmetic, its identity at the audited test dials, the
  * fail-fast guard on pathological manual dials, and the recall it
  * serves at the second-decade (bits, radius) pair on clustered
  * geometry — the regime the step-down actually runs in.
  */
class RadiusPolicySpec extends SparkTestBase {

  test("maskCount equals the enumerated mask count") {
    for ((bits, radius) <- Seq((6, 4), (10, 4), (13, 3), (14, 3), (15, 2), (30, 2), (6, 0)))
      assert(Lsh.maskCount(bits, radius) === Lsh.masksWithin(radius, bits).size.toLong,
        s"($bits, $radius)")
  }

  test("radiusFor: identity at the audited dials, steps down exactly where SCALE.md prescribes") {
    // the audited test dials are untouched: policy == the hand-held 4
    assert(Lsh.radiusFor(6) === 4)   // 57 masks — the default corpus dial
    assert(Lsh.radiusFor(10) === 4)  // 386 masks — the sf1.0 rehearsal dial
    // the second decade's bitsFor(200k/32)=13 steps to 3 (1093 -> 378
    // masks): the round-11 diagnosis, now the default instead of a note
    assert(Lsh.radiusFor(13) === 3)
    assert(Lsh.radiusFor(14) === 3)
    // wide codes settle at 2 — C(30, <=2) = 466 still under budget
    assert(Lsh.radiusFor(15) === 2)
    assert(Lsh.radiusFor(30) === 2)
    // the ANN probe family's base-3 policy: identity at the test dial
    assert(Lsh.radiusFor(6, base = 3) === 3)
    assert(Lsh.radiusFor(13, base = 3) === 3)
    assert(Lsh.radiusFor(16, base = 3) === 2) // C(16, <=3) = 697 > 512
  }

  test("radiusFor holds the mask budget at every constructible width") {
    for (bits <- 1 to Lsh.MaxBits) {
      val r = Lsh.radiusFor(bits)
      assert(Lsh.maskCount(bits, r) <= Lsh.MaskBudget, s"bits=$bits r=$r")
      // the policy is maximal: one radius wider busts the budget (or is
      // already the base)
      if (r < 4)
        assert(Lsh.maskCount(bits, r + 1) > Lsh.MaskBudget, s"bits=$bits r=$r not maximal")
    }
  }

  test("masksWithin fails fast past the hard cap instead of stalling planning") {
    // C(19, <=4) = 5036 > 4096: the manual wide-bits radius-4 corner the
    // round-11 advice flagged must be an immediate error, not a codegen
    // blowup discovered at plan time
    val e = intercept[IllegalArgumentException](Lsh.masksWithin(4, 19))
    assert(e.getMessage.contains("radiusFor"))
    // the widest dial the decade tables measured still constructs
    assert(Lsh.masksWithin(4, 16).size === 2517)
  }

  test("resolveRadius: sentinel takes the policy, an explicit radius wins") {
    assert(Lsh.resolveRadius(13, Lsh.PolicyRadius, base = 4) === 3)
    assert(Lsh.resolveRadius(13, 4, base = 4) === 4)
    assert(Lsh.resolveRadius(6, Lsh.PolicyRadius, base = 4) === 4)
  }

  test("t15 policy default reproduces the explicit audited dial at test bits") {
    val byPolicy = TextOps.t15CosineNearDup(spark, sf())
      .collect().map(_.toSeq).toSeq
    val explicit = TextOps.t15CosineNearDup(spark, sf(), Lsh.Bits, TextOps.PairRadius)
      .collect().map(_.toSeq).toSeq
    assert(byPolicy === explicit)
  }

  test("t15 recall at the policy's second-decade dial (bits=13, radius=3) on clustered geometry") {
    import graft.functions.{VectorOps => V}
    // the geometry the step-down runs in: real near-dup mass (clustered,
    // pair cosine ~0.9 — genuine duplicates), not the isotropic worst
    // case. Per-bit flip prob for a qualifying pair is theta/pi of its
    // cosine (~0.14 at 0.9), so a radius-3 ball over 13 bits covers the
    // pair distribution; at noise wide enough that tau=0.4 survivors are
    // near-boundary pairs (flip prob ~0.37) NO bounded radius can — that
    // regime needs the cosine threshold, not the probe radius, revisited
    val emb = ScaleData.clusteredEmbeddings(spark, 2000, nCenters = 40, noise = 0.04)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val e = emb.select(col("vec_id"), V.toDouble(col("embedding")).as("emb"))
    val exact = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .filter(round(V.cosine(col("a.emb"), col("b.emb")), 6) >= TextOps.CosTau)
      .select(col("a.vec_id"), col("b.vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bits = 13
    assert(Lsh.radiusFor(bits) === 3)
    val got = TextOps.t15CosineNearDupOf(emb, bits, Lsh.PolicyRadius)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact)) // exact-cosine verify admits no false positives
    val recall = (exact intersect got).size.toDouble / exact.size
    info(f"policy-dial pair recall: $recall%.3f over ${exact.size} exact pairs " +
      f"(${Lsh.maskCount(bits, Lsh.radiusFor(bits))} masks vs " +
      f"${Lsh.maskCount(bits, 4)} at the hand-held radius 4)")
    assert(recall >= 0.8)
  }
}
