package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextOps

/** The env-dial parse/validation layer (round-15 ADVICE): malformed
  * values fail with the dial's NAME, below-minimum values clamp to the
  * stated floor — no bare NumberFormatException, no zero budget reaching
  * the slice-count division.
  */
class DialSpec extends AnyFunSuite {

  test("numeric values parse, with surrounding whitespace") {
    assert(TextOps.parseDial("X", "42", 1) === 42L)
    assert(TextOps.parseDial("X", "  1024 ", 1) === 1024L)
    assert(TextOps.parseDial("X", "-3", Long.MinValue) === -3L)
  }

  test("non-numeric input fails with the dial's name and the raw value") {
    val e = intercept[IllegalArgumentException] {
      TextOps.parseDial("SPARK_GRAFT_PROBE_BC_MB", "lots", 1)
    }
    assert(e.getMessage.contains("SPARK_GRAFT_PROBE_BC_MB"))
    assert(e.getMessage.contains("lots"))
  }

  test("below-minimum values clamp to the floor (zero/negative budget, par)") {
    // the cases the advice named: a 0 MB probe budget divided the slice
    // count by zero; slicePar <= 0 logged par=0 while dispatching 1
    assert(TextOps.parseDial("SPARK_GRAFT_PROBE_BC_MB", "0", 1) === 1L)
    assert(TextOps.parseDial("SPARK_GRAFT_PROBE_BC_MB", "-5", 1) === 1L)
    assert(TextOps.parseDial("SPARK_GRAFT_PROBE_SLICE_PAR", "0", 1) === 1L)
    assert(TextOps.parseDial("SPARK_GRAFT_BAND_RADIUS", "-1", 0) === 0L)
  }

  test("above-maximum values clamp loudly instead of wrapping (round-16 ADVICE)") {
    // an Int dial parsed as Long used to TRUNCATE: 2^32 wrapped to 0
    // through .toInt, silently defeating the loud-validation layer
    assert(TextOps.clampDialMax("SPARK_GRAFT_LSH_RADIUS", 4294967296L,
      Int.MaxValue) === Int.MaxValue.toLong)
    // in-range values pass through untouched
    assert(TextOps.clampDialMax("X", 42L, Int.MaxValue) === 42L)
    assert(TextOps.clampDialMax("X", Int.MaxValue.toLong, Int.MaxValue) ===
      Int.MaxValue.toLong)
  }

  test("probe-budget MB cap keeps the byte shift inside Long (round-16 ADVICE)") {
    // the dial converts MB -> bytes with << 20; an absurd MB value past
    // 2^43 used to overflow Long. The stated cap itself must shift clean.
    assert(TextOps.MaxProbeBcMb << 20 > 0L)
    assert(TextOps.clampDialMax("SPARK_GRAFT_PROBE_BC_MB",
      Long.MaxValue >> 2, TextOps.MaxProbeBcMb) === TextOps.MaxProbeBcMb)
  }
}
