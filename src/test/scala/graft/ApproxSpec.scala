package graft

class ApproxSpec extends SparkTestBase {

  test("approx_count_distinct stays within its rsd bound on testdata") {
    // q29's public output is the exact counts plus the driver-checkable
    // within-5% flags; the flags themselves are the rsd assertion (the
    // sketch runs at rsd 0.02, so 5% is a generous >2-sigma bound)
    val r = graft.queries.Relational.q29ApproxDistinct(spark, sf()).collect().head
    assert(r.getAs[Long]("exact_parts") > 0)
    assert(r.getAs[Long]("exact_supps") > 0)
    assert(r.getAs[Boolean]("approx_parts_within_5pct"))
    assert(r.getAs[Boolean]("approx_supps_within_5pct"))
  }
}
