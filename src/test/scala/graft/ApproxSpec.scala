package graft

class ApproxSpec extends SparkTestBase {

  test("approx_count_distinct stays within its rsd bound on testdata") {
    val r = graft.queries.Relational.q29ApproxDistinct(spark, sf()).collect().head
    def relErr(exact: Long, approx: Long): Double =
      math.abs(approx - exact).toDouble / math.max(1L, exact)
    // rsd 0.02 -> generous 3-sigma bound
    assert(relErr(r.getAs[Long]("exact_parts"), r.getAs[Long]("approx_parts")) < 0.06)
    assert(relErr(r.getAs[Long]("exact_supps"), r.getAs[Long]("approx_supps")) < 0.06)
  }
}
