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

  test("approx_percentile (q35's documented 100TB swap) stays within rank tolerance") {
    import org.apache.spark.sql.functions._
    // the swap SCALE.md promises for q35: prove the single-pass sketch's
    // error bound on the same column the exact query uses. accuracy a ⇒
    // rank error ≤ n/a; convert to a value-rank assertion, not a value
    // distance (percentile error is a rank guarantee)
    val acc = 1000
    val li = graft.core.Tables.lineitem(spark, sf())
    val n = li.count()
    val approx = li.agg(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(acc))).first().getDouble(0)
    val rankOfApprox = li.filter(col("l_extendedprice") <= approx).count()
    val tol = math.max(1L, n / acc) + 1
    assert(math.abs(rankOfApprox - n / 2) <= tol,
      s"approx median rank $rankOfApprox vs exact ${n / 2} (n=$n, tol=$tol)")
  }
}
