package graft

/** Every registered query runs end-to-end at sf0.001 and the flagship
  * entry returns rows (the driver's t1 contract).
  */
class SmokeSpec extends SparkTestBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf())
      assert(df.columns.nonEmpty)
      df.count() // materialize the whole plan
    }
  }
}
