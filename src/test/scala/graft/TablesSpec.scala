package graft

/** The source-layer contracts that don't belong to any one query: the
  * events NTZ read's zone handling (cast(NTZ → timestamp) interprets
  * wall-clock in the SESSION zone, so Tables.events pins UTC — scoped to
  * the read, not leaked into the caller's session).
  */
class TablesSpec extends SparkTestBase {

  test("events() NTZ read preserves a non-UTC session zone AND reads zone-invariant nanos") {
    val sfDir = sf()
    def nanosOf(): Map[Long, Long] =
      graft.core.Tables.events(spark, sfDir).select("event_id", "ts")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val underUtc = nanosOf()
    assert(underUtc.nonEmpty)
    val prior = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/Mexico_City")
      val df = graft.core.Tables.events(spark, sfDir)
      // the pin is scoped: an embedding application with a deliberately
      // non-UTC session keeps its zone after the read
      assert(spark.conf.get("spark.sql.session.timeZone") === "America/Mexico_City",
        "events() leaked its UTC pin into the session")
      // ...and the UTC interpretation is bound into the returned plan at
      // analysis time, so EXECUTING under the non-UTC session still
      // yields the same instants (a -6h zone would shift every ts by
      // 21.6e12 ns if the cast re-read the session zone at run time)
      val underMx = df.select("event_id", "ts")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(underMx === underUtc, "NTZ cast drifted with the session zone")
    } finally spark.conf.set("spark.sql.session.timeZone", prior)
  }
}
