package graft

import java.sql.DriverManager

import graft.core.Tables

/** S1's JDBC mapping (reference app.py:24-27) over embedded Derby — the
  * only JDBC engine in the sandbox's Spark distribution. Pins the schema
  * contract (same frame shape as the parquet readers), the partitioned
  * read's slice count, and that the range predicate actually reaches the
  * remote query (every row lands in exactly one slice — no dup, no drop).
  */
class JdbcSourceSpec extends SparkTestBase {

  private val url = "jdbc:derby:memory:graft_jdbc;create=true"

  private lazy val derbyUp: Boolean =
    try {
      // derby's embedded driver self-registers on load
      Class.forName("org.apache.derby.iapi.jdbc.AutoloadedDriver")
      val c = DriverManager.getConnection(url)
      val st = c.createStatement()
      st.executeUpdate(
        "CREATE TABLE region_j (r_regionkey BIGINT NOT NULL, r_name VARCHAR(32))")
      (0 until 5).foreach(i =>
        st.executeUpdate(s"INSERT INTO region_j VALUES ($i, 'REGION_$i')"))
      st.close(); c.close()
      true
    } catch { case _: Throwable => false }

  private def assumeDerby(): Unit =
    assume(derbyUp, "embedded Derby JDBC driver not available in this environment")

  test("readJdbc: unpartitioned read serves the declared schema and rows") {
    assumeDerby()
    val df = Tables.readJdbc(spark, url, "region_j")
    assert(df.columns.map(_.toLowerCase).toSeq === Seq("r_regionkey", "r_name"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows === (0 until 5).map(i => i.toLong -> s"REGION_$i").toMap)
  }

  test("readJdbc: range-partitioned read slices into N parallel queries, no dup/no drop") {
    assumeDerby()
    val df = Tables.readJdbc(spark, url, "region_j",
      partition = Some(("r_regionkey", 0L, 5L, 3)))
    assert(df.rdd.getNumPartitions === 3, "bounds did not produce 3 slices")
    // the slices partition the table exactly: union of slices == table
    assert(df.select("r_regionkey").collect().map(_.getLong(0)).sorted.toSeq ===
      (0L until 5L).toSeq)
  }
}
