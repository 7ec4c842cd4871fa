package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.core.{Classify, Ranking}

/** Edge cases called out in SURVEY.md §5/§7.4 over hand-built micro
  * fixtures: tie-aware ranking, LEFT-JOIN ON-clause filter retention,
  * inclusive interval bounds, `>=` bucket boundaries.
  */
class RelationalSpec extends SparkTestBase {
  import spark.implicits._

  test("ranking a raw fact scan throws — the unpartitioned-window guard is code, not comment") {
    val facts = graft.core.Tables.lineitem(spark, sf())
      .withColumnRenamed("l_quantity", "score")
    val ex = intercept[IllegalArgumentException] {
      Ranking.rankWithNullsUnranked(facts, "score")
    }
    assert(ex.getMessage.contains("aggregated"))
    // aggregating to dim cardinality (or LIMIT-bounding) makes it legal
    val agg = facts.groupBy(col("l_returnflag")).agg(avg(col("score")).as("score"))
    assert(Ranking.rankWithNullsUnranked(agg, "score").count() > 0)
    assert(Ranking.rankWithNullsUnranked(facts.limit(20), "score").count() === 20)
    // a fact scan JOINED to an aggregated dim contains an Aggregate below
    // but still outputs fact cardinality — must be rejected (the guard
    // checks the root's cardinality, not mere Aggregate existence)
    val factJoin = facts.join(
      agg.select(col("l_returnflag"), col("score").as("dim_avg")), "l_returnflag")
    intercept[IllegalArgumentException] {
      Ranking.rankWithNullsUnranked(factJoin, "score")
    }
    // while a join of two AGGREGATED frames stays dim-bounded and passes
    // (the rankingGrupos rollup shape)
    val aggJoin = agg.join(
      agg.select(col("l_returnflag"), col("score").as("other")), "l_returnflag")
    assert(Ranking.rankWithNullsUnranked(aggJoin, "score").count() > 0)
  }

  test("W1 competition rank with ties: 90,90,80 -> 1,1,3") {
    val df = Seq(("a", Some(90.0)), ("b", Some(90.0)), ("c", Some(80.0)),
                 ("d", None: Option[Double]))
      .toDF("name", "score")
    val got = Ranking.rankWithNullsUnranked(df, "score")
      .orderBy(col("posicion").asc_nulls_last, col("name"))
      .select("name", "posicion")
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
    assert(got.toSeq === Seq(("a", 1), ("b", 1), ("c", 3), ("d", -1)))
  }

  test("J2 LEFT JOIN with filter in ON keeps unmatched left rows") {
    val groups = Seq((1, "g1"), (2, "g2")).toDF("gid", "gname")
    val subs = Seq((1, 10, true), (1, 11, false), (2, 20, false)).toDF("gid2", "sid", "active")
    val joined = groups
      .join(subs, groups("gid") === subs("gid2") && subs("active"), "left")
      .groupBy("gid").agg(count(col("sid")).as("n"))
      .orderBy("gid")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    // g2's only sub is inactive: g2 retained with count 0, not dropped
    assert(joined.toSeq === Seq((1, 1L), (2, 0L)))
  }

  test("J7 interval join: both endpoints inclusive") {
    val facts = Seq(("2024-01-01", 1), ("2024-01-31", 2), ("2024-02-01", 3))
      .toDF("d", "id").select(to_date(col("d")).as("d"), col("id"))
    val periods = Seq(("2024-01-01", "2024-01-31", "p1")).toDF("s", "e", "p")
      .select(to_date(col("s")).as("s"), to_date(col("e")).as("e"), col("p"))
    val assigned = facts.join(periods, col("d").between(col("s"), col("e")), "left")
      .orderBy("id").select("id", "p")
      .collect().map(r => (r.getInt(0), Option(r.getString(1)).getOrElse("-")))
    assert(assigned.toSeq === Seq((1, "p1"), (2, "p1"), (3, "-")))
  }

  test("T2 severity buckets: >= thresholds, exactly 90 -> excelente") {
    val df = Seq(Some(90.0), Some(89.999), Some(80.0), Some(70.0), Some(69.9), None)
      .toDF("score")
      .select(Classify.severity(col("score")).as("sev"))
    assert(df.collect().map(_.getString(0)).toSeq ===
      Seq("excelente", "bueno", "bueno", "regular", "critico", "sin_datos"))
  }

  test("T1 territory classifier is case-insensitive substring match") {
    val df = Seq("TEPEYAC Norte", "Grupo Saltillo", "Otro").toDF("nombre")
      .select(Classify.territory(col("nombre"),
        local = Seq("tepeyac"), foranea = Seq("saltillo")).as("t"))
    assert(df.collect().map(_.getString(0)).toSeq === Seq("local", "foranea", "mixto"))
  }

  test("T3 rollup key: first matching prefix wins, else own name") {
    val df = Seq("PLOG Norte", "PLOG Sur", "Solo").toDF("nombre")
      .select(Classify.rollupKey(col("nombre"), Map("PLOG" -> "GRUPO PLOG")).as("k"))
    assert(df.collect().map(_.getString(0)).toSeq ===
      Seq("GRUPO PLOG", "GRUPO PLOG", "Solo"))
  }

  test("q38 RANGE frame equals an independent self-join recompute (inclusive bounds)") {
    val e = graft.core.Tables.events(spark, sf())
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val win = 600L * 1000000000L
    val expected = e.as("a")
      .join(e.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.ts") >= col("a.ts") - win && col("b.ts") <= col("a.ts"))
      .groupBy(col("a.event_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = graft.queries.Relational.q38RangeWindow(spark, sf())
      .select("event_id", "n_10m")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected) // same frames, including the boundary event at exactly -10min
    assert(got.values.max > 1) // the window actually aggregates neighbors
  }

  test("A10 vs A11: average-of-averages differs from weighted average") {
    // periods with different fact counts: avg-of-avgs (50+100)/2 = 75,
    // weighted (50*1 + 100*3)/4 = 87.5
    val facts = Seq(("p1", 50.0), ("p2", 100.0), ("p2", 100.0), ("p2", 100.0))
      .toDF("period", "score")
    val perPeriod = facts.groupBy("period").agg(avg("score").as("a"))
    val aOfA = perPeriod.agg(avg("a")).first().getDouble(0)
    val weighted = facts.agg(avg("score")).first().getDouble(0)
    assert(aOfA === 75.0)
    assert(weighted === 87.5)
  }
}
