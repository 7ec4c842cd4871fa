package graft

import org.apache.spark.sql.functions._

import graft.etl.Upsert

class UpsertSpec extends SparkTestBase {
  import spark.implicits._

  private val existing = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "v")
  private val incoming = Seq((2L, "B2", 99.0), (3L, "c", 30.0)).toDF("id", "name", "v")

  test("merge: incoming wins on conflict, inserts the rest") {
    val got = Upsert.merge(existing, incoming, "id")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, "a", 10.0), (2L, "B2", 99.0), (3L, "c", 30.0)))
  }

  test("insertIfAbsent: existing wins on conflict") {
    val got = Upsert.insertIfAbsent(existing, incoming, "id")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
  }

  test("merge is idempotent") {
    val once = Upsert.merge(existing, incoming, "id")
    val twice = Upsert.merge(once, incoming, "id")
    assert(once.orderBy("id").collect().toSeq === twice.orderBy("id").collect().toSeq)
  }

  test("patchColumn: only predicated cells change") {
    val target = Seq((1L, 0.0), (2L, 50.0), (3L, 0.0)).toDF("id", "score")
    val patches = Seq((1L, 88.0), (2L, 77.0)).toDF("id", "score")
    val got = Upsert.patchColumn(target, patches, "id", "score",
        onlyWhere = col("score") === 0.0)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    // id=2 not patched (score nonzero); id=3 has no patch value
    assert(got.toSeq === Seq((1L, 88.0), (2L, 50.0), (3L, 0.0)))
  }

  test("duplicate incoming keys never fan out the target") {
    val dup = Seq((2L, "B2", 99.0), (2L, "B3", 98.0), (3L, "c", 30.0))
      .toDF("id", "name", "v")
    val merged = Upsert.merge(existing, dup, "id")
    assert(merged.count() === 3)
    assert(merged.groupBy("id").count().filter(col("count") > 1).count() === 0)
    val inserted = Upsert.insertIfAbsent(existing, dup, "id")
    assert(inserted.count() === 3)
    // prefer: highest v wins deterministically
    val got = Upsert.merge(existing, dup, "id", prefer = Seq(col("v").desc))
      .filter(col("id") === 2L).collect().head
    assert((got.getString(1), got.getDouble(2)) === ("B2", 99.0))
  }

  test("patchColumn with duplicate patch keys preserves target row count") {
    val target = Seq((1L, 0.0), (2L, 0.0)).toDF("id", "score")
    val patches = Seq((1L, 88.0), (1L, 77.0)).toDF("id", "score")
    val got = Upsert.patchColumn(target, patches, "id", "score",
      onlyWhere = col("score") === 0.0, prefer = Seq(col("score").desc))
    assert(got.count() === 2)
    assert(got.filter(col("id") === 1L).collect().head.getDouble(1) === 88.0)
  }

  test("no-prefer dedup picks the same winner under any partitioning/order") {
    val rows = Seq((5L, "x", 1.0), (5L, "y", 2.0), (5L, "a", 3.0), (6L, "q", 9.0))
    val variants = Seq(
      rows.toDF("id", "name", "v").repartition(1),
      rows.reverse.toDF("id", "name", "v").repartition(7),
      scala.util.Random.shuffle(rows).toDF("id", "name", "v").repartition(3, col("v")))
    val winners = variants.map { df =>
      Upsert.merge(existing.limit(0), df, "id")
        .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    }
    assert(winners.distinct.size === 1) // full-row ordering: "a" wins for id=5
    assert(winners.head === Seq((5L, "a"), (6L, "q")))
  }

  test("merge rejects mismatched schemas") {
    val bad = Seq((9L, "x")).toDF("id", "name")
    intercept[IllegalArgumentException] { Upsert.merge(existing, bad, "id") }
  }
}
