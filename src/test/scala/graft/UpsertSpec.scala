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

  test("merge rejects mismatched schemas") {
    val bad = Seq((9L, "x")).toDF("id", "name")
    intercept[IllegalArgumentException] { Upsert.merge(existing, bad, "id") }
  }
}
