package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, VectorOps => V}

class TextFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("tokens: lowercase, whitespace split, empties dropped") {
    val got = Seq("  The quick  Fox ").toDF("text")
      .select(TF.tokens(col("text")).as("t"))
      .first().getSeq[String](0)
    assert(got === Seq("the", "quick", "fox"))
  }

  test("shingles: k-grams, distinct, empty when too short") {
    val df = Seq("a b c d", "a b").toDF("text")
      .select(TF.shingles(TF.tokens(col("text")), 3).as("sh"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0).toSet === Set("a b c", "b c d"))
    assert(rows(1).isEmpty)
  }

  test("minhash: identical docs -> identical signature, estJaccard 1.0") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"),
                 (2L, "the quick brown fox jumps over the lazy dog"),
                 (3L, "completely different words in this entirely other document"))
      .toDF("id", "text")
      .select(col("id"), TF.minhashSignature(TF.shingles(TF.tokens(col("text")), 3), 16).as("sig"))
    val a = df.filter(col("id") === 1).select(col("sig").as("sa"))
    val b = df.filter(col("id") === 2).select(col("sig").as("sb"))
    val c = df.filter(col("id") === 3).select(col("sig").as("sc"))
    val same = a.crossJoin(b).select(TF.estJaccard(col("sa"), col("sb"))).first().getDouble(0)
    val diff = a.crossJoin(c).select(TF.estJaccard(col("sa"), col("sc"))).first().getDouble(0)
    assert(same === 1.0)
    assert(diff < 0.3)
  }

  test("exact jaccard on known sets") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
      .select(TF.exactJaccard(col("x"), col("y")).as("j"))
    assert(df.first().getDouble(0) === 0.5) // |{b,c}| / |{a,b,c,d}|
  }

  test("simhash: equal token streams equal; near-dup close in hamming") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog and runs far away today"),
                 (2L, "the quick brown fox jumps over the lazy dog and runs far away today"),
                 (3L, "the quick brown fox jumps over the lazy dog and runs far away tonight"))
      .toDF("id", "text")
      .select(col("id"), TF.tokens(col("text")).as("toks"))
      .select(col("id"), TF.simhash63("toks").as("h"))
    val hs = df.orderBy("id").collect().map(_.getLong(1))
    assert(hs(0) === hs(1))
    val hamming = java.lang.Long.bitCount(hs(0) ^ hs(2))
    assert(hamming <= 12, s"near-dup hamming was $hamming")
    assert(hs(0) >= 0L) // 63-bit: never negative
  }

  test("rolling fingerprint is order-sensitive and deterministic") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"), (3L, "alpha beta gamma"))
      .toDF("id", "text")
      .select(col("id"), TF.rollingFingerprint(TF.tokens(col("text"))).as("fp"))
    val fps = df.orderBy("id").collect().map(_.getLong(1))
    assert(fps(0) !== fps(1))
    assert(fps(0) === fps(2))
    assert(fps.forall(f => f >= 0 && f < 1000000007L))
  }

  test("vector ops: dot/norm/cosine on known vectors") {
    val df = Seq((Seq(1.0, 0.0), Seq(0.0, 1.0)), (Seq(1.0, 2.0), Seq(1.0, 2.0)))
      .toDF("a", "b")
      .select(V.dot(col("a"), col("b")).as("d"), round(V.cosine(col("a"), col("b")), 9).as("c"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) === 0.0)
    assert(rows(0).getDouble(1) === 0.0)
    assert(rows(1).getDouble(0) === 5.0)
    assert(rows(1).getDouble(1) === 1.0)
  }

  test("cosine of zero vector is 0, not NaN") {
    val df = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0))).toDF("a", "b")
      .select(V.cosine(col("a"), col("b")).as("c"))
    assert(df.first().getDouble(0) === 0.0)
  }
}
