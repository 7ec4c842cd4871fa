package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, NativeHashes => NH, NativeText => NT}

class SqlFunctionsSpec extends SparkTestBase {

  test("registered SQL functions equal the Column API") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      """SELECT
        |  simhash63(token_hashes('the quick brown fox jumps again today')) AS sh,
        |  rolling_fingerprint(token_hashes('alpha beta gamma')) AS fp,
        |  minhash_signature(shingle_hashes('a b c d e f', 3), 16) AS sig
        |""".stripMargin).collect().head
    val viaCols = spark.range(1).select(
      NH.simhash63(NT.tokenHashes(lit("the quick brown fox jumps again today"))).as("sh"),
      NH.rollingFingerprint(NT.tokenHashes(lit("alpha beta gamma"))).as("fp"),
      NH.minhashSignature(NT.shingleHashes(lit("a b c d e f"), 3), 16).as("sig"))
      .collect().head
    assert(viaSql.getLong(0) === viaCols.getLong(0))
    assert(viaSql.getLong(1) === viaCols.getLong(1))
    assert(viaSql.getSeq[Long](2) === viaCols.getSeq[Long](2))
  }

  test("dot_product from SQL equals the Column API kernel") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect().head.getDouble(0)
    assert(viaSql === 32.0)
    // NULL contract carried through SQL: length mismatch → NULL
    val mismatched = spark.sql(
      "SELECT dot_product(array(1.0D), array(1.0D, 2.0D)) AS d").collect().head
    assert(mismatched.isNullAt(0))
  }

  test("non-literal signature size is rejected with a clear error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_signature(shingle_hashes('a b c d', 3), 1 + 15)").collect()
    }
    assert(e.getMessage.contains("integer literal") || e.getMessage.contains("signature size"))
  }
}
