package graft

import org.apache.spark.sql.functions._

import graft.functions.{NativeHashes => NH, TextFunctions => TF}

/** The native codegen expressions must be bit-identical to the
  * higher-order-function formulations on real corpus data — both the
  * codegen path (cluster) and interpreted eval path (fallback).
  */
class NativeHashesSpec extends SparkTestBase {

  private def docs = spark.read.parquet(s"${sf()}/documents.parquet").limit(100)

  test("native simhash63 == HOF simhash63 on corpus sample") {
    val base = docs
      .select(col("doc_id"), TF.tokenHashes(TF.tokens(col("text"))).as("hs"))
    val mismatch = base
      .select(col("doc_id"),
        NH.simhash63(col("hs")).as("native"),
        TF.simhash63FromHashes("hs").as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatch === 0)
  }

  test("native minhash signature == HOF signature on corpus sample") {
    val base = docs
      .select(col("doc_id"), TF.shingles(TF.tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), TF.shingleHashes(col("sh")).as("hs"))
    val mismatch = base
      .select(col("doc_id"),
        NH.minhashSignature(col("hs"), 16).as("native"),
        TF.minhashSignatureFromHashes(col("hs"), 16).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatch === 0)
  }

  test("native single-pass ShingleHashes == HOF tokenize->shingle->hash chain") {
    val nat = docs.select(col("doc_id"),
      graft.functions.NativeText.shingleHashes(col("text"), 3).as("hs"))
    val hof = docs
      .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
      .select(col("doc_id"), TF.shingleHashes(TF.shingles(col("toks"), 3)).as("hs2"))
    val joined = nat.join(hof, "doc_id")
    assert(joined.filter(col("hs") =!= col("hs2")).count() === 0)
    assert(joined.count() === 100)
  }

  test("native single-pass TokenHashes == HOF tokenize->hash chain") {
    val nat = docs.select(col("doc_id"),
      graft.functions.NativeText.tokenHashes(col("text")).as("hs"))
    val hof = docs
      .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
      .select(col("doc_id"), TF.tokenHashes(col("toks")).as("hs2"))
    val joined = nat.join(hof, "doc_id")
    assert(joined.filter(col("hs") =!= col("hs2")).count() === 0)
  }

  test("native rolling fingerprint == HOF fingerprint on corpus sample") {
    val nat = docs.select(col("doc_id"),
      NH.rollingFingerprint(graft.functions.NativeText.tokenHashes(col("text"))).as("fp"))
    val hof = docs
      .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
      .select(col("doc_id"), TF.rollingFingerprint(col("toks")).as("fp2"))
    assert(nat.join(hof, "doc_id").filter(col("fp") =!= col("fp2")).count() === 0)
  }

  test("interpreted eval path matches codegen (single-row eval)") {
    // force interpreted evaluation by evaluating on a literal via eval()
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val hs = Array(7L, -3L, 123456789L, Long.MinValue + 1)
    val lit = Literal.create(new GenericArrayData(hs), ArrayType(LongType))
    val interpSim = NH.SimHash63(lit).eval(null).asInstanceOf[Long]
    val dfSim = spark.range(1)
      .select(NH.simhash63(typedLit(hs.toSeq)).as("s"))
      .first().getLong(0)
    assert(interpSim === dfSim)
  }
}
