package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graftshim.ColumnBridge

/** SQL surface for the native expressions, so `spark.sql(...)` users get
  * the same codegen'd operators as the Column API:
  *
  *   token_hashes(text), shingle_hashes(text, k), simhash63(hashes),
  *   minhash_signature(hashes, num), rolling_fingerprint(hashes),
  *   md5_token_hashes(text), md5_shingle_hashes(text, k),
  *   dot_product(array<double>, array<double>)
  *
  * Two wirings: [[GraftFunctions.register]] for an existing session, and
  * [[graft.GraftExtensions]] via `spark.sql.extensions` for cluster
  * deploys (applied at session build time).
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "token_hashes" -> { args => NativeText.TokenHashes(args.head) },
    "shingle_hashes" -> { args =>
      NativeText.ShingleHashes(args.head, intLit(args(1), "shingle k")) },
    "simhash63" -> { args => NativeHashes.SimHash63(args.head) },
    "minhash_signature" -> { args =>
      val num = intLit(args(1), "signature size")
      val params = TextFunctions.minhashParamsFor(num)
      NativeHashes.MinHashSignature(args.head, num,
        params.map(_._1).toArray, params.map(_._2).toArray) },
    "rolling_fingerprint" -> { args => NativeHashes.RollingFingerprint(args.head) },
    "md5_token_hashes" -> { args => NativeText.Md5TokenHashes(args.head) },
    "md5_shingle_hashes" -> { args =>
      NativeText.Md5ShingleHashes(args.head, intLit(args(1), "shingle k")) },
    "dot_product" -> { args => NativeVector.DotProduct(args.head, args(1)) },
  )

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      ColumnBridge.registerFunction(spark, name, b)
    }
}
