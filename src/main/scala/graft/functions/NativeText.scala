package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass text→hash expressions.
  *
  * Composing the higher-order-function pipeline (split → filter → slice →
  * concat_ws → xxhash64) re-evaluates the tokenizer inside every lambda
  * element after Catalyst inlines the projections — measured 90s for 5000
  * docs at sf0.1 just for shingle hashes. These expressions do one pass per
  * row in JVM code. One expression eval per row means interpreter overhead
  * is negligible → CodegenFallback keeps them simple.
  *
  * Semantics replicate the Column formulations bit-for-bit (equivalence
  * asserted in NativeHashesSpec): UTF8String trim/toLowerCase (identical to
  * Spark's trim/lower), regex "\s+" split with empties dropped, xxhash64
  * seed 42 (Spark's default), first-occurrence-order distinct.
  */
object NativeText {

  private val WS = java.util.regex.Pattern.compile("\\s+")

  private def tokenize(input: Any): Array[String] = {
    val s = input.asInstanceOf[UTF8String].trim().toLowerCase.toString
    if (s.isEmpty) Array.empty[String]
    else WS.split(s).filter(_.nonEmpty)
  }

  private def xx(s: String): Long =
    XxHash64Function.hash(UTF8String.fromString(s), StringType, 42L)

  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(s) as a non-negative Long — equal to parsing the
    * first 15 hex chars of the digest. Chosen over xxhash64 as the base
    * content hash because ANY engine can reproduce it from its md5()
    * builtin (DuckDB: CAST('0x' || substring(md5(x),1,15) AS BIGINT)),
    * which is what makes the dedup family oracle-checkable end to end.
    */
  private[functions] def md5Long60(s: String): Long = {
    val d = Md5.get().digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v >>> 4
  }

  /** array<long>: xxhash64 of every whitespace token of the lowercased,
    * trimmed text. Input to SimHash63.
    */
  case class TokenHashes(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"token_hashes requires string, got ${other.sql}")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "token_hashes"

    override def nullSafeEval(input: Any): Any = {
      val toks = tokenize(input)
      val out = new Array[Long](toks.length)
      var i = 0
      while (i < toks.length) { out(i) = xx(toks(i)); i += 1 }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): TokenHashes =
      copy(child = newChild)
  }

  /** array<long>: pmod(xxhash64(shingle), 2^31-1) over the DISTINCT k-token
    * shingles of the text, in first-occurrence order. Empty when the text
    * has fewer than k tokens. Input to MinHashSignature.
    */
  case class ShingleHashes(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    require(k > 0)
    private val P = 2147483647L

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes requires string, got ${other.sql}")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "shingle_hashes"

    override def nullSafeEval(input: Any): Any = {
      val toks = tokenize(input)
      if (toks.length < k) return new GenericArrayData(Array.empty[Long])
      val seen = new mutable.LinkedHashSet[String]
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= toks.length - k) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen += sb.toString
        i += 1
      }
      val out = new Array[Long](seen.size)
      var n = 0
      seen.foreach { sh => out(n) = java.lang.Math.floorMod(xx(sh), P); n += 1 }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
      copy(child = newChild)
  }

  /** array<long>: md5-derived 60-bit hash of every whitespace token of the
    * lowercased, trimmed text. The oracle-checkable sibling of
    * [[TokenHashes]]: any SQL engine reproduces the values from md5().
    */
  case class Md5TokenHashes(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"md5_token_hashes requires string, got ${other.sql}")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "md5_token_hashes"

    override def nullSafeEval(input: Any): Any = {
      val toks = tokenize(input)
      val out = new Array[Long](toks.length)
      var i = 0
      while (i < toks.length) { out(i) = md5Long60(toks(i)); i += 1 }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): Md5TokenHashes =
      copy(child = newChild)
  }

  /** array<long>: md5Long60(shingle) mod 2^31-1 over the DISTINCT k-token
    * shingles, in first-occurrence order. The oracle-checkable sibling of
    * [[ShingleHashes]] (same mod-p reduction for the MinHash family).
    */
  case class Md5ShingleHashes(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    require(k > 0)
    private val P = 2147483647L

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"md5_shingle_hashes requires string, got ${other.sql}")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "md5_shingle_hashes"

    override def nullSafeEval(input: Any): Any = {
      val toks = tokenize(input)
      if (toks.length < k) return new GenericArrayData(Array.empty[Long])
      val seen = new mutable.LinkedHashSet[String]
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= toks.length - k) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen += sb.toString
        i += 1
      }
      val out = new Array[Long](seen.size)
      var n = 0
      seen.foreach { sh => out(n) = md5Long60(sh) % P; n += 1 }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): Md5ShingleHashes =
      copy(child = newChild)
  }

  // ------------------------------------------------------------ Column API

  def tokenHashes(text: Column): Column =
    ColumnBridge.column(TokenHashes(ColumnBridge.expression(text)))

  def shingleHashes(text: Column, k: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), k))

  def md5TokenHashes(text: Column): Column =
    ColumnBridge.column(Md5TokenHashes(ColumnBridge.expression(text)))

  def md5ShingleHashes(text: Column, k: Int): Column =
    ColumnBridge.column(Md5ShingleHashes(ColumnBridge.expression(text), k))
}
