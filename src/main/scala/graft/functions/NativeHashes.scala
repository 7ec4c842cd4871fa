package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for the hot dedup loops.
  *
  * The Column/higher-order-function formulations in [[TextFunctions]] are
  * interpreted per array element (HigherOrderFunction has no codegen), which
  * measured ~5ms/doc for the 63-bit SimHash fold. These expressions compute
  * the same values in one generated-Java tight loop per row — they keep the
  * surrounding projection inside whole-stage codegen and cut per-element
  * expression-tree overhead entirely.
  *
  * Semantics are bit-identical to the TextFunctions versions (asserted in
  * NativeHashesSpec), so either path can serve any query.
  */
object NativeHashes {

  /** 63-bit SimHash over pre-computed token hashes (array<long>).
    * Bit b is set iff the +1/-1 vote of token-hash bit b is positive;
    * bits assembled MSB(62)-first — identical to
    * TextFunctions.simhash63FromHashes.
    */
  case class SimHash63(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash63 requires array<bigint>, got ${other.sql}")
    }
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash63"

    override def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData].toLongArray()
      val counts = new Array[Int](63)
      var i = 0
      while (i < hs.length) {
        val h = hs(i)
        var b = 0
        while (b < 63) {
          counts(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
        i += 1
      }
      var r = 0L
      var b = 62
      while (b >= 0) {
        r = r * 2L + (if (counts(b) > 0) 1L else 0L)
        b -= 1
      }
      r
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, arr => {
        val hs = ctx.freshName("hs")
        val counts = ctx.freshName("counts")
        val i = ctx.freshName("i")
        val b = ctx.freshName("b")
        val r = ctx.freshName("r")
        s"""
           |long[] $hs = $arr.toLongArray();
           |int[] $counts = new int[63];
           |for (int $i = 0; $i < $hs.length; $i++) {
           |  long h = $hs[$i];
           |  for (int $b = 0; $b < 63; $b++) {
           |    $counts[$b] += (((h >> $b) & 1L) == 1L) ? 1 : -1;
           |  }
           |}
           |long $r = 0L;
           |for (int $b = 62; $b >= 0; $b--) {
           |  $r = $r * 2L + ($counts[$b] > 0 ? 1L : 0L);
           |}
           |${ev.value} = $r;
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): SimHash63 =
      copy(child = newChild)
  }

  /** MinHash signature over pre-computed shingle hashes (array<long>).
    * Slot i = min over hashes of (a_i·floorMod(h, p) + b_i) mod p, with the
    * same (a, b) parameter family as
    * TextFunctions.minhashSignatureFromHashes. Inputs are re-reduced mod p
    * defensively: a raw 64-bit hash would otherwise overflow a·h in Long
    * and silently corrupt the slot; already-reduced inputs are unchanged.
    * Empty input yields p (the family's +infinity) in every slot — callers
    * filter empty shingle sets upstream.
    */
  case class MinHashSignature(child: Expression, num: Int, as: Array[Long], bs: Array[Long])
      extends UnaryExpression {
    require(num > 0 && as.length >= num && bs.length >= num)
    private val P = 2147483647L // 2^31 - 1

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_signature requires array<bigint>, got ${other.sql}")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_signature"

    override def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData].toLongArray()
      val sig = new Array[Long](num)
      var i = 0
      while (i < num) {
        val a = as(i); val b = bs(i)
        var mn = P
        var j = 0
        while (j < hs.length) {
          val v = (a * java.lang.Math.floorMod(hs(j), P) + b) % P
          if (v < mn) mn = v
          j += 1
        }
        sig(i) = mn
        i += 1
      }
      new GenericArrayData(sig)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, arr => {
        val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
        val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
        val hs = ctx.freshName("hs")
        val sig = ctx.freshName("sig")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val mn = ctx.freshName("mn")
        s"""
           |long[] $hs = $arr.toLongArray();
           |long[] $sig = new long[$num];
           |for (int $i = 0; $i < $num; $i++) {
           |  long $mn = ${P}L;
           |  for (int $j = 0; $j < $hs.length; $j++) {
           |    long v = ($asRef[$i] * java.lang.Math.floorMod($hs[$j], ${P}L) + $bsRef[$i]) % ${P}L;
           |    if (v < $mn) $mn = v;
           |  }
           |  $sig[$i] = $mn;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
      copy(child = newChild)
  }

  /** Order-sensitive rolling polynomial over pre-computed token hashes:
    * acc = (acc·31 + floorMod(h, p)) mod p, p = 1e9+7 — identical to
    * TextFunctions.rollingFingerprint over the same token stream.
    */
  case class RollingFingerprint(child: Expression)
      extends UnaryExpression {
    private val P = 1000000007L

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"rolling_fingerprint requires array<bigint>, got ${other.sql}")
    }
    override def dataType: DataType = LongType
    override def prettyName: String = "rolling_fingerprint"

    override def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData].toLongArray()
      var acc = 0L
      var i = 0
      while (i < hs.length) {
        acc = (acc * 31L + java.lang.Math.floorMod(hs(i), P)) % P
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, arr => {
        val hs = ctx.freshName("hs")
        val acc = ctx.freshName("acc")
        val i = ctx.freshName("i")
        s"""
           |long[] $hs = $arr.toLongArray();
           |long $acc = 0L;
           |for (int $i = 0; $i < $hs.length; $i++) {
           |  $acc = ($acc * 31L + java.lang.Math.floorMod($hs[$i], ${P}L)) % ${P}L;
           |}
           |${ev.value} = $acc;
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
      copy(child = newChild)
  }

  // ------------------------------------------------------------ Column API

  def rollingFingerprint(tokenHashes: Column): Column =
    ColumnBridge.column(RollingFingerprint(ColumnBridge.expression(tokenHashes)))

  def simhash63(tokenHashes: Column): Column =
    ColumnBridge.column(SimHash63(ColumnBridge.expression(tokenHashes)))

  def minhashSignature(shingleHashes: Column, num: Int): Column = {
    val params = TextFunctions.minhashParamsFor(num)
    ColumnBridge.column(MinHashSignature(
      ColumnBridge.expression(shingleHashes), num,
      params.map(_._1).toArray, params.map(_._2).toArray))
  }
}
