package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native codegen'd vector kernels.
  *
  * The HOF formulation (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) is
  * interpreted per element AND re-evaluates inlined subexpressions inside
  * lambda bodies after projection collapse — measured 105 s for t15's
  * ~3.5M candidate pairs at sf0.1 vs ~2 s with this expression. Same trap
  * and same fix as the text-hash family (NativeHashes.scala).
  *
  * Semantics match the Spark HOF path exactly (including NULL on length
  * mismatch or null elements — see DotProduct). For the values the oracle
  * corpora contain — fixed-dimension, non-null vectors — the DuckDB
  * formulation (`list_sum(list_transform(list_zip(a, b), p -> p[1] *
  * p[2]))`) folds the same per-element sequence left-to-right in Double,
  * so results are bit-identical there; on ragged/null input DuckDB's
  * list_sum skips NULLs instead, which is why such vectors must not reach
  * an oracle-checked query.
  */
object NativeVector {

  case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires two array<double>, got ${l.sql} and ${r.sql}")
    }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "dot_product"

    // NULL exactly where the HOF reference is NULL: zip_with pads a length
    // mismatch with nulls and a null product nulls the whole aggregate, so
    // mismatched lengths or any null element → NULL result
    override def nullable: Boolean = true

    private def elemNullable: Boolean = Seq(left, right).exists {
      _.dataType match { case ArrayType(_, n) => n; case _ => false }
    }

    // reads ArrayData in place (getDouble) rather than toDoubleArray():
    // the copy allocates ~0.5 KB per side per PAIR on the hot join path
    override def nullSafeEval(a: Any, b: Any): Any = {
      val xs = a.asInstanceOf[ArrayData]
      val ys = b.asInstanceOf[ArrayData]
      val n = xs.numElements()
      if (n != ys.numElements()) return null
      var acc = 0.0
      var i = 0
      if (elemNullable) {
        while (i < n) {
          if (xs.isNullAt(i) || ys.isNullAt(i)) return null
          acc += xs.getDouble(i) * ys.getDouble(i); i += 1
        }
      } else {
        while (i < n) { acc += xs.getDouble(i) * ys.getDouble(i); i += 1 }
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val nullCheck =
          if (elemNullable)
            s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
          else ""
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $nullCheck
           |    $acc += $a.getDouble($i) * $b.getDouble($i);
           |  }
           |  if (!${ev.isNull}) ${ev.value} = $acc;
           |}
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  /** ALL of a banded family's sign codes in ONE pass over the embedding
    * — `tables` codes of `bits` sign bits each, plane (t·bits + i) at
    * row-major offset in the flattened `planes` pool slice.
    *
    * Why: the column formulation (`array(bucketOfTable(0..L-1))`, each
    * table a `bits`-term when-chain over [[DotProduct]]s) builds
    * L × bits INDEPENDENT dot expressions, and after projection
    * collapse each one re-evaluates the `transform(embedding, cast)`
    * child — the same interpreted-HOF re-evaluation trap the DotProduct
    * doc describes, multiplied by the banded fan-out. The round-14
    * sf10sub profile measured batch coding at 55 s of t55's 69 s wall
    * (112 plane dots/vector at band7:16:1); this expression reads the
    * array once and accumulates every plane in registers.
    *
    * Semantics are BIT-IDENTICAL to the column formulation (the stamped
    * index tables must keep verifying): per plane the same ascending
    * left-fold Double sum, bit i of table t set iff that dot > 0; a
    * NULL input array, a dimension mismatch, or any NULL element — the
    * cases where DotProduct is NULL and `when(null > 0, …).otherwise(0)`
    * contributes 0 — yield the same all-zero codes, and the row is KEPT
    * (a nullSafeEval would instead emit a NULL array and posexplode
    * would silently drop the row from the index).
    */
  case class SignBandCodes(child: Expression, planes: Array[Double],
                           tables: Int, bits: Int, dim: Int)
      extends UnaryExpression {
    require(tables > 0 && bits > 0 && dim > 0 && planes.length == tables * bits * dim)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sign_band_codes requires array<double>, got ${other.sql}")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "sign_band_codes"
    override def nullable: Boolean = false

    private def elemNullable: Boolean = child.dataType match {
      case ArrayType(_, n) => n; case _ => false
    }

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return new GenericArrayData(new Array[Long](tables))
      new GenericArrayData(NativeVector.signBandCodes(
        v.asInstanceOf[ArrayData], planes, tables, bits, dim, elemNullable))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
      val planesRef = ctx.addReferenceObj("signBandPlanes", planes, "double[]")
      val childGen = child.genCode(ctx)
      val codes = ctx.freshName("codes")
      val resultCode =
        code"""
           |${childGen.code}
           |long[] $codes;
           |if (${childGen.isNull}) {
           |  $codes = new long[$tables];
           |} else {
           |  $codes = graft.functions.NativeVector.signBandCodesRaw(
           |    ${childGen.value}, $planesRef, $tables, $bits, $dim, $elemNullable);
           |}
           |final org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value} =
           |  new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
           |""".stripMargin
      ev.copy(code = resultCode, isNull = FalseLiteral)
    }

    override protected def withNewChildInternal(newChild: Expression): SignBandCodes =
      copy(child = newChild)
  }

  /** The [[SignBandCodes]] kernel — public so generated code can call the
    * static forwarder. Mismatched dimension or any null element → all
    * zeros (see the expression doc).
    */
  def signBandCodes(emb: ArrayData, planes: Array[Double], tables: Int,
                    bits: Int, dim: Int, elemNullable: Boolean): Array[Long] =
    signBandCodesRaw(emb, planes, tables, bits, dim, elemNullable)

  def signBandCodesRaw(emb: ArrayData, planes: Array[Double], tables: Int,
                       bits: Int, dim: Int, elemNullable: Boolean): Array[Long] = {
    val codes = new Array[Long](tables)
    val n = emb.numElements()
    if (n != dim) return codes
    if (elemNullable) {
      var j = 0
      while (j < n) { if (emb.isNullAt(j)) return codes; j += 1 }
    }
    val xs = emb.toDoubleArray()
    var p = 0 // plane index = t * bits + i
    var t = 0
    while (t < tables) {
      var code = 0L
      var i = 0
      while (i < bits) {
        var acc = 0.0
        val off = p * dim
        var j = 0
        while (j < dim) { acc += xs(j) * planes(off + j); j += 1 }
        if (acc > 0) code |= (1L << i)
        p += 1; i += 1
      }
      codes(t) = code
      t += 1
    }
    codes
  }
}
