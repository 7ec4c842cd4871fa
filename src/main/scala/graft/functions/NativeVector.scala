package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

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
}
