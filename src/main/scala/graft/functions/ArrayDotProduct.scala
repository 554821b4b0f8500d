package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{columnExpr, exprColumn}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two double arrays.
  *
  * The built-in route (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) is a
  * CodegenFallback: every evaluation allocates an intermediate array and
  * interprets a lambda per element — benchmarked ~50× slower on the 2M-pair
  * near-dup join at sf0.1. This expression compiles to a tight
  * `for` loop over the two `ArrayData` buffers inside WholeStageCodegen:
  * no allocation, no virtual calls, stays in the fused stage.
  *
  * Accumulation is sequential left-to-right — the same order as the fold it
  * replaces — so results are bit-identical to the previous implementation
  * (and to the DuckDB oracle modulo last-ulp accumulation differences, which
  * the callers' round(·, 6) removes).
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must already be array<double>; the Column wrapper casts.
  // (ImplicitCastInputTypes needs private[sql] AbstractDataType.)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {
  /** Column API: dot(a, b) with explicit float→double element casts. */
  def dot(a: Column, b: Column): Column =
    exprColumn(ArrayDotProduct(
      columnExpr(a.cast("array<double>")), columnExpr(b.cast("array<double>"))))
}
