package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{columnExpr, exprColumn}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd element-wise difference of two double arrays (length =
  * min of the operands, matching `ArrayDotProduct`'s bound). The built-in
  * route (`zip_with(a, b, _-_)`) is a CodegenFallback that interprets a
  * lambda per element; this stays a tight loop inside WholeStageCodegen —
  * the residual step of residual-PQ runs once per corpus row at index
  * build, which at 100 TB is a full corpus pass.
  */
case class ArraySubtract(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "array_sub"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = x.getDouble(i) - y.getDouble(i); i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $x.getDouble($i) - $y.getDouble($i);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArraySubtract =
    copy(left = newLeft, right = newRight)
}

object ArraySubtract {
  /** Column API: sub(a, b) with explicit float→double element casts. */
  def sub(a: Column, b: Column): Column =
    exprColumn(ArraySubtract(
      columnExpr(a.cast("array<double>")), columnExpr(b.cast("array<double>"))))
}
