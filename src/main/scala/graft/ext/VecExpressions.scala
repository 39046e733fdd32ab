package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst dot product over two `array<float>` columns, accumulated
  * in double in index order.
  *
  * This is the one hot-path scalar where Spark's built-ins fall short:
  * `aggregate(zip_with(...))` higher-order functions are interpreted
  * (CodegenFallback) and allocate an intermediate array per row, which is
  * what a 100 TB ANN scan cannot afford. This expression participates in
  * WholeStageCodegen via [[doGenCode]] — a tight primitive loop, no
  * allocation — and its sequential index-order accumulation produces
  * bit-identical results to the HOF formulation (oracle-safe).
  *
  * Null elements inside the arrays are not expected (embedding columns);
  * a null array yields null via BinaryExpression's null-intolerant default.
  */
case class VecDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecExpressions {
  /** Column-level dot product backed by [[VecDotProduct]]. Inputs must be
    * `array<float>` columns (embedding vectors). */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
