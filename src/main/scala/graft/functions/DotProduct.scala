package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Native codegen'd dot product of two `array<double>` columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(a, b, _*_),
  * 0.0, _+_)`) is CodegenFallback: every row pays interpreted lambda
  * dispatch plus a zipped intermediate array allocation. This expression
  * participates in whole-stage codegen — one tight primitive loop, no
  * allocation — which is what the brute-force scan over a 100 TB embedding
  * column actually runs.
  *
  * Summation is strictly left-to-right (`acc += a[i]*b[i]`), the SAME
  * order as the HOF left fold and DuckDB's `list_dot_product`, so results
  * are bit-identical across all three (SimilarityOpsSpec pins this).
  * Arrays must not contain null elements (token/embedding columns never
  * do); length mismatch contributes min-length terms.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // manual check (AbstractDataType/ExpectsInputTypes are private[sql] in
  // Spark 4): both inputs must already BE array<double> — the Column face
  // casts, SQL callers cast explicitly
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API face (`bridge` shims Spark 4's private converters). */
  def apply(a: Column, b: Column): Column =
    bridge.column(DotProduct(
      bridge.expression(a.cast("array<double>")),
      bridge.expression(b.cast("array<double>"))))
}
