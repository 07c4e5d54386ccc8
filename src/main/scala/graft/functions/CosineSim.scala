package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Fused codegen'd cosine similarity of two `array<double>` columns.
  *
  * Composing [[DotProduct]] three times (a·b, a·a, b·b) walks both arrays
  * three times; this expression accumulates all three sums in ONE loop.
  * Arithmetic is EXACTLY `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))`
  * with left-to-right summation and `0.0` when either norm is zero —
  * bit-identical to the composed form and to the DuckDB oracle's
  * `list_dot_product` formulation (pinned by SimilarityOpsSpec).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    // norms over the FULL arrays (if lengths differ, the tail still counts,
    // matching dot(a,a)/dot(b,b) of the composed form)
    var j = n
    while (j < x.numElements()) { val v = x.getDouble(j); na += v * v; j += 1 }
    j = n
    while (j < y.numElements()) { val v = y.getDouble(j); nb += v * v; j += 1 }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den > 0) dot / den else 0.0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val den = ctx.freshName("den")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xi = $a.getDouble($i);
         |  final double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |for (int $i = $n; $i < $a.numElements(); $i++) {
         |  final double $xi = $a.getDouble($i); $na += $xi * $xi;
         |}
         |for (int $i = $n; $i < $b.numElements(); $i++) {
         |  final double $yi = $b.getDouble($i); $nb += $yi * $yi;
         |}
         |final double $den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = $den > 0 ? $dot / $den : 0.0;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Column-API face; casts both sides to `array<double>`. */
  def apply(a: Column, b: Column): Column =
    bridge.column(CosineSim(
      bridge.expression(a.cast("array<double>")),
      bridge.expression(b.cast("array<double>"))))
}
