package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Native codegen'd hyperplane-LSH signature of an `array<double>` vector.
  *
  * The higher-order-function formulation builds, PER PLANE, a
  * `aggregate(zip_with(v, sequence(...), (x, j) => x * h(p, j)), 0, +)`
  * expression — `nPlanes` interpreted lambda chains per row, each
  * re-evaluating an `xxhash64` per element (64 planes × dim elements of
  * boxed interpreter dispatch per vector). This expression computes the
  * identical signature in one tight JIT'd loop and participates in
  * whole-stage codegen (guide §4: no non-codegen expressions in the hot
  * path).
  *
  * Bit-identical to the HOF form by construction (pinned by
  * SimilarityOpsSpec): the plane component is
  * `XXH64(j, XXH64(p, seed=42)) / Long.MaxValue` — exactly Spark's
  * `xxhash64(lit(p), j)` over two int inputs — accumulated left-to-right
  * in element order, bit `p` set iff the projection is `>= 0`, and the
  * empty-array case yields 0L (the HOF's null-propagated `otherwise`
  * branch). Array elements must be non-null (embedding columns never are).
  */
case class HyperplaneSig(child: Expression, nPlanes: Int)
    extends UnaryExpression {

  require(nPlanes >= 1 && nPlanes <= 64, "signature packs into one long")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig expects array<double>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "hyperplane_sig"

  override protected def nullSafeEval(v: Any): Any =
    HyperplaneSig.compute(v.asInstanceOf[ArrayData], nPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.HyperplaneSig.compute($v, $nPlanes)")

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneSig = copy(child = newChild)
}

object HyperplaneSig {

  /** Signature loop — shared by interpreted eval and generated code.
    * Summation order (ascending element index) and the hash chain
    * (p then j, seed 42) replicate the HOF formulation exactly.
    */
  def compute(v: ArrayData, nPlanes: Int): Long = {
    val n = v.numElements()
    // HOF parity: zip_with over an empty array null-propagates the fold,
    // so every plane takes the `otherwise(0L)` branch
    if (n == 0) return 0L
    val max = Long.MaxValue.toDouble
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      val h1 = XXH64.hashInt(p, 42L)
      var acc = 0.0
      var j = 0
      while (j < n) {
        // DIVISION, not multiply-by-reciprocal: the HOF form divides, and
        // x/y vs x*(1/y) differ in the last ulp — bit-parity requires the
        // same operation
        acc += v.getDouble(j) * (XXH64.hashInt(j, h1).toDouble / max)
        j += 1
      }
      if (acc >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  /** Column-API face. */
  def apply(v: Column, nPlanes: Int): Column =
    bridge.column(HyperplaneSig(
      bridge.expression(v.cast("array<double>")), nPlanes))
}
