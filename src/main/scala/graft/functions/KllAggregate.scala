package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** `kll_quantiles(col, k, ps...)` — Catalyst aggregate computing approximate
  * quantiles via the deterministic KLL sketch ([[KllBuffer]]).
  *
  * TypedImperativeAggregate ⇒ partial sketches are built map-side, serialized
  * into the aggregation buffer, merged at the exchange — the same
  * partial/final shape as built-in sketch aggregates (approx_count_distinct),
  * so the drift pass over 10^12 rows ships only O(k log n) bytes per
  * (source) group instead of sorting the rows.
  */
case class KllQuantiles(
    child: Expression,
    k: Int,
    ps: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buffer: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val d = child.dataType match {
        case DoubleType => v.asInstanceOf[Double]
        case FloatType => v.asInstanceOf[Float].toDouble
        case IntegerType => v.asInstanceOf[Int].toDouble
        case LongType => v.asInstanceOf[Long].toDouble
        case ShortType => v.asInstanceOf[Short].toDouble
        case _ => v.toString.toDouble
      }
      buffer.update(d)
    }
    buffer
  }

  override def merge(buffer: KllBuffer, input: KllBuffer): KllBuffer = {
    buffer.merge(input); buffer
  }

  override def eval(buffer: KllBuffer): Any =
    new GenericArrayData(buffer.quantiles(ps))

  override def serialize(buffer: KllBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): KllBuffer =
    KllBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllQuantiles =
    copy(child = newChildren.head)
}

object KllFunctions {
  /** DataFrame-facing helper: `kllQuantiles($"n_tok", 200, Seq(0.5, 0.95))`. */
  def kllQuantiles(col: Column, k: Int, ps: Seq[Double]): Column =
    bridge.column(
      KllQuantiles(bridge.expression(col), k, ps).toAggregateExpression())
}
