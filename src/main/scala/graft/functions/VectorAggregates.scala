package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mutable buffer for [[VectorAvgAgg]]: running element-wise sum + count. */
final class VecAvgBuffer(var sum: Array[Double], var n: Long)

/** Element-wise mean of array<double> vectors — the centroid aggregate
  * powering the IVF coarse-quantizer path. A TypedImperativeAggregate with a
  * primitive double[] buffer: updates are a tight add loop, merges are
  * element-wise, and partial aggregation happens map-side like any other
  * Spark aggregate. Null or empty vectors are ignored; mixed dimensions
  * take the first seen dimension.
  */
case class VectorAvgAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecAvgBuffer]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_vec_avg expects array<double>, got $t")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_avg"

  override def createAggregationBuffer(): VecAvgBuffer = new VecAvgBuffer(null, 0L)

  override def update(buf: VecAvgBuffer, input: InternalRow): VecAvgBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n > 0) {
        if (buf.sum == null) buf.sum = new Array[Double](n)
        val d = math.min(n, buf.sum.length)
        var i = 0
        while (i < d) { buf.sum(i) += arr.getDouble(i); i += 1 }
        buf.n += 1
      }
    }
    buf
  }

  override def merge(a: VecAvgBuffer, b: VecAvgBuffer): VecAvgBuffer = {
    if (b.sum != null) {
      if (a.sum == null) { a.sum = b.sum.clone(); a.n = b.n }
      else {
        val d = math.min(a.sum.length, b.sum.length)
        var i = 0
        while (i < d) { a.sum(i) += b.sum(i); i += 1 }
        a.n += b.n
      }
    }
    a
  }

  override def eval(buf: VecAvgBuffer): Any =
    if (buf.sum == null || buf.n == 0) null
    else new GenericArrayData(buf.sum.map(_ / buf.n))

  override def serialize(buf: VecAvgBuffer): Array[Byte] = {
    val dim = if (buf.sum == null) 0 else buf.sum.length
    val bb = ByteBuffer.allocate(12 + 8 * dim)
    bb.putLong(buf.n).putInt(dim)
    var i = 0
    while (i < dim) { bb.putDouble(buf.sum(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecAvgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong()
    val dim = bb.getInt()
    if (dim == 0) new VecAvgBuffer(null, n)
    else {
      val sum = new Array[Double](dim)
      var i = 0
      while (i < dim) { sum(i) = bb.getDouble(); i += 1 }
      new VecAvgBuffer(sum, n)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorAvgAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorAvgAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorAvgAgg =
    copy(child = newChild)
}
