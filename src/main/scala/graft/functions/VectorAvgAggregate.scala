package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise mean of vectors as a Catalyst
  * `TypedImperativeAggregate` — the chunk→document pooling step of an
  * embedding pipeline (mean-pool each document's chunk embeddings
  * back to one document vector; the reference pools on the client
  * side, `bench/st_embedding.py` one-doc-at-a-time). Accumulates in
  * double per dimension; partial sums merge on the reduce side, so
  * one (dim-length sums, count) buffer per group crosses the shuffle
  * regardless of how many chunk vectors fold into it.
  *
  * Input: array<float> or array<double>; null vectors are skipped;
  * the first non-null vector fixes the dimension and a mismatched
  * later vector fails loudly (silent truncation would corrupt the
  * pooled embedding). Empty groups (all nulls) evaluate to null.
  */
case class VectorAvg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorAvg.Buf] {

  private def childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vector_avg expects array<float|double>, got $t")
  }

  override def createAggregationBuffer(): VectorAvg.Buf = new VectorAvg.Buf

  override def update(buf: VectorAvg.Buf, input: InternalRow): VectorAvg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (buf.sums == null) buf.sums = new Array[Double](n)
      else require(buf.sums.length == n,
        s"vector_avg dimension mismatch: ${buf.sums.length} vs $n")
      var i = 0
      // null ELEMENTS fail loudly: getFloat on a null slot silently
      // reads 0.0, which would corrupt the pooled embedding (and
      // diverge from SQL avg's skip-null semantics without warning)
      if (childIsFloat)
        while (i < n) {
          require(!arr.isNullAt(i), s"vector_avg: null element at index $i")
          buf.sums(i) += arr.getFloat(i); i += 1
        }
      else
        while (i < n) {
          require(!arr.isNullAt(i), s"vector_avg: null element at index $i")
          buf.sums(i) += arr.getDouble(i); i += 1
        }
      buf.count += 1
    }
    buf
  }

  override def merge(a: VectorAvg.Buf, b: VectorAvg.Buf): VectorAvg.Buf = {
    if (b.sums != null) {
      if (a.sums == null) { a.sums = b.sums; a.count = b.count }
      else {
        require(a.sums.length == b.sums.length,
          s"vector_avg dimension mismatch: ${a.sums.length} vs ${b.sums.length}")
        var i = 0
        while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
        a.count += b.count
      }
    }
    a
  }

  override def eval(buf: VectorAvg.Buf): Any =
    if (buf.sums == null) null
    else {
      val out = new Array[Any](buf.sums.length)
      var i = 0
      while (i < out.length) { out(i) = buf.sums(i) / buf.count; i += 1 }
      new GenericArrayData(out)
    }

  override def serialize(buf: VectorAvg.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    if (buf.sums == null) out.writeInt(-1)
    else {
      out.writeInt(buf.sums.length)
      out.writeLong(buf.count)
      buf.sums.foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VectorAvg.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new VectorAvg.Buf
    val n = in.readInt()
    if (n >= 0) {
      buf.count = in.readLong()
      buf.sums = new Array[Double](n)
      var i = 0
      while (i < n) { buf.sums(i) = in.readDouble(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): VectorAvg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VectorAvg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorAvg =
    copy(child = newChildren(0))

  override def prettyName: String = "vector_avg"
}

object VectorAvg {
  final class Buf {
    var sums: Array[Double] = null
    var count: Long = 0L
  }
}
