package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.core.BoundedTopKG

/** Bounded-heap top-k as a Catalyst `TypedImperativeAggregate` — the
  * distributed analog of the reference's argpartition top-k selection
  * (pico_vdb.py:698-713; SURVEY §4.3 item 3): each partition keeps one
  * k-bounded min-heap per group, partial heaps merge on the reduce
  * side, and only k rows per group ever cross the shuffle — a
  * `row_number()` Window over the same input shuffles EVERY scored row.
  * Tie-break matches the Window plan exactly: score desc, id asc.
  *
  * Ids may be STRING or BIGINT. Output: array<struct<id, score>> ranked
  * best-first. (The BlockStore gemm path bypasses SQL aggregation
  * entirely; this aggregate is for composing top-k with arbitrary
  * Catalyst plans — filtered scans, joins — without a Window.)
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedTopKG[Any]] {

  require(k > 0, s"top_k_hits needs k > 0, got $k")

  private def idIsString: Boolean = id.dataType == StringType
  private def idIsInt: Boolean = id.dataType == IntegerType

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", id.dataType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType | FloatType, StringType | LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"top_k_hits expects (double|float score, string|bigint|int id), got ($s, $i)")
    }

  // string ids stay UTF8String in the heap (binary-comparable with the
  // exact ordering Spark's string sort uses — no per-row java.lang.String
  // round trip); int ids widen to Long internally, narrowed back in eval
  private implicit def ord: Ordering[Any] =
    (if (idIsString)
       Ordering.comparatorToOrdering(
         java.util.Comparator.naturalOrder[UTF8String]())
         .on[Any](_.asInstanceOf[UTF8String])
     else Ordering.Long.on[Any](_.asInstanceOf[Long]))

  override def createAggregationBuffer(): BoundedTopKG[Any] =
    new BoundedTopKG[Any](k)

  override def update(buf: BoundedTopKG[Any], input: InternalRow): BoundedTopKG[Any] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val sd = s match {
        case d: java.lang.Double => d.doubleValue()
        case f: java.lang.Float  => f.doubleValue()
      }
      val iv: Any =
        if (idIsString) i.asInstanceOf[UTF8String].clone() // detach from the row buffer
        else if (idIsInt) i.asInstanceOf[Int].toLong
        else i.asInstanceOf[Long]
      buf.offer(sd, iv)
    }
    buf
  }

  override def merge(a: BoundedTopKG[Any], b: BoundedTopKG[Any]): BoundedTopKG[Any] = {
    a.absorb(b); a
  }

  override def eval(buf: BoundedTopKG[Any]): Any = {
    val hits = buf.sortedHits()
    new GenericArrayData(hits.map { case (i, s) =>
      InternalRow(if (idIsInt) i.asInstanceOf[Long].toInt else i, s)
    })
  }

  override def serialize(buf: BoundedTopKG[Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val hits = buf.drain().toArray
    out.writeInt(hits.length)
    hits.foreach { case (s, i) =>
      out.writeDouble(s)
      if (idIsString) {
        // length-prefixed bytes, not writeUTF (which caps at 64 KB ids)
        val b = i.asInstanceOf[UTF8String].getBytes
        out.writeInt(b.length)
        out.write(b)
      } else out.writeLong(i.asInstanceOf[Long])
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopKG[Any] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new BoundedTopKG[Any](k)
    var x = 0
    while (x < n) {
      val s = in.readDouble()
      val i: Any = if (idIsString) {
        val b = new Array[Byte](in.readInt())
        in.readFully(b)
        UTF8String.fromBytes(b)
      } else in.readLong()
      buf.offer(s, i)
      x += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScore =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "top_k_hits"
}

/** Bounded-heap "first k ids" aggregate: per group, the k SMALLEST ids
  * in ascending order — the posting-list truncation shape
  * (`Lexical.invertedIndex`). A `row_number() OVER (PARTITION BY term
  * ORDER BY id)` computes the same thing but funnels EVERY row of a
  * group through one `WindowExec` task (AQE skew-splitting applies to
  * shuffle joins, not window partitions — a stopword term in a 1B-doc
  * corpus is one task ranking ~10⁹ rows to keep 8). Here each map
  * partition keeps one k-bounded max-heap per group, partial heaps
  * merge on the reduce side, and only k ids + the count ever cross the
  * shuffle. Ids may be STRING, BIGINT or INT; output is
  * array<id type> ascending.
  */
case class MinKIds(
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[Any]] {

  require(k > 0, s"min_k_ids needs k > 0, got $k")

  private def idIsString: Boolean = id.dataType == StringType
  private def idIsInt: Boolean = id.dataType == IntegerType

  override def children: Seq[Expression] = Seq(id)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(id.dataType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = id.dataType match {
    case StringType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"min_k_ids expects a string|bigint|int id, got $t")
  }

  // max-heap of the k smallest seen so far (head = current kth-smallest,
  // evicted when a smaller id arrives); int ids widen to Long internally.
  // Hoisted (transient lazy: rebuilt after task deserialization) — a
  // `def` allocated a fresh Comparator per input row in offer()'s
  // heap-full path (ADVICE r14)
  @transient private lazy val cmp: java.util.Comparator[Any] =
    if (idIsString)
      java.util.Comparator.naturalOrder[UTF8String]()
        .asInstanceOf[java.util.Comparator[Any]].reversed()
    else
      java.util.Comparator.comparingLong[Any](_.asInstanceOf[Long]).reversed()

  override def createAggregationBuffer(): java.util.PriorityQueue[Any] =
    new java.util.PriorityQueue[Any](math.min(k, 64) + 1, cmp)

  private def offer(buf: java.util.PriorityQueue[Any], v: Any): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (cmp.compare(v, buf.peek()) > 0) { buf.poll(); buf.add(v); () }

  override def update(buf: java.util.PriorityQueue[Any], input: InternalRow): java.util.PriorityQueue[Any] = {
    val i = id.eval(input)
    if (i != null) {
      val iv: Any =
        if (idIsString) i.asInstanceOf[UTF8String].clone()
        else if (idIsInt) i.asInstanceOf[Int].toLong
        else i.asInstanceOf[Long]
      offer(buf, iv)
    }
    buf
  }

  override def merge(a: java.util.PriorityQueue[Any], b: java.util.PriorityQueue[Any]): java.util.PriorityQueue[Any] = {
    val it = b.iterator()
    while (it.hasNext) offer(a, it.next())
    a
  }

  override def eval(buf: java.util.PriorityQueue[Any]): Any = {
    val arr = buf.toArray
    java.util.Arrays.sort(arr, cmp.reversed()) // ascending
    new GenericArrayData(arr.map { v =>
      if (idIsInt) v.asInstanceOf[Long].toInt.asInstanceOf[Any] else v
    })
  }

  override def serialize(buf: java.util.PriorityQueue[Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val v = it.next()
      if (idIsString) {
        val b = v.asInstanceOf[UTF8String].getBytes
        out.writeInt(b.length)
        out.write(b)
      } else out.writeLong(v.asInstanceOf[Long])
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[Any] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var x = 0
    while (x < n) {
      val v: Any = if (idIsString) {
        val b = new Array[Byte](in.readInt())
        in.readFully(b)
        UTF8String.fromBytes(b)
      } else in.readLong()
      offer(buf, v)
      x += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MinKIds =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinKIds =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinKIds =
    copy(id = newChildren(0))

  override def prettyName: String = "min_k_ids"
}
