package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.catalyst.expressions.XXH64

/** KMV (k-minimum-values) sketch as a `TypedImperativeAggregate` — the
  * buffer-based custom-aggregation tier (SURVEY §2.9's third surface,
  * next to the codegen Expression and the typed Aggregator/udaf).
  *
  * Keeps the k inputs with the smallest hash values. Because "k smallest
  * hashes" is a pure set property, the result is DETERMINISTIC under any
  * partitioning, ordering, or cluster size — which is what makes it the
  * right distributed uniform-sampling primitive (unlike reservoir
  * sampling, whose output depends on encounter order). The same sketch
  * yields a distinct-count estimate: (k-1) / max_normalized_hash.
  *
  * Buffers are tiny (k pairs of longs) and merge by union+truncate, so
  * Catalyst plans partial+final aggregation with map-side combine.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeMap[Long, Long]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_sample requires a bigint column, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sample"

  override def createAggregationBuffer(): mutable.TreeMap[Long, Long] =
    mutable.TreeMap.empty[Long, Long]

  private def insert(buf: mutable.TreeMap[Long, Long], h: Long, v: Long): Unit = {
    buf.update(h, v)
    if (buf.size > k) buf.remove(buf.lastKey)
  }

  override def update(buf: mutable.TreeMap[Long, Long],
                      input: InternalRow): mutable.TreeMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Long]
      insert(buf, XXH64.hashLong(id, 42), id)
    }
    buf
  }

  override def merge(buf: mutable.TreeMap[Long, Long],
                     other: mutable.TreeMap[Long, Long]): mutable.TreeMap[Long, Long] = {
    other.foreach { case (h, v) => insert(buf, h, v) }
    buf
  }

  /** Sampled values, ordered by their hash (a uniform shuffle order). */
  override def eval(buf: mutable.TreeMap[Long, Long]): Any =
    new GenericArrayData(buf.values.toArray)

  override def serialize(buf: mutable.TreeMap[Long, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (h, v) => out.writeLong(h); out.writeLong(v) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeMap[Long, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeMap.empty[Long, Long]
    (0 until n).foreach(_ => buf.update(in.readLong(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Distinct-count estimate from the same KMV buffer: with k minimum
  * normalized hashes, E[distinct] ≈ (k-1) / max_kth_normalized_hash.
  * Exact when fewer than k distinct values were seen. Deterministic
  * (unlike HLL implementations it can be cross-checked bit-for-bit).
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeMap[Long, Long]] {

  private val impl = KmvSketch(child, k)

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = impl.checkInputDataTypes()
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): mutable.TreeMap[Long, Long] =
    impl.createAggregationBuffer()
  override def update(buf: mutable.TreeMap[Long, Long], input: InternalRow): mutable.TreeMap[Long, Long] =
    impl.update(buf, input)
  override def merge(buf: mutable.TreeMap[Long, Long], other: mutable.TreeMap[Long, Long]): mutable.TreeMap[Long, Long] =
    impl.merge(buf, other)
  override def serialize(buf: mutable.TreeMap[Long, Long]): Array[Byte] =
    impl.serialize(buf)
  override def deserialize(bytes: Array[Byte]): mutable.TreeMap[Long, Long] =
    impl.deserialize(bytes)

  override def eval(buf: mutable.TreeMap[Long, Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else {
      // normalize the kth-smallest hash into (0,1): shift signed min-value
      // origin so the full unsigned hash range maps to [0,1)
      val kth = (buf.lastKey.toDouble - Long.MinValue.toDouble) /
        (Long.MaxValue.toDouble - Long.MinValue.toDouble)
      (k - 1) / kth
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object Sketches {
  private val name = "kmv_sample"
  private val distinctName = "kmv_distinct"

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => KmvSketch(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      distinctName,
      exprs => KmvDistinct(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
  }

  /** `kmvSample(col, k)`: deterministic k-element uniform sample. */
  def kmvSample(c: Column, k: Int): Column =
    call_function(name, c, org.apache.spark.sql.functions.lit(k))

  /** `kmvDistinct(col, k)`: deterministic distinct-count estimate. */
  def kmvDistinct(c: Column, k: Int): Column =
    call_function(distinctName, c, org.apache.spark.sql.functions.lit(k))
}
