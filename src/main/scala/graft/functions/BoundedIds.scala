package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `bounded_ids(id, max)` → `array<bigint>` or NULL: collect a bucket's
  * ids with HARD-BOUNDED state — at most `max + 1` longs per buffer, no
  * matter how degenerate the bucket. A bucket that exceeds `max` ids
  * evaluates to NULL (the caller filters those out), which reproduces
  * the hot-bucket cap semantics of counting first and anti-joining the
  * hot keys away — but in the SAME aggregation pass that gathers the
  * bucket, instead of a separate count job plus a two-sided join.
  *
  * This is what makes a groupBy-then-expand LSH candidate stage safe at
  * 100 TB: a plain `collect_list` would materialize a
  * boilerplate-saturated bucket's millions of ids in one aggregation
  * buffer before any size check could run; this buffer stops growing at
  * `max + 1` (the +1 distinguishes "exactly max" from "overflowed") and
  * merge preserves saturation. Buffers are longs-only and merge by
  * append+truncate, so Catalyst plans partial+final aggregation with
  * map-side combine.
  *
  * The collected ORDER is partitioning-dependent (like collect_list);
  * callers must not depend on it — the LSH pair expansion normalizes
  * with least/greatest + distinct, making the emitted pair SET
  * deterministic.
  */
case class BoundedIds(
    child: Expression,
    max: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedIds.Buffer] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bounded_ids requires a bigint id column, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // overflowed bucket -> null
  override def prettyName: String = "bounded_ids"

  // max + 1 in long space: callers may pass max = Int.MaxValue (an
  // effectively-uncapped bucket), where int arithmetic would overflow
  private def satN: Int = math.min(max.toLong + 1, Int.MaxValue.toLong).toInt

  override def createAggregationBuffer(): BoundedIds.Buffer =
    new BoundedIds.Buffer(new Array[Long](math.min(satN, 16)), 0)

  private def append(buf: BoundedIds.Buffer, v: Long): Unit = {
    if (buf.n <= max) { // stop growing once saturated (n == max + 1)
      if (buf.n == buf.ids.length) {
        val grown = new Array[Long](
          math.min(math.min(buf.ids.length * 2L, satN.toLong),
            Int.MaxValue.toLong).toInt)
        System.arraycopy(buf.ids, 0, grown, 0, buf.n)
        buf.ids = grown
      }
      buf.ids(buf.n) = v
      buf.n += 1
    }
  }

  override def update(buf: BoundedIds.Buffer, input: InternalRow): BoundedIds.Buffer = {
    val v = child.eval(input)
    if (v != null) append(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BoundedIds.Buffer, other: BoundedIds.Buffer): BoundedIds.Buffer = {
    if (other.n > max) buf.n = satN // saturated buffers carry no ids
    else {
      var i = 0
      while (i < other.n && buf.n <= max) { append(buf, other.ids(i)); i += 1 }
    }
    buf
  }

  override def eval(buf: BoundedIds.Buffer): Any =
    if (buf.n > max) null
    else new GenericArrayData(java.util.Arrays.copyOf(buf.ids, buf.n))

  // A saturated buffer (n > max) serializes as its count alone — its ids
  // are never read again (merge propagates the saturation, eval is null).
  override def serialize(buf: BoundedIds.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.n)
    if (buf.n <= max) {
      var i = 0
      while (i < buf.n) { out.writeLong(buf.ids(i)); i += 1 }
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedIds.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    if (n > max) new BoundedIds.Buffer(new Array[Long](0), n)
    else {
      val ids = new Array[Long](math.max(n, 1))
      var i = 0
      while (i < n) { ids(i) = in.readLong(); i += 1 }
      new BoundedIds.Buffer(ids, n)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedIds =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedIds =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object BoundedIds {
  /** Growable long buffer; `n` saturates at `max + 1` to mark overflow. */
  final class Buffer(var ids: Array[Long], var n: Int)

  /** Column API over the registered function (see [[Texts.register]]). */
  def boundedIds(id: Column, max: Int): Column =
    call_function("bounded_ids", id, org.apache.spark.sql.functions.lit(max))
}
