package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Open-addressing value→count map over double keys (stored as raw
  * bits), the aggregation state of [[ExactPercentilesAgg]]: O(distinct
  * values) longs, grown by doubling.
  */
final class ValueCountMap(initialCap: Int = 64) {
  var keys = new Array[Long](initialCap) // double bits
  var cnts = new Array[Long](initialCap) // 0 = empty slot
  var size = 0

  private def mask: Int = keys.length - 1

  def add(bits: Long, count: Long): Unit = {
    if (size * 2 >= keys.length) grow()
    var idx = (scala.util.hashing.byteswap64(bits).toInt) & mask
    while (true) {
      if (cnts(idx) == 0L) {
        keys(idx) = bits; cnts(idx) = count; size += 1; return
      } else if (keys(idx) == bits) {
        cnts(idx) += count; return
      } else idx = (idx + 1) & mask
    }
  }

  private def grow(): Unit = {
    val ok = keys; val oc = cnts
    keys = new Array[Long](ok.length * 2)
    cnts = new Array[Long](ok.length * 2)
    size = 0
    var i = 0
    while (i < ok.length) {
      if (oc(i) != 0L) add(ok(i), oc(i))
      i += 1
    }
  }
}

/** Exact multi-percentile aggregate with DISTINCT-VALUE-bounded state:
  * `exact_percentiles(value, array(p1, p2, ...))` → `array<double>`,
  * linear interpolation between bracketing order statistics — the same
  * declared semantics as Spark's `percentile()` / `QUANTILE_CONT`, and
  * the same numeric formula as [[graft.ops.Percentiles]] (Spark's
  * `lower*(ceil(t)-t) + upper*(t-floor(t))` at `t = p*(n-1)`), so all
  * three agree bit-for-bit.
  *
  * Why another exact-percentile surface: Spark's `percentile()`
  * buffers EVERY group row (O(rows) on one task — the 100 TB
  * state-explosion), and the rank-selection operator bounds state by
  * distinct values but pays two row-scale hash aggregates plus a
  * window per value column. This aggregate holds a value→count map in
  * the aggregation buffer instead: per-row cost is one open-addressing
  * probe, map-side combine ships one (value, count) pair per distinct
  * value per task, and ALL requested percentiles evaluate from one
  * buffer (sort the ~distinct keys, walk cumulative counts once). One
  * scan, one aggregated exchange, no window.
  *
  * The state bound is O(distinct values) IN ONE BUFFER — the right
  * trade for bounded-domain columns (quantities, 2-dp money: <= ~10^7
  * distinct cents at any corpus size). For genuinely continuous values
  * whose distinct count approaches the row count, the buffer cannot
  * spill — use [[graft.ops.Percentiles]] there, whose per-task sort
  * degrades to disk instead of OOM. Both are exact; the catalog pins
  * them equal.
  *
  * Nulls are excluded ([[update]] skips them); an all-null group
  * evaluates to null, as `percentile()` does.
  *
  * The boundedness contract is ENFORCED, not trusted (r14, the
  * SemDeDup over-cap convention): a buffer that exceeds `maxDistinct`
  * distinct values aborts the query with an actionable message naming
  * the rank-selection operator, instead of silently marching an
  * executor toward OOM when a caller points this aggregate at a
  * continuous column. The default cap (2^24 ≈ 1.6·10^7 entries, ≤
  * ~768 MB of map arrays at the 2× load factor) clears every bounded
  * domain the scaladoc promises (~10^7 distinct cents) with room.
  */
case class ExactPercentilesAgg(
    child: Expression,
    ps: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
    maxDistinct: Int = ExactPercentilesAgg.DefaultMaxDistinct)
  extends TypedImperativeAggregate[ValueCountMap] {

  require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
    s"percentiles must be in [0,1]: $ps")
  require(maxDistinct > 0, s"maxDistinct must be positive: $maxDistinct")

  private def checkCap(buf: ValueCountMap): ValueCountMap = {
    if (buf.size > maxDistinct) throw new IllegalStateException(
      s"exact_percentiles: aggregation buffer exceeded $maxDistinct " +
        "distinct values — this column's domain is not bounded, and the " +
        "count-map state would approach O(rows). Use the rank-selection " +
        "operator graft.ops.Percentiles (spills instead of buffering) " +
        "for continuous columns, or raise the cap explicitly if the " +
        "domain really is this large.")
    buf
  }

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a double argument, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "exact_percentiles"

  override def createAggregationBuffer(): ValueCountMap = new ValueCountMap()

  // The hot-path child after binding is a BoundReference over a double
  // column; its interpreted eval() boxes every row's value (the accessor
  // returns Any). Read the primitive directly in that case — update()
  // runs once per input row per aggregate inside ObjectHashAggregate's
  // interpreted loop, so one allocation per row is the dominant
  // avoidable cost of this surface (r15, q50 attribution).
  private lazy val directOrdinal: Int = child match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference
        if b.dataType == DoubleType => b.ordinal
    case _ => -1
  }

  override def update(buf: ValueCountMap, input: InternalRow): ValueCountMap = {
    val ord = directOrdinal
    if (ord >= 0) {
      if (!input.isNullAt(ord))
        buf.add(java.lang.Double.doubleToLongBits(input.getDouble(ord)), 1L)
    } else {
      val v = child.eval(input)
      if (v != null)
        buf.add(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]), 1L)
    }
    checkCap(buf)
  }

  override def merge(buf: ValueCountMap, other: ValueCountMap): ValueCountMap = {
    var i = 0
    while (i < other.keys.length) {
      if (other.cnts(i) != 0L) buf.add(other.keys(i), other.cnts(i))
      i += 1
    }
    checkCap(buf)
  }

  override def eval(buf: ValueCountMap): Any = {
    if (buf.size == 0) return null
    // compact, sort by VALUE (doubles; money/quantity data — no NaN)
    val vs = new Array[Double](buf.size)
    val cs = new Array[Long](buf.size)
    var i = 0; var o = 0
    while (i < buf.keys.length) {
      if (buf.cnts(i) != 0L) {
        vs(o) = java.lang.Double.longBitsToDouble(buf.keys(i))
        cs(o) = buf.cnts(i)
        o += 1
      }
      i += 1
    }
    // indirect sort by value
    val order = Array.range(0, buf.size).sortBy(vs(_))
    var n = 0L
    i = 0
    while (i < cs.length) { n += cs(i); i += 1 }
    val out = new Array[Double](ps.length)
    var pi = 0
    while (pi < ps.length) {
      val t = ps(pi) * (n - 1)
      val lo = math.floor(t).toLong
      val hi = math.ceil(t).toLong
      // walk cumulative counts to the bracketing values
      var cum = 0L
      var j = 0
      var lv = 0.0
      var hv = 0.0
      var needLo = true
      var needHi = true
      while (j < order.length && (needLo || needHi)) {
        val prev = cum
        cum += cs(order(j))
        // value j covers 0-indexed positions [prev, cum)
        if (needLo && lo >= prev && lo < cum) { lv = vs(order(j)); needLo = false }
        if (needHi && hi >= prev && hi < cum) { hv = vs(order(j)); needHi = false }
        j += 1
      }
      out(pi) = lv * (lo + 1 - t) + hv * (t - lo)
      pi += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: ValueCountMap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val outS = new DataOutputStream(bos)
    outS.writeInt(buf.size)
    var i = 0
    while (i < buf.keys.length) {
      if (buf.cnts(i) != 0L) {
        outS.writeLong(buf.keys(i)); outS.writeLong(buf.cnts(i))
      }
      i += 1
    }
    outS.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ValueCountMap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ValueCountMap(math.max(64,
      java.lang.Integer.highestOneBit(math.max(1, n * 2 - 1)) * 2))
    var i = 0
    while (i < n) { buf.add(in.readLong(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactPercentilesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExactPercentilesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object ExactPercentilesAgg {
  /** 2^24 distinct values — clears any 2-dp money / quantity domain;
    * an abort above this means the column is effectively continuous. */
  val DefaultMaxDistinct: Int = 1 << 24
}

object ExactPercentilesF {
  private val name = "exact_percentiles"

  /** Evaluate a foldable numeric-array expression to doubles — SQL
    * literals like `array(0.5)` arrive as DECIMAL arrays, Column-built
    * ones as doubles.
    */
  def psArg(e: Expression): Seq[Double] = {
    val arr = e.eval().asInstanceOf[ArrayData]
    val et = e.dataType.asInstanceOf[ArrayType].elementType
    arr.toObjectArray(et).toSeq.map {
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case n: java.lang.Number => n.doubleValue()
      case other => throw new IllegalArgumentException(
        s"exact_percentiles: non-numeric percentile $other")
    }
  }

  /** `exact_percentiles(value, ps[, maxDistinct])` — the optional third
    * (foldable int) argument overrides the distinct-value abort cap.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => {
        val base = ExactPercentilesAgg(exprs(0), psArg(exprs(1)))
        if (exprs.length >= 3)
          base.copy(maxDistinct =
            exprs(2).eval().asInstanceOf[Number].intValue())
        else base
      },
      "built-in")

  /** `exactPercentiles(value, ps)`: array of exact linear-interpolation
    * percentiles, in `ps` order.
    */
  def exactPercentiles(value: Column, ps: Seq[Double]): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function(name, value,
      org.apache.spark.sql.functions.array(
        ps.map(org.apache.spark.sql.functions.lit): _*))
  }
}
