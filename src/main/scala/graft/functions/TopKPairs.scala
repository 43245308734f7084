package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Grouped top-k as a bounded-buffer `TypedImperativeAggregate`: the
  * per-group ranking `row_number().over(partitionBy(g).orderBy(...)) <= k`
  * re-expressed as an aggregation, for the case where only the top k
  * rows are wanted (k small, groups few-to-many).
  *
  * Why not the window (q51's form, which stays in the catalog as the
  * ranking-semantics surface): even with Spark's partial
  * `WindowGroupLimit` pushdown — which already bounds what crosses the
  * exchange — the window form must SORT each map partition's full frame
  * to find its local top k (O(n log n) in partition size). The
  * aggregate form keeps a k-element ordered buffer per (group, task)
  * and streams the input through it: O(n log k) with k tiny, no sort
  * operator anywhere, and map-side combine ships at most k pairs per
  * (group, task) — the same exchange bound, minus the sort. Buffers
  * are k (double, long) pairs, so a skewed group costs memory k, not
  * its row count.
  *
  * Ordering is (score DESC, id ASC) — ties broken by the id, matching
  * `ORDER BY score DESC, id` row_number semantics. Result is an
  * `array<struct<score double, id bigint>>` in rank order, so
  * `posexplode` reconstructs (rank, id, score) rows exactly.
  */
case class TopKPairs(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[(Double, Long)]] {

  require(k > 0, "top_k_pairs requires k > 0")

  override def children: Seq[Expression] = Seq(score, id)

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_pairs requires (double score, bigint id), got " +
        s"${score.dataType.simpleString}/${id.dataType.simpleString}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_pairs"

  /** Rank order: higher score first, then smaller id. */
  private implicit val rankOrder: Ordering[(Double, Long)] =
    Ordering.fromLessThan { case ((s1, i1), (s2, i2)) =>
      s1 > s2 || (s1 == s2 && i1 < i2)
    }

  override def createAggregationBuffer(): mutable.TreeSet[(Double, Long)] =
    mutable.TreeSet.empty[(Double, Long)]

  private def insert(buf: mutable.TreeSet[(Double, Long)],
                     s: Double, i: Long): Unit = {
    buf.add((s, i))
    if (buf.size > k) buf.remove(buf.last)
  }

  override def update(buf: mutable.TreeSet[(Double, Long)],
                      input: InternalRow): mutable.TreeSet[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      insert(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.TreeSet[(Double, Long)],
                     other: mutable.TreeSet[(Double, Long)]): mutable.TreeSet[(Double, Long)] = {
    other.foreach { case (s, i) => insert(buf, s, i) }
    buf
  }

  override def eval(buf: mutable.TreeSet[(Double, Long)]): Any =
    new GenericArrayData(buf.toSeq.map { case (s, i) =>
      InternalRow(s, i)
    })

  override def serialize(buf: mutable.TreeSet[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.add((in.readDouble(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopK {
  private val name = "top_k_pairs"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => TopKPairs(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[Number].intValue()),
      "built-in")

  private def ensureRegistered(): Unit =
    SparkSession.getActiveSession.foreach(register)

  /** `topKPairs(score, id, k)`: rank-ordered top-k (score desc, id asc)
    * as `array<struct<score, id>>`; pair with `posexplode` for rows.
    */
  def topKPairs(score: Column, id: Column, k: Int): Column = {
    ensureRegistered()
    call_function(name, score, id, org.apache.spark.sql.functions.lit(k))
  }
}
