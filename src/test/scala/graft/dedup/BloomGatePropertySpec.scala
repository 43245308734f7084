package graft.dedup

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.TestSession

/** ScalaCheck pin of the Bloom gate's exactness claim: for ANY store
  * content, batch content, and filter layout, [[Dedup.exactGateBloom]]
  * returns exactly [[Dedup.exactGate]]'s rows — the no-false-negative
  * property is what lets an approximate sketch split an exact pipeline,
  * and this holds regardless of overlap fraction, duplicate ids inside
  * the batch, or a deliberately undersized (high-fpp) filter, which may
  * only push more rows through the verify join, never change the
  * output.
  */
object BloomGatePropertySpec extends Properties("BloomGate") {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val seq = new java.util.concurrent.atomic.AtomicInteger(0)

  private val scenario: Gen[(Seq[String], Seq[(Long, String)], Long)] = for {
    universe <- Gen.chooseNum(3, 30) // distinct texts in play
    storeN <- Gen.chooseNum(0, 20)
    store <- Gen.listOfN(storeN, Gen.chooseNum(0, universe - 1))
    batchN <- Gen.chooseNum(1, 40)
    batch <- Gen.listOfN(batchN,
      Gen.zip(Gen.chooseNum(0L, 1000L), Gen.chooseNum(0, universe - 1)))
    // deliberately tiny layouts too: high fpp must not change the output
    items <- Gen.oneOf(2L, 16L, 4096L)
  } yield (store.distinct.map(i => s"text $i"),
    batch.map { case (id, t) => (id, s"text $t") }, items)

  private val shardedScenario
      : Gen[((Seq[String], Seq[(Long, String)], Long), Int)] =
    Gen.zip(scenario, Gen.oneOf(1, 2, 3, 8))

  property("exactGateBloom == exactGate for any store/batch/layout") =
    forAll(scenario) { case (storeTexts, batchRows, items) =>
      val tag = seq.incrementAndGet()
      val table = s"bloomprop_$tag"
      val path = new java.io.File(sys.props("java.io.tmpdir"), table).getPath
      val batch = batchRows.toDF("doc_id", "text")
      if (storeTexts.nonEmpty)
        Dedup.exactIncremental(
          storeTexts.zipWithIndex.map { case (t, i) => (i.toLong + 5000L, t) }
            .toDF("doc_id", "text"),
          "doc_id", "text", table, path)
      val expected = Dedup.exactGate(batch, "doc_id", "text", table)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Array[Byte]]("text_hash").toSeq).toSet
      val bloomed = Dedup.storeBloom(spark, table, items) match {
        case None => expected // no store -> gate degenerates; nothing to pin
        case Some(bf) =>
          Dedup.exactGateBloom(batch, "doc_id", "text", table, bf)
            .collect()
            .map(r => r.getAs[Long]("doc_id") ->
              r.getAs[Array[Byte]]("text_hash").toSeq).toSet
      }
      spark.sql(s"DROP TABLE IF EXISTS $table")
      bloomed == expected
    }

  property("exactGateBloomSharded == exactGate for any store/batch/layout/shards") =
    forAll(shardedScenario) { case ((storeTexts, batchRows, items), nShards) =>
      val tag = seq.incrementAndGet()
      val table = s"bloomshardprop_$tag"
      val path = new java.io.File(sys.props("java.io.tmpdir"), table).getPath
      val batch = batchRows.toDF("doc_id", "text")
      if (storeTexts.nonEmpty)
        Dedup.exactIncremental(
          storeTexts.zipWithIndex.map { case (t, i) => (i.toLong + 5000L, t) }
            .toDF("doc_id", "text"),
          "doc_id", "text", table, path)
      val expected = Dedup.exactGate(batch, "doc_id", "text", table)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Array[Byte]]("text_hash").toSeq).toSet
      val sharded = Dedup.storeBloomSharded(spark, table, items, nShards) match {
        case None => expected // no store -> gate degenerates; nothing to pin
        case Some(shards) =>
          Dedup.exactGateBloomSharded(batch, "doc_id", "text", table, shards)
            .collect()
            .map(r => r.getAs[Long]("doc_id") ->
              r.getAs[Array[Byte]]("text_hash").toSeq).toSet
      }
      spark.sql(s"DROP TABLE IF EXISTS $table")
      sharded == expected
    }
}
