package graft.ops

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.TestSession

/** ScalaCheck pin of the segment gate's Bloom-split exactness: for ANY
  * store corpus, batch corpus, window width, and filter layout,
  * [[Segments.segmentGateRowsBloom]] flags exactly the rows
  * [[Segments.segmentGateRows]] does — a deliberately undersized
  * (high-fpp) filter may only push more segment rows through the verify
  * join, never change which segments are kept.
  */
object SegmentBloomPropertySpec extends Properties("SegmentBloomGate") {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val seq = new java.util.concurrent.atomic.AtomicInteger(0)

  // small vocab so windows collide across store and batch often
  private val docGen: Gen[String] =
    Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))

  private val scenario
      : Gen[(List[String], List[String], Int, Long)] = for {
    store <- Gen.choose(0, 5).flatMap(n => Gen.listOfN(n, docGen))
    batch <- Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, docGen))
    w <- Gen.oneOf(1, 2, 3)
    // deliberately tiny layouts too: high fpp must not change the output
    items <- Gen.oneOf(2L, 16L, 4096L)
  } yield (store, batch, w, items)

  private def flagged(df: org.apache.spark.sql.DataFrame)
      : Set[(Long, Option[Int], Option[String], Boolean)] =
    df.select("doc_id", "seg_no", "seg", "isKept")
      .as[(Long, Option[Int], Option[String], Boolean)].collect().toSet

  property("segmentGateRowsBloom == segmentGateRows for any store/batch/w/layout") =
    forAll(scenario) { case (storeTexts, batchTexts, w, items) =>
      val tag = seq.incrementAndGet()
      val table = s"segbloomprop_$tag"
      val path = new java.io.File(sys.props("java.io.tmpdir"), table).getPath
      def toDf(texts: List[String], base: Long) =
        texts.zipWithIndex.map { case (t, i) => (base + i, t) }
          .toDF("doc_id", "text")
      try {
        if (storeTexts.nonEmpty)
          Segments.dedupSegmentsIncremental(toDf(storeTexts, 5000L), w,
            table, path)
        val batch = toDf(batchTexts, 0L)
        val expected = flagged(Segments.segmentGateRows(batch, w, table))
        graft.dedup.Dedup.storeBloom(spark, table, items) match {
          case None => true // no/empty store: gate degenerates, nothing to pin
          case Some(bf) => expected == flagged(
            Segments.segmentGateRowsBloom(batch, w, table, bf))
        }
      } finally spark.sql(s"DROP TABLE IF EXISTS $table")
    }
}
