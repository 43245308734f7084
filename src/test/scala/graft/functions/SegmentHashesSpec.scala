package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.TextAnalysis

class SegmentHashesSpec extends SparkSpec {
  import spark.implicits._

  private def columnForm(text: org.apache.spark.sql.Column, w: Int) = {
    // the declared Column derivation the expression must match
    val toks = TextAnalysis.wsTokens(text)
    val nSeg = ceil(size(toks).cast("double") / w).cast("int")
    val slices = when(size(toks) === 0, array().cast("array<array<string>>"))
      .otherwise(transform(sequence(lit(0), nSeg - 1),
        i => slice(toks, i * w + 1, lit(w))))
    transform(slices, t => unhex(md5(array_join(t, " "))))
  }

  test("matches the Column md5-of-joined-slice derivation on real data") {
    val docs = graft.Tables(spark, sf, "documents").limit(300)
    val bad = docs.select(
        SegmentHashing.segmentHashes(col("text"), 16).as("fast"),
        columnForm(col("text"), 16).as("slow"))
      .filter(not(col("fast") === col("slow"))).count()
    assert(bad == 0)
  }

  test("edge shapes: empty, blanks, tails, multi-byte, exotic whitespace") {
    val edge = Seq("", "   ", "a", "a b c", "a\tb\r\nc d\fe",
      "héllo wörld x y z", "one two three four five").toDF("text")
    for (w <- Seq(1, 2, 3, 16)) {
      val bad = edge.select(
          SegmentHashing.segmentHashes(col("text"), w).as("fast"),
          columnForm(col("text"), w).as("slow"))
        .filter(not(col("fast") === col("slow"))).count()
      assert(bad == 0, s"w=$w")
    }
  }

  test("null text propagates null") {
    val got = Seq[Option[String]](None).toDF("text")
      .select(SegmentHashing.segmentHashes(col("text"), 4).as("h"))
      .collect()
    assert(got(0).isNullAt(0))
  }
}
