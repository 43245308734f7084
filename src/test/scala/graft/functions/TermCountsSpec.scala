package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.TextAnalysis

class TermCountsSpec extends SparkSpec {
  import spark.implicits._

  test("matches the declared explode-and-count derivation on real data") {
    val docs = graft.Tables(spark, sf, "documents").limit(300)
    val got = docs.select(col("doc_id"),
        explode(TermCounts.termCounts(col("text"))).as("tc"))
      .select(col("doc_id"), col("tc.term").as("term"), col("tc.cnt").as("cnt"))
      .orderBy("doc_id", "term")
      .as[(Long, String, Int)].collect()
    val want = docs.select(col("doc_id"),
        explode(TextAnalysis.wsTokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).cast("int").as("cnt"))
      .orderBy("doc_id", "term")
      .as[(Long, String, Int)].collect()
    assert(got.toSeq == want.toSeq)
  }

  test("ws_token_count == size(wsTokens) on real data and edges") {
    val docs = graft.Tables(spark, sf, "documents")
    val bad = docs.select(
        TermCounts.wsTokenCount(col("text")).as("fast"),
        size(TextAnalysis.wsTokens(col("text"))).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(bad == 0)
    val edges = Seq("", " ", "a", " a  b\t\r\nc ", "héllo wörld")
      .toDF("text")
      .select(TermCounts.wsTokenCount(col("text")).as("n"))
      .as[Int].collect()
    assert(edges.toSeq == Seq(0, 0, 1, 3, 2))
  }

  test("edges: empty, blanks, repeats, multi-byte; null propagates") {
    val got = Seq((1L, "a b a a b c"), (2L, ""), (3L, "   "),
        (4L, "héllo héllo wörld"))
      .toDF("id", "text")
      .select(col("id"), TermCounts.termCounts(col("text")).as("tc"))
      .select(col("id"), expr("array_sort(transform(tc, x -> x.term))").as("ts"),
        expr("aggregate(tc, 0, (a, x) -> a + x.cnt)").as("total"))
      .orderBy("id").as[(Long, Seq[String], Int)].collect()
    assert(got(0) == ((1L, Seq("a", "b", "c"), 6)))
    assert(got(1) == ((2L, Seq(), 0)) && got(2) == ((3L, Seq(), 0)))
    assert(got(3) == ((4L, Seq("héllo", "wörld"), 3)))
    val nulls = Seq[Option[String]](None).toDF("text")
      .select(TermCounts.termCounts(col("text"))).collect()
    assert(nulls(0).isNullAt(0))
  }
}
