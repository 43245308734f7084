package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HybridRetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def list(rows: (Long, Int)*) = rows.toDF("id", "rank")

  test("hand-checked fusion: nano-point reciprocals, both-list bonus") {
    // list A: 1,2,3  list B: 2,3,4
    val out = HybridRetrieval.rrfFuse(
        Seq(list(1L -> 1, 2L -> 2, 3L -> 3), list(2L -> 1, 3L -> 2, 4L -> 3)),
        k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    def p(r: Int) = 1000000000L / (60L + r)
    assert(out == Seq(
      (2L, 2L, p(2) + p(1)), // in both lists, near the top of each
      (3L, 2L, p(3) + p(2)),
      (1L, 1L, p(1)), // a single high rank loses to two mid ranks
      (4L, 1L, p(3))))
  }

  test("ties in fused score break by id; k truncates") {
    // symmetric ranks -> equal scores for 1 and 2
    val out = HybridRetrieval.rrfFuse(
        Seq(list(1L -> 1, 2L -> 2), list(2L -> 1, 1L -> 2)), k = 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L,
      1000000000L / 61L + 1000000000L / 62L)))
  }

  test("single list degrades to the list itself; empty rejected") {
    val out = HybridRetrieval.rrfFuse(Seq(list(7L -> 1, 9L -> 2)), k = 5)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.map(_._1) == Seq(7L, 9L))
    intercept[IllegalArgumentException] {
      HybridRetrieval.rrfFuse(Seq.empty, k = 5)
    }
  }

  test("ranked() derives 1-based ranks from the arm's own ordering") {
    val arm = Seq((10L, 500L), (11L, 900L), (12L, 900L))
      .toDF("doc_id", "score")
    val out = HybridRetrieval.ranked(arm, "doc_id",
        col("score").desc, col("doc_id").asc)
      .orderBy("rank").as[(Long, Int)].collect().toSeq
    assert(out == Seq((11L, 1), (12L, 2), (10L, 3)))
  }

  test("fusion is deterministic under repartitioning") {
    val a = list(1L -> 1, 2L -> 2, 3L -> 3).repartition(5)
    val b = list(3L -> 1, 1L -> 2, 5L -> 3).repartition(3)
    val r1 = HybridRetrieval.rrfFuse(Seq(a, b), k = 10).collect().toSeq
    val r2 = HybridRetrieval.rrfFuse(Seq(a, b), k = 10).collect().toSeq
    assert(r1 == r2 && r1.nonEmpty)
  }
}
