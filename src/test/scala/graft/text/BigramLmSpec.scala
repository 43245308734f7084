package graft.text

import graft.SparkSpec

class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def score(rows: (Long, String)*) =
    BigramLm.fluencyScores(rows.toDF("doc_id", "text"))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq

  test("hand-checked conditional micro-points") {
    // corpus: "a b", "a b", "a c" -> c_first(a)=3; micro(b|a) =
    // 2e6 div 3 = 666666, micro(c|a) = 1e6 div 3 = 333333
    val out = score(0L -> "a b", 1L -> "a b", 2L -> "a c")
    assert(out == Seq(
      (0L, 1L, 666666L, 666666.0),
      (1L, 1L, 666666L, 666666.0),
      (2L, 1L, 333333L, 333333.0)))
  }

  test("repeated bigrams weight the sum; fluency is the exact mean") {
    // one doc: "a b a b" -> bigrams ab, ba, ab; c_first(a)=2 (ab x2),
    // c_first(b)=1 (ba) -> micro(b|a) = 2e6 div 2 = 1e6, micro(a|b) = 1e6
    val out = score(0L -> "a b a b")
    assert(out == Seq((0L, 3L, 3000000L, 1000000.0)))
  }

  test("documents with no bigram are absent; per-doc isolation") {
    val out = score(0L -> "solo", 1L -> "", 2L -> "x y")
    assert(out.map(_._1) == Seq(2L))
    assert(out.head == ((2L, 1L, 1000000L, 1000000.0)),
      "a single-occurrence transition is certain under its own model")
  }

  test("an incoherent document ranks least fluent") {
    // "the cat sat" x3 trains strong transitions; the shuffled-word doc
    // uses transitions seen once out of many
    val docs = Seq(
      0L -> "the cat sat on the mat",
      1L -> "the cat sat on the mat",
      2L -> "the cat sat on the mat",
      3L -> "mat the sat cat on the")
    val least = BigramLm.leastFluent(docs.toDF("doc_id", "text"), 1)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(least.head._1 == 3L)
  }

  test("transfer scoring: OOV transitions score zero, not drop out") {
    val ref = Seq(0L -> "a b", 1L -> "a b", 2L -> "a c")
      .toDF("doc_id", "text")
    val batch = Seq(
      10L -> "a b",       // fully in-model: micro(b|a) = 666666
      11L -> "a z",       // OOV transition -> 0
      12L -> "a b a z")   // mixed: ab=666666, ba OOV=0, az OOV=0
      .toDF("doc_id", "text")
    val out = BigramLm.scoreAgainst(BigramLm.trainModel(ref), batch)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (10L, 1L, 666666L, 666666.0),
      (11L, 1L, 0L, 0.0),
      (12L, 3L, 666666L, 666666.0 / 3.0)))
  }

  test("self-scoring == train-then-score with the same corpus") {
    val d = Seq(0L -> "the cat sat", 1L -> "the cat ran", 2L -> "a b a b")
      .toDF("doc_id", "text")
    val self = BigramLm.fluencyScores(d).orderBy("doc_id").collect().toSeq
    val split = BigramLm.scoreAgainst(BigramLm.trainModel(d), d)
      .orderBy("doc_id").collect().toSeq
    assert(self == split)
  }

  test("hashed and text join keys agree; determinism under repartition") {
    val d = Seq(
      0L -> "the quick brown fox jumps over the lazy dog",
      1L -> "the quick brown cat sleeps",
      2L -> "dog dog dog the the quick",
      3L -> "completely unrelated words here").toDF("doc_id", "text")
    val h = BigramLm.fluencyScores(d, useHashKey = true)
      .orderBy("doc_id").collect().toSeq
    val t = BigramLm.fluencyScores(d, useHashKey = false)
      .orderBy("doc_id").collect().toSeq
    assert(h == t)
    val r = BigramLm.fluencyScores(d.repartition(7), useHashKey = true)
      .orderBy("doc_id").collect().toSeq
    assert(r == h)
  }
}
