package graft.text

import graft.SparkSpec

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[String], minCount: Long = 1L, k: Int = 100,
                  key: Option[String] = None) =
    Collocations.topBigramsByLift(
        rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"),
        minCount, k, key)
      .as[(String, Long, Long, Long, Double)].collect().toSeq

  test("hand-checked lifts: p(xy)/(p(x)p(y)) over exact counts") {
    // docs: [a b a b], [c c] -> uni a=2 b=2 c=2 (N=6); bi ab=2 ba=1 cc=1 (N=4)
    val out = run(Seq("a b a b", "c c"))
    val byBigram = out.map(r => r._1 -> r).toMap
    assert(byBigram("a b") == (("a b", 2L, 2L, 2L,
      (2.0 / 4.0) / ((2.0 / 6.0) * (2.0 / 6.0)))))
    assert(byBigram("b a")._5 == (1.0 / 4.0) / ((2.0 / 6.0) * (2.0 / 6.0)))
    assert(byBigram("c c")._5 == byBigram("b a")._5,
      "same counts, same lift")
    assert(out.map(_._1) == Seq("a b", "b a", "c c"),
      "lift desc, ties by bigram text")
  }

  test("minCount prunes the rare tail before ranking") {
    val out = run(Seq("a b a b", "c c"), minCount = 2L)
    assert(out.map(_._1) == Seq("a b"))
  }

  test("bigrams never cross document boundaries; short docs contribute none") {
    val out = run(Seq("a", "", "b", "a b"))
    assert(out.map(_._1) == Seq("a b"), "only the in-doc adjacency counts")
    assert(out.head._2 == 1L)
  }

  test("memoized and plain paths agree; k truncates deterministically") {
    val docs = Seq("x y x y z", "y z y z", "z x")
    val plain = run(docs, k = 3)
    val memo = run(docs, k = 3, key = Some(s"colspec:${System.nanoTime()}"))
    assert(plain == memo)
    assert(plain.size == 3)
  }
}
