package graft.text

import graft.SparkSpec

class TfidfSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "srcA", "cat cat dog"),
    (2L, "srcA", "cat fish"),
    (3L, "srcB", "dog dog dog bird"),
    (4L, "srcB", "bird")
  ).toDF("doc_id", "source", "text")

  test("df counts documents, tf counts occurrences, score = tf * N/df") {
    val out = Tfidf.topTermsBySource(docs, 5)
      .orderBy("source", "rnk")
      .as[(String, Int, String, Long, Long, Double)].collect()
    val a = out.filter(_._1 == "srcA")
    // srcA tf: cat=3, dog=1, fish=1 ; df: cat=2, dog=2, fish=1, bird=2 ; N=4
    assert(a.head == (("srcA", 1, "cat", 3L, 2L, 3.0 * (4.0 / 2.0))))
    // dog: 1*(4/2)=2.0, fish: 1*(4/1)=4.0 -> fish outranks dog
    assert(a(1)._3 == "fish" && a(1)._6 == 4.0)
    assert(a(2)._3 == "dog" && a(2)._6 == 2.0)
  }

  test("ties break by term ascending") {
    val tied = Seq((1L, "s", "b a"), (2L, "s", "a b"))
      .toDF("doc_id", "source", "text")
    val out = Tfidf.topTermsBySource(tied, 5)
      .orderBy("rnk").as[(String, Int, String, Long, Long, Double)].collect()
    assert(out.map(_._3).toSeq == Seq("a", "b"))
  }

  test("k truncates per source independently") {
    val out = Tfidf.topTermsBySource(docs, 1).collect()
    assert(out.length == 2)
  }
}
