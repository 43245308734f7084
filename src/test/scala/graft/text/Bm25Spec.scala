package graft.text

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def run(docs: DataFrame, terms: Seq[String], k: Int = 10) =
    Bm25.topKFromNarrow(Bm25.narrowForTerms(docs, terms), k)
      .as[(Long, Long, Long)].collect().toSeq

  // hand-computable fixture: 4 docs, dl = 4 each except doc 4
  private val docs = Seq(
    (1L, "cat cat cat cat"),
    (2L, "cat dog dog dog"),
    (3L, "dog dog dog dog"),
    (4L, "cat fish")
  ).toDF("doc_id", "text")

  test("hand-checked score: idf and saturation match the closed form") {
    // N=4, tot=14, avgdl=3.5; term 'cat': df=3, idf=(4-3+0.5)/(3+0.5)=3/7
    // doc 1: tf=4, dl=4 -> core = 4*2.25 / (4 + 1.25*(0.25+0.75*(4/3.5)))
    val avgdl = 14.0 / 4.0
    def score(tf: Long, dl: Long, df: Long): Long = {
      val idf = (4.0 - df + 0.5) / (df + 0.5)
      val core = (tf * 2.25) / (tf + 1.25 * (1.0 - 0.75 + 0.75 * (dl / avgdl)))
      math.floor(idf * core * 1000000.0).toLong
    }
    val out = run(docs, Seq("cat")).map { case (id, _, s) => id -> s }.toMap
    assert(out == Map(
      1L -> score(4, 4, 3), 2L -> score(1, 4, 3), 4L -> score(1, 2, 3)))
  }

  test("multi-term: scores add per term, n_terms counts distinct hits") {
    val out = run(docs, Seq("cat", "dog"))
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(2L)._2 == 2, "doc 2 hits both terms")
    assert(byId(1L)._2 == 1 && byId(3L)._2 == 1)
    val single = (run(docs, Seq("cat")).map(t => t._1 -> t._3).toMap.withDefaultValue(0L),
      run(docs, Seq("dog")).map(t => t._1 -> t._3).toMap.withDefaultValue(0L))
    out.foreach { case (id, _, s) =>
      assert(s == single._1(id) + single._2(id),
        s"doc $id: multi-term sum equals per-term micro sums")
    }
  }

  test("length normalization: same tf ranks the shorter document higher") {
    val d = Seq(
      (1L, "cat dog dog dog dog dog dog dog"),
      (2L, "cat fish")
    ).toDF("doc_id", "text")
    val out = run(d, Seq("cat"))
    assert(out.head._1 == 2L, "tf=1 in a 2-token doc beats tf=1 in 8 tokens")
  }

  test("saturation: tf 100 stays under the (k1+1) = 2.25x ceiling") {
    val d = Seq(
      (1L, ("cat " * 100).trim),
      (2L, "cat" + " dog" * 99)
    ).toDF("doc_id", "text") // equal dl=100, tf 100 vs 1
    val out = run(d, Seq("cat")).map(t => t._1 -> t._3).toMap
    assert(out(1L) > 2L * out(2L), "tf matters below the ceiling")
    assert(out(1L) * 4 < out(2L) * 9, "but never reaches (k1+1)x")
  }

  test("ties break by doc_id; k truncates; misses are absent") {
    val d = Seq(
      (5L, "cat x"), (3L, "cat x"), (9L, "cat x"), (7L, "zebra")
    ).toDF("doc_id", "text")
    val out = run(d, Seq("cat"), k = 2)
    assert(out.map(_._1) == Seq(3L, 5L), "equal scores -> doc_id order, k=2")
    assert(!run(d, Seq("cat")).exists(_._1 == 7L), "no-hit doc never surfaces")
  }

  test("deterministic under repartitioning (micro-point long sums)") {
    val big = Tables.docsRepartitioned(spark, sf)
    val terms = Seq("spark", "join", "window", "vector")
    val a = run(big.repartition(7), terms)
    val b = run(big.repartition(3), terms)
    assert(a == b)
  }

  private object Tables {
    def docsRepartitioned(s: org.apache.spark.sql.SparkSession, dir: String) =
      graft.Tables(s, dir, "documents")
  }
}
