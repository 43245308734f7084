package graft.similarity

import graft.SparkSpec

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.Tables(spark, sf, "embeddings")
  private lazy val query =
    emb.filter("vec_id = 0").select("embedding").head().getSeq[Float](0)
  private lazy val corpus = emb.filter("vec_id <> 0")
  private lazy val index = Ivf.build(corpus, "embedding", nLists = 8)

  test("every vector lands in exactly one of nLists cells") {
    val cells = index.indexed.groupBy("cell").count()
      .as[(Int, Long)].collect().toMap
    assert(cells.keySet.subsetOf((0 until 8).toSet))
    assert(cells.values.sum == corpus.count())
  }

  test("IVF recall@10 vs brute force with half the cells probed") {
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", query, 10)
      .select("vec_id").as[Long].collect().toSet
    val ivf = Ivf.topK(index, "vec_id", "embedding", query, k = 10, nProbe = 4)
      .select("vec_id").as[Long].collect().toSet
    val recall = exact.intersect(ivf).size / 10.0
    info(s"IVF recall@10 (nProbe=4/8) = $recall")
    assert(recall >= 0.4)
    // full probe degenerates to exact search
    val full = Ivf.topK(index, "vec_id", "embedding", query, k = 10, nProbe = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(full == exact)
  }
}
