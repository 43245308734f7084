package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: identical vectors -> 1.0, orthogonal -> 0.0") {
    val df = Seq(
      (Seq(1f, 0f), Seq(1f, 0f)),
      (Seq(1f, 0f), Seq(0f, 1f)),
      (Seq(1f, 1f), Seq(-1f, -1f))
    ).toDF("a", "b")
    val got = df.select(round(Similarity.cosine(col("a"), col("b")), 9))
      .as[Double].collect()
    assert(got.toSeq == Seq(1.0, 0.0, -1.0))
  }

  test("bruteForceTopK returns k rows ordered by similarity") {
    val emb = graft.Tables(spark, sf, "embeddings")
    val q = emb.filter("vec_id = 0").select("embedding").head().getSeq[Float](0)
    val top = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 5)
      .as[(Long, Double)].collect()
    assert(top.length == 5)
    assert(top.head._1 == 0L && top.head._2 == 1.0) // self first
    assert(top.map(_._2).sliding(2).forall(w => w(0) >= w(1)))
  }

  test("hyperplane buckets are deterministic across evaluations") {
    val emb = graft.Tables(spark, sf, "embeddings").limit(50)
    val b1 = Similarity.withBuckets(emb, "embedding").select("vec_id", "bucket")
      .as[(Long, Long)].collect().toMap
    val b2 = Similarity.withBuckets(emb, "embedding").select("vec_id", "bucket")
      .as[(Long, Long)].collect().toMap
    assert(b1 == b2)
    assert(b1.values.forall(b => b >= 0 && b < (1L << 12)))
  }

  test("ANN recall@10 vs brute force is usable at default settings") {
    val emb = graft.Tables(spark, sf, "embeddings")
    val q = emb.filter("vec_id = 0").select("embedding").head().getSeq[Float](0)
    val corpus = emb.filter("vec_id <> 0")
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 10)
      .select("vec_id").as[Long].collect().toSet
    val ann = Similarity.annTopK(
      Similarity.withBuckets(corpus, "embedding", nPlanes = 8),
      "vec_id", "embedding", q, k = 10, nPlanes = 8, probe = 2)
      .select("vec_id").as[Long].collect().toSet
    val recall = exact.intersect(ann).size / 10.0
    info(s"recall@10 = $recall")
    assert(recall >= 0.4) // LSH with multiprobe on 500 vectors
  }

  test("probeBuckets enumerates exactly the ≤probe-flip neighborhood") {
    val ids = Similarity.probeBuckets(0b1010L, nPlanes = 8, probe = 2)
    assert(ids.size == 1 + 8 + 28) // Σ C(8, ≤2)
    assert(ids.distinct.size == ids.size)
    assert(ids.forall(b => java.lang.Long.bitCount(b ^ 0b1010L) <= 2))
    assert(ids.contains(0b1010L))
  }

  test("indexed ANN probe prunes partitions instead of scanning the index") {
    val emb = graft.Tables(spark, sf, "embeddings")
    val q = emb.filter("vec_id = 0").select("embedding").head().getSeq[Float](0)
    val corpus = emb.filter("vec_id <> 0")
    val path = java.nio.file.Files
      .createTempDirectory("annidx").toString + "/idx"
    Similarity.buildIndex(corpus, "embedding", path, nPlanes = 8)

    val indexed = Similarity.annTopKIndexed(spark, path, "vec_id",
      "embedding", q, k = 10, nPlanes = 8, probe = 2)
    val plan = indexed.queryExecution.executedPlan.toString
    // the multiprobe IN list must reach the scan as partition pruning,
    // and the per-row hamming full-scan form must be gone
    val pf = plan.linesIterator.find(_.contains("PartitionFilters:"))
    assert(pf.exists(_.contains("bucket")),
      s"no bucket partition pruning in plan:\n$plan")
    assert(!plan.contains("bit_count"), "probe still scans via bit_count")

    val unindexed = Similarity.annTopK(
      Similarity.withBuckets(corpus, "embedding", nPlanes = 8),
      "vec_id", "embedding", q, k = 10, nPlanes = 8, probe = 2)
      .as[(Long, Double)].collect().toSeq
    assert(indexed.as[(Long, Double)].collect().toSeq == unindexed)
  }
}
