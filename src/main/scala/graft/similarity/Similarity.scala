package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two tiers, as a 100 TB design demands:
  *  - [[bruteForceTopK]]: exact cosine against every vector — one narrow
  *    codegen'd map + TakeOrderedAndProject. Correctness baseline and the
  *    within-bucket scorer.
  *  - [[hyperplaneBucket]] + [[annTopK]]: sign-random-projection LSH. The
  *    corpus is bucketed once by `nPlanes` deterministic hyperplane sign
  *    bits (hash-derived weights — no stored model, any executor computes
  *    the same planes); a query probes only buckets within `probe` bit
  *    flips. At scale the bucket key is a partition/cluster key, so a probe
  *    is partition pruning, not a scan.
  */
object Similarity {

  /** Exact cosine between two float-array columns, accumulated in double
    * via a sequential left fold (deterministic order).
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact top-k most-similar to a literal query vector. Scores through
    * the fused codegen CosineSimilarity Expression (33x the composable
    * [[cosine]] on all-pairs scans — see graft.functions); agreement
    * between the two is pinned by CosineSimilaritySpec.
    */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Float], k: Int): DataFrame = {
    graft.functions.Vectors.register(emb.sparkSession)
    emb.select(col(idCol),
        round(graft.functions.Vectors.cosineSim(col(vecCol), typedlit(query)), 6)
          .as("cosine"))
      .orderBy(desc("cosine"), col(idCol)).limit(k)
  }

  /** Deterministic pseudo-random hyperplane weight for (plane, component):
    * xxhash64-derived uniform in [-1, 1].
    */
  private def planeWeight(seed: Long, p: Column, j: Column): Column =
    (pmod(xxhash64(lit(seed), p, j), lit(2000001L)) - 1000000L) / 1000000.0

  /** LSH bucket key: `nPlanes` sign bits of hyperplane projections. */
  def hyperplaneBucket(vec: Column, nPlanes: Int, seed: Long = 42L): Column =
    (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (v, j) => v.cast("double") * planeWeight(seed, lit(p), j)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Bucket the corpus once (at scale: persist + partition by bucket). */
  def withBuckets(emb: DataFrame, vecCol: String,
                  nPlanes: Int = 12, seed: Long = 42L): DataFrame =
    emb.withColumn("bucket", hyperplaneBucket(col(vecCol), nPlanes, seed))

  /** ANN top-k: score only vectors whose bucket is within `probe` bit
    * flips of the query's bucket (multiprobe recall knob).
    */
  def annTopK(bucketed: DataFrame, idCol: String, vecCol: String,
              query: Seq[Float], k: Int, nPlanes: Int = 12,
              seed: Long = 42L, probe: Int = 1): DataFrame = {
    val spark = bucketed.sparkSession
    val qBucket = spark.range(1)
      .select(hyperplaneBucket(typedlit(query), nPlanes, seed).as("b"))
      .head().getLong(0)
    bruteForceTopK(
      bucketed.filter(
        bit_count(col("bucket").bitwiseXOR(lit(qBucket))) <= probe),
      idCol, vecCol, query, k)
  }
}
