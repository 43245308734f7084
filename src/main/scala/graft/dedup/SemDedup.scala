package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.similarity.Ivf

/** SemDeDup-style semantic deduplication (Abbas et al., 2023,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication"): a learned coarse quantizer (the [[Ivf]] KMeans
  * model) partitions the corpus into cells, pairwise cosine runs ONLY
  * within a cell, and of every near-duplicate pair the lower id
  * survives. The learned-centroid complement to the data-independent
  * sign-LSH banding in [[Dedup.embeddingNearDups]] — on clustered
  * real-world embeddings the cells align with semantic groups, so the
  * within-cell search finds cross-document paraphrases the random
  * hyperplanes may band apart.
  *
  * Scale shape, per the paper's own O(N²/k) design:
  *  - the KMeans fit runs on a bounded seeded sample (never the corpus)
  *    and assignment is one narrow map — [[Ivf.build]];
  *  - candidate pairs come from the same capped bounded-aggregation
  *    stage as every other dedup tier ([[Dedup.boundedBucketPairs]]:
  *    per-cell id lists with a hard `maxCluster` state bound, one
  *    exchange, never an uncapped self-join);
  *  - expected pair count is Σ|cell|² ≈ N²/k — hold k ∝ N (the paper
  *    uses k = N/⟨cluster⟩) to keep per-cell work constant as the
  *    corpus grows, and `maxCluster` bounds the degenerate-cell worst
  *    case;
  *  - the cosine verify is the codegen'd
  *    [[graft.functions.Vectors.cosineSim]] over a late vector join —
  *    only candidate ids ride the candidate exchange, vectors join in
  *    at the end.
  *
  * Drop rule: a vector is removed iff SOME lower-id vector in its cell
  * has cosine >= `minCosine` with it (the paper keeps one exemplar per
  * ε-group; lowest-id is the deterministic exemplar choice, matching
  * the first-occurrence convention of the text dedup tiers).
  */
object SemDedup {

  /** Returns the surviving rows of `vecs` (all original columns).
    *
    * Determinism note: KMeans centroids depend on the seed and input
    * partitioning, but the SURVIVOR SET is stable for any clustering
    * when near-duplicates are tight (cosine >= minCosine) and everything
    * else is far below the threshold: identical/near-identical vectors
    * land in the same cell by construction (same nearest centroid), so
    * their pair is always generated and always verified.
    *
    * `nClusters <= 0` selects k automatically as `ceil(N / targetCell)`
    * (clamped to ≥ 2) — the paper's k ∝ N rule, so average cell
    * population stays ~`targetCell` as the corpus grows instead of
    * growing linearly with it under a fixed k. The count this costs is
    * the same column-pruned count [[Ivf.build]] already performs for its
    * fit sample.
    *
    * Over-cap guard: [[Dedup.boundedBucketPairs]] drops a cell past
    * `maxCluster` SILENTLY (its gathering aggregate evaluates null) —
    * for the hot incremental gates that is the right trade, but here a
    * dropped cell means duplicates inside it silently SURVIVE. This
    * offline tier budgets one extra count-aggregate job
    * ([[Dedup.bucketCapAudit]] over the cell assignment) and, with
    * `failOnOverCap` (default), raises with the cell count/mass instead
    * — re-run with larger k (or auto-k) rather than weakening the cap.
    */
  def semanticDedup(vecs: DataFrame, idCol: String, vecCol: String,
                    nClusters: Int, minCosine: Double,
                    maxCluster: Int = 10000, seed: Long = 42L,
                    targetCell: Int = 1000,
                    failOnOverCap: Boolean = true): DataFrame =
    semanticDedupAssigned(vecs,
      assignCells(vecs, idCol, vecCol, nClusters, seed, targetCell),
      idCol, vecCol, minCosine, maxCluster, failOnOverCap)

  /** The fit + assignment stage alone: `(idCol, cell)` for every row of
    * `vecs`. Split out of [[semanticDedup]] because the KMeans fit is an
    * INDEXING job a pipeline pays once per corpus snapshot (the same
    * reasoning as [[Ivf.build]] for the ANN probes): persist or
    * checkpoint this frame and feed it to [[semanticDedupAssigned]] to
    * re-run the dedup search — or gate fresh batches — without refitting
    * the quantizer.
    */
  def assignCells(vecs: DataFrame, idCol: String, vecCol: String,
                  nClusters: Int, seed: Long = 42L,
                  targetCell: Int = 1000): DataFrame = {
    require(targetCell > 0, "targetCell must be positive")
    val k =
      if (nClusters > 0) nClusters
      else math.max(2L, (vecs.count() + targetCell - 1) / targetCell).toInt
    require(k >= 2, "MLlib KMeans requires nClusters >= 2")
    Ivf.build(vecs, vecCol, k, seed).indexed
      .select(col(idCol), col("cell").cast("long").as("cell"))
  }

  /** The within-cell dedup search over a precomputed `cells` assignment
    * (`(idCol, cell)` rows, one per vector — [[assignCells]] output).
    * All scale and determinism notes of [[semanticDedup]] apply; the
    * over-cap guard here names the assignment, since k was chosen when
    * the cells were.
    */
  def semanticDedupAssigned(vecs: DataFrame, cells: DataFrame,
                            idCol: String, vecCol: String,
                            minCosine: Double, maxCluster: Int = 10000,
                            failOnOverCap: Boolean = true): DataFrame = {
    // reuse the (band, bkey) bounded-bucket contract: one band, cell key
    val cellRows = cells.select(col(idCol),
      lit(0).as("band"), col("cell").cast("long").as("bkey"))
    if (failOnOverCap) {
      val (nb, mass) = Dedup.bucketCapAudit(cellRows, maxCluster)
      if (nb > 0L) throw new IllegalStateException(
        s"semanticDedup: $nb KMeans cell(s) covering $mass vectors exceed " +
          s"maxCluster=$maxCluster; their pairs would be dropped and " +
          "duplicates inside them would silently survive. Refit with a " +
          "larger cluster count (or auto-k, nClusters <= 0).")
    }
    // dedupePairs = false (r21): the cell key is a SINGLE band, so an
    // unordered pair arises at most once — the distinct was a full
    // exchange of the N²/k pair set (13.4M rows at the q83 sf1 point)
    // for nothing. The dropped-id distinct below keeps the survivor set
    // insensitive to pair multiplicity either way.
    val cands = Dedup.adaptIdType(cellRows, idCol) { rows =>
      Dedup.boundedBucketPairs(rows, idCol, maxCluster, dedupePairs = false)
    }
    graft.functions.Vectors.register(vecs.sparkSession)
    // Verify-join strategy by MEASURED vector-side size (r21, the
    // DailyStoreMerge.sizedKeySide discipline): the pair side is the
    // BIG side here by the paper's own algebra — N²/k pairs of 16 bytes
    // vs N vectors of ~4·dim bytes, so pairs outweigh vectors whenever
    // k < N·16/(2·4·dim), true under the k ∝ N/1000 rule for any
    // realistic dim. BROADCASTING the vectors (when they fit) keeps the
    // pair set inside the aggregation's own stage — zero pair-sized
    // exchanges, no sort (the static planner saw 2 sort-merge joins
    // here: the checkpointed inputs hide stats). Above the threshold —
    // the 100 TB regime — shuffle_hash still exchanges pairs WITHOUT
    // sorting them, and builds only per-partition vector slices.
    val maxBcast = vecs.sparkSession.conf
      .getOption("spark.graft.semdedup.maxBroadcastVecs")
      .map(_.toLong).getOrElse(500000L)
    val bcastVecs = vecs.count() <= maxBcast
    def vecSide(idAs: String, vecAs: String): DataFrame = {
      val s = vecs.select(col(idCol).as(idAs), col(vecCol).as(vecAs))
      if (bcastVecs) broadcast(s) else s.hint("shuffle_hash")
    }
    val dropped = cands
      .join(vecSide("id1", "__v1"), "id1")
      .join(vecSide("id2", "__v2"), "id2")
      .filter(graft.functions.Vectors.cosineSim(col("__v1"), col("__v2"))
        >= minCosine)
      .select(col("id2").as(idCol))
      .distinct()
    vecs.join(dropped, Seq(idCol), "left_anti")
  }
}
