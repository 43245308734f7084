package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: reciprocal-rank fusion (RRF) of independently
  * ranked candidate lists — the standard way a training-data mining
  * pipeline combines a lexical arm ([[graft.text.Bm25]]) with a vector
  * arm ([[Similarity]] / [[graft.functions.QuantizedVec]]) without
  * calibrating their incomparable scores (Cormack et al. 2009: fuse on
  * RANKS, `score(d) = Σ_lists 1/(k0 + rank_list(d))`, k0 = 60).
  *
  * Determinism (the oracle is hash-compared cross-engine): the
  * reciprocal is quantized to NANO-POINTS by exact integer division —
  * `1e9 div (k0 + rank)` — BEFORE the per-document sum, so the fused
  * score is a sum of longs (order-independent, the [[graft.text.Bm25]]
  * micro-point doctrine) and `div` is the same exact operation in both
  * engines; no float enters the fusion at all. Ties break by id.
  *
  * Plan shape (scale): each arm is already a bounded top-k
  * (`TakeOrderedAndProject` — the arms do the heavy work and are
  * individually headline-measured); the fusion itself unions k-row
  * frames, one tiny exchange for the per-id sum, and a final top-k.
  * Nothing here grows with the corpus — fusing F lists of k candidates
  * is O(F·k) rows end-to-end.
  */
object HybridRetrieval {

  /** Fuse ranked lists into a top-`k` by RRF. Each input frame must
    * have columns `(id, rank)` with `rank` 1-based and unique within
    * its list (the contract [[ranked]] produces). Returns
    * `(id, n_lists, rrf_nano)` — how many lists surfaced the id, and
    * the summed nano-point reciprocal rank.
    */
  def rrfFuse(lists: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse: no candidate lists")
    require(k0 >= 0, s"rrfFuse: negative rank constant $k0")
    val pts = lists.map(_.select(col("id"),
      expr(s"CAST(1000000000 AS BIGINT) div " +
        s"(CAST($k0 AS BIGINT) + CAST(rank AS BIGINT))").as("pts")))
    pts.reduce(_.unionByName(_))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_lists"), sum(col("pts")).as("rrf_nano"))
      .orderBy(col("rrf_nano").desc, col("id").asc)
      .limit(k)
      .select(col("id"), col("n_lists"), col("rrf_nano"))
  }

  /** Attach the 1-based `rank` an arm's top-k output implies: the
    * first `orderCols` expression is the score ordering, the rest the
    * tie-break. The input is expected to be a bounded top-k frame
    * (≤ tens of rows) — the global window is over THAT, never a
    * corpus-sized frame.
    */
  def ranked(topK: DataFrame, idCol: String,
             orderCols: org.apache.spark.sql.Column*): DataFrame =
    topK.select(col(idCol).as("id"),
      row_number().over(Window.orderBy(orderCols: _*)).as("rank"))
}
