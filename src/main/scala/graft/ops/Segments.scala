package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** C4-style intra-document segment operators for training-data curation
  * (cf. the C4/RefinedWeb line-level filters and "exact substring
  * deduplication" from Lee et al., "Deduplicating Training Data Makes
  * Language Models Better"). The harness corpus has no newlines, so the
  * unit of work is a fixed-width NON-OVERLAPPING token window — the same
  * operator shape as line/paragraph dedup (explode → per-segment decision
  * → reassemble in order), with a well-defined segmentation everywhere.
  *
  * Scale notes (the reason these shapes were chosen):
  *  - [[segmentsCol]] / [[filterSegments]] are pure column expressions —
  *    one narrow WholeStageCodegen map over the scan, zero shuffle.
  *  - [[dedupSegments]] shuffles segment rows ONCE, partitioned by the
  *    16-byte md5 of the segment (uniform keys, no skew: a hot segment
  *    still lands in one partition but duplicate groups are tiny after
  *    the first-occurrence rule), then once more by doc_id for
  *    reassembly. First-occurrence-wins is a per-hash-group
  *    `row_number`, NOT a global-order window — every hash group sorts
  *    (doc_id, seg_no) locally, so parallelism is the number of
  *    distinct segments, not 1.
  */
object Segments {

  /** Non-overlapping windows of `w` whitespace tokens, each re-joined
    * with single spaces; a short tail window is kept. Empty/blank text
    * gives an empty array (no phantom "" segment).
    */
  def segmentsCol(text: Column, w: Int): Column = {
    val toks = TextAnalysis.wsTokens(text)
    val nSeg = ceil(size(toks).cast("double") / w).cast("int")
    when(size(toks) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nSeg - 1),
        i => array_join(slice(toks, i * w + 1, lit(w)), " ")))
  }

  /** Per-segment distinct-token ratio — the repetition screen used by the
    * quality filter. Exact IEEE division (deterministic cross-engine).
    */
  private def distinctRatio(seg: Column): Column = {
    val t = split(seg, " ")
    size(array_distinct(t)).cast("double") / size(t)
  }

  /** C4-style segment quality filter: drop segments whose distinct-token
    * ratio is below `minDistinctRatio`, rebuild the document from the
    * kept segments (original order). Returns
    * `(doc_id, n_segs, n_kept, text_kept)`. Zero shuffle — a single
    * codegen'd map stage; at 100 TB this runs at scan speed.
    */
  def filterSegments(docs: DataFrame, w: Int,
                     minDistinctRatio: Double): DataFrame = {
    val segs = segmentsCol(col("text"), w)
    val kept = filter(segs, s => distinctRatio(s) >= minDistinctRatio)
    docs.select(
      col("doc_id"),
      size(segs).as("n_segs"),
      size(kept).as("n_kept"),
      array_join(kept, " ").as("text_kept"))
  }

  /** Corpus-wide exact segment dedup, first occurrence wins (ordered by
    * (doc_id, seg_no)): every later exact copy of a segment is removed
    * and its document rebuilt from the survivors. The C4 "exact
    * substring dedup" shape at fixed-window granularity.
    *
    * Plan: explode → ONE exchange hash-partitioned by md5(seg) with a
    * per-group `row_number` (parallelism = distinct segments) → one
    * exchange by doc_id to reassemble. Segment text rides the first
    * exchange once; nothing is collected. Docs whose every segment was
    * a copy survive with `n_kept = 0` and empty text.
    *
    * Returns `(doc_id, n_segs, n_kept, text_dedup)`.
    */
  def dedupSegments(docs: DataFrame, w: Int): DataFrame = {
    val segRows = docs
      .select(col("doc_id"), posexplode_outer(segmentsCol(col("text"), w))
        .as(Seq("seg_no", "seg")))
    val firstWin = Window.partitionBy(col("h"))
      .orderBy(col("doc_id"), col("seg_no"))
    // empty docs survive posexplode_outer as a single (null, null) row;
    // `isKept` excludes it so they report n_segs = n_kept = 0, text "".
    val keptRows = segRows
      .withColumn("h", md5(col("seg")))
      .withColumn("rn", row_number().over(firstWin))
      .withColumn("isKept", col("seg").isNotNull && col("rn") === 1)
    val perDoc = keptRows
      .groupBy(col("doc_id"))
      .agg(
        count(col("seg")).as("n_segs"),
        count(when(col("isKept"), 1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("isKept"),
              struct(col("seg_no"), col("seg"))))),
            s => s.getField("seg")),
          " ").as("text_dedup"))
    perDoc.select(col("doc_id"), col("n_segs"), col("n_kept"),
      col("text_dedup"))
  }
}
