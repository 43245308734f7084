package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-size sliding-window document chunking with overlap — the
  * context-window preparation step of RAG/embedding/training pipelines
  * (cf. the reference's per-row record shaping, `cv.py:70-90`, scaled
  * from row-shaping to row-EXPANSION).
  *
  * Semantics (char-based, so they are expressible identically in ANSI
  * SQL for the oracle): chunk `i` starts at char offset `i * stride`
  * (0-based) and spans `size` chars; chunks are emitted until one
  * reaches the end of the document, i.e. `n = max(1, ceil((len - size)
  * / stride) + 1)`. The final chunk may be shorter than `size`; a
  * document shorter than `size` yields exactly one chunk (its whole
  * text). `stride < size` gives `size - stride` chars of overlap
  * between consecutive chunks — the tail-loss guard — while `stride ==
  * size` degenerates to non-overlapping windows ([[graft.ops.Segments]]
  * covers the token-granular form of that case).
  *
  * Scale notes: the whole operator is ONE narrow projection over the
  * scan — `sequence` + `posexplode` + `substr` are all codegen'd
  * builtins, so a 100 TB corpus chunks with ZERO shuffle and the
  * expansion streams straight into whatever consumes it (embedding
  * batches, packing, a sharded write). Nothing is buffered per
  * document: `substr` slices lazily per output row. Chunk ids are
  * deterministic (position within the document), so re-runs and
  * incremental appends produce byte-identical chunk keys —
  * `(doc_id, chunk_id)` is a stable join/dedup key downstream.
  */
object Chunking {

  /** Expand `docs` into overlapping chunks. Output: `idCol`, `chunk_id`
    * (0-based position, bigint), `start_pos` (1-based char offset,
    * bigint, matching SQL `SUBSTRING` addressing), `chunk` (string).
    */
  def chunkFixed(docs: DataFrame, idCol: String, textCol: String,
                 size: Int, stride: Int): DataFrame = {
    require(size >= 1, s"size must be >= 1, got $size")
    require(stride >= 1 && stride <= size,
      s"stride must be in [1, size], got $stride (size $size)")
    val n = nChunks(length(col(textCol)), size, stride)
    docs
      .select(col(idCol), col(textCol),
        explode(sequence(lit(0L), n - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        (col("chunk_id") * stride + 1).as("start_pos"),
        col(textCol).substr((col("chunk_id") * stride + 1).cast("int"),
          lit(size)).as("chunk"))
  }

  /** `max(1, ceil((len - size) / stride) + 1)` as a column. */
  private[text] def nChunks(len: Column, size: Int, stride: Int): Column =
    greatest(lit(1L),
      ceil((len - size).cast("double") / stride).cast("long") + 1)
}
