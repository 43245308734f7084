package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{MisraGriesAgg, TermCounts}

/** Exact corpus-level heavy hitters (top-k most frequent tokens) in two
  * bounded-state scans — the classic sketch-then-verify shape, never a
  * vocabulary-scale exchange.
  *
  * Beyond the reference's scope (mariuspopovici/COVID-19-FL aggregates
  * record counts, not token statistics); this is the corpus-profiling
  * primitive of an LLM-data pipeline: boilerplate discovery, stopword
  * induction, tokenizer sanity checks all start from "which tokens
  * dominate this 100 TB crawl".
  *
  * Why not `explode → groupBy(term) → orderBy limit k`: on a web-scale
  * corpus the vocabulary is billions of near-unique terms (URLs, ids,
  * typos), and that plan's exchange ships ONE ROW PER DISTINCT TERM PER
  * TASK even after map-side combine — a vocabulary-scale shuffle to
  * find twenty winners. DuckDB pays the same: its hash table holds the
  * full vocabulary. The two-scan shape instead:
  *
  *  1. **Sketch** — one scan folds every partition into a
  *     [[MisraGriesAgg]] summary (≤ `2*cap` counters, O(1) amortized
  *     per token); the exchange carries one ≤`cap`-item summary per
  *     partial buffer. The merged summary is guaranteed to contain
  *     every term whose true frequency exceeds `total/(cap+1)`.
  *  2. **Verify** — a second scan counts ONLY the ≤`cap` candidate
  *     terms exactly: `explode(term_counts)` pruned by a BROADCAST
  *     semi-ish join against the candidates (the sketch result is one
  *     row — broadcasting it costs nothing), so the final exchange
  *     carries ≤ `cap` keys per task.
  *
  * The output's `provable` column certifies each row from the data
  * itself: `cnt * (cap+1) > total` means every non-candidate term's
  * count (≤ `total/(cap+1)`) is strictly below this row's — the row
  * provably belongs to the true top set and its count is exact. When
  * all k rows are provable, the result IS the exact top-k. A corpus
  * where the k-th hitter is below the threshold needs a larger `cap`
  * (state grows linearly, the plan is unchanged) — the flag makes the
  * failure observable instead of silent, and HeavyHittersSpec pins
  * both sides.
  *
  * No driver-side collect anywhere: the candidate set moves as a
  * broadcast relation, not literals.
  */
object HeavyHitters {

  /** `(term, cnt, provable)` — the top `k` tokens by exact count,
    * descending, ties broken by term; counts computed from a `cap`-wide
    * sketch plus a candidates-only verify scan (class doc).
    */
  def exactTopK(docs: DataFrame, k: Int, cap: Int = 256): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(cap >= k, s"cap ($cap) must be >= k ($k)")
    // operator entry-point convention (functions.Texts scaladoc):
    // register against THIS frame's session, not the thread-active one
    MisraGriesAgg.register(docs.sparkSession)
    TermCounts.register(docs.sparkSession)
    val candidates = docs
      .agg(MisraGriesAgg.mgTopK(col("text"), cap).as("s"))
      .select(col("s.total").as("total"), explode(col("s.items")).as("it"))
      .select(col("total"), col("it.term").as("term"))
    docs
      .select(explode(TermCounts.termCounts(col("text"))).as("tc"))
      .select(col("tc.term").as("term"), col("tc.cnt").cast("long").as("c"))
      .join(broadcast(candidates), Seq("term")) // inner: candidates only
      .groupBy(col("term"), col("total"))
      .agg(sum(col("c")).as("cnt"))
      .select(col("term"), col("cnt"),
        (col("cnt") * lit(cap.toLong + 1) > col("total")).as("provable"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(k)
  }
}
