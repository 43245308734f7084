package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram language-model fluency scoring: train conditional-bigram
  * counts on the corpus, score every document by its average
  * conditional bigram probability — the n-gram-LM quality filter of
  * the CCNet/KenLM lineage (documents whose adjacent-word transitions
  * are improbable under the corpus's own statistics are boilerplate,
  * keyword stuffing, or mojibake), with the model reduced to what an
  * exact cross-engine oracle can mirror.
  *
  * The score is ln-free and integer-exact (the [[Bm25]] /
  * [[Collocations]] doctrine): per bigram, `micro(y|x) = (c_xy * 1e6)
  * div c_first(x)` — the conditional probability in exact micro-points
  * by integer division, where `c_first(x) = Σ_y c_xy` (x's
  * first-position occurrences, derived from the bigram table itself so
  * the distribution sums to 1e6 per head word). A document's
  * `sum_micro` and `n_bigrams` are exact long sums; the reported
  * `fluency = sum_micro / n_bigrams` is ONE double division mirrored
  * in the oracle (exactly rounded IEEE — bit-identical), used only for
  * the final ordering. A perplexity would be the geometric rather than
  * arithmetic mean of the same per-bigram probabilities — monotone
  * log-sums an exact oracle cannot mirror; the arithmetic mean ranks
  * the same pathologies (a doc of never-seen-together words scores
  * near zero either way).
  *
  * Plan shape (scale): the count tables ship ONE ROW PER KEY after
  * map-side partial aggregation (never token streams — the
  * [[Collocations]] join doctrine); the per-document occurrence
  * stream joins the model DIRECTLY via shuffle_hash on the 8-byte
  * `xxhash64` of the bigram (`useHashKey`) — never the bigram text
  * (the [[graft.dedup.SpanDedup]] key doctrine: the text-keyed
  * variant exists for the oracle, BigramLmSpec pins equality; an
  * xxhash64 collision of two distinct bigrams would give the model
  * two rows under one key and duplicate that key's scoring-join rows,
  * inflating the affected documents' n_bigrams — a 2^-64-probability
  * corruption whose insurance, an always-paid vocab-scale model dedup
  * exchange, was deliberately rejected). A per-(doc, bigram)
  * pre-collapse before the join was measured and REMOVED
  * ([[scoreAgainst]]'s comment) — repeated-bigram skew is absorbed by
  * the hash join's build side, not a collapse stage. Scoring
  * documents the model was trained on hits every transition; scoring
  * OTHER documents left-joins with a zero default — the
  * out-of-vocabulary transition is maximally non-fluent.
  */
object BigramLm {

  private[text] def bigrams(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      TextAnalysis.wsTokens(col("text")).as("t"))
    val n1 = greatest(size(col("t")) - lit(1), lit(0))
    toks
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("t"), lit(1), n1).as("w1"),
        slice(col("t"), lit(2), n1).as("w2"))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
  }

  private[text] def keyed(df: DataFrame, useHashKey: Boolean): DataFrame =
    if (useHashKey)
      df.withColumn("bk", xxhash64(concat_ws(" ", col("w1"), col("w2"))))
    else
      df.withColumn("bk", concat_ws(" ", col("w1"), col("w2")))

  /** Train the conditional-bigram model on `docs`: `(bk, micro)` — one
    * row per distinct training bigram, `micro` its exact micro-point
    * conditional probability. This is the frame the scoring surfaces
    * join against; persist it (a bucketed table on `bk`) to amortize
    * training across scoring batches.
    */
  def trainModel(docs: DataFrame, useHashKey: Boolean = true): DataFrame = {
    val bic = bigrams(docs).groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_xy"))
    val cFirst = bic.groupBy(col("w1"))
      .agg(sum(col("c_xy")).as("c_first"))
    // NOT deduplicated by bk: insuring against an xxhash64 collision
    // (two distinct bigrams sharing a model row's key, which would
    // duplicate that key's scoring-join rows) would cost one more
    // bigram-vocab-scale exchange per execution (adjacent solo
    // sessions read it at roughly +10-15%, within the session bar but
    // structurally always-paid) — a 2^-64-probability event does not
    // buy an extra exchange; the class doc states the failure mode
    // plainly instead
    keyed(
      bic.join(cFirst, Seq("w1"))
        .select(col("w1"), col("w2"),
          expr("(c_xy * CAST(1000000 AS BIGINT)) div c_first").as("micro")),
      useHashKey).select(col("bk"), col("micro"))
  }

  /** Score `docs` against an already-trained `model` (the CCNet
    * deployment shape: train on a trusted reference corpus, score
    * candidate batches against it). Out-of-vocabulary transitions
    * contribute ZERO micro-points — an adjacency the reference corpus
    * never produced is maximally non-fluent — via the left join's
    * coalesce, so a document of entirely novel transitions scores 0.0
    * instead of dropping out.
    */
  def scoreAgainst(model: DataFrame, docs: DataFrame,
                   useHashKey: Boolean = true): DataFrame =
    // the occurrence stream joins the model directly (one exchange to
    // the join key, one to the doc key, partial-agg map-side before
    // each) — pre-collapsing to distinct (doc, bigram) rows first
    // measured SLOWER at sf1 (3.75s vs the direct shape: the collapse
    // adds a third full-stream exchange and typical docs repeat few
    // bigrams; a boilerplate-heavy corpus where repeats dominate would
    // tip the other way). shuffle_hash on the vocab-sized model: the
    // SMJ sort of the token-scale stream was HALF the query
    // (solo-measured 3.75→1.89s)
    keyed(bigrams(docs), useHashKey)
      .select(col("doc_id"), col("bk"))
      .join(model.hint("shuffle_hash"), Seq("bk"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("micro"), lit(0L))).as("sum_micro"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_micro"),
        (col("sum_micro").cast("double") /
          col("n_bigrams").cast("double")).as("fluency"))

  /** Per-document fluency: `(doc_id, n_bigrams, sum_micro, fluency)`
    * for every document with at least one bigram, the corpus itself
    * being the training set. Self-scoring never hits the OOV path —
    * every bigram is in its own training table, so the left join is an
    * inner join by construction and the q104 oracle needs no coalesce.
    */
  def fluencyScores(docs: DataFrame,
                    useHashKey: Boolean = true): DataFrame =
    scoreAgainst(trainModel(docs, useHashKey), docs, useHashKey)

  /** The filter surface: the `k` LEAST fluent documents (ascending
    * average conditional probability, ties by doc_id) — the ones a
    * quality gate drops first.
    */
  def leastFluent(docs: DataFrame, k: Int,
                  useHashKey: Boolean = true): DataFrame =
    fluencyScores(docs, useHashKey)
      .orderBy(col("fluency").asc, col("doc_id").asc)
      .limit(k)
}
