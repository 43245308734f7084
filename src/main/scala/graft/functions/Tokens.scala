package graft.functions

/** The package-wide whitespace-tokenization contract, stated in ONE
  * place: a token is a maximal run of non-`\s` bytes, where `\s` is the
  * Java regex class = exactly the six ASCII whitespace bytes below (all
  * single-byte in UTF-8, so a byte scan cannot split a multi-byte
  * character; non-ASCII Unicode spaces such as NBSP are token
  * characters — the [[graft.text.TextAnalysis]] `wsTokens` contract
  * every fused scan must bit-match).
  *
  * The span-scanning expressions ([[TokenWindowHashes]], [[TermCounts]],
  * [[BigramHashCounts]], [[BigramCounts]]) each carry their own copy of
  * the separator test and boundary-walk loop rather than calling
  * through here. That duplication is DELIBERATE, decided on evidence:
  * an r17 alternating same-settings A/B of a shared
  * `scan(bytes) -> spans` helper read +15-25% on the byte-walk-dominated
  * queries in its first two alternations, but a same-tree re-measure
  * the same day moved ±25% across JVMs — so the cost is UNPROVEN either
  * way, and the zero-risk choice is the fully-inlined per-class loop
  * (these are the hottest loops in the engine; the committed
  * BENCH_SOLO r17c/r17d numbers were measured on them). The desync
  * risk duplication creates is closed by TESTS, not by sharing: each
  * expression's spec bit-matches it against a `wsTokens`-derived
  * composable formulation over fixtures covering every `\s` byte class
  * and multi-byte chars, so a fork of any copy's tokenization fails its
  * suite. A change to the separator SET starts here (update this doc,
  * then each copy, then watch the four suites agree).
  */
private[functions] object Tokens {

  /** The separator test, for reference and for non-hot-path callers. */
  def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
}
