package graft.dedup

import graft.SparkSpec

/** CI gate for the organic-similarity margins the q37/q38 closed-form
  * oracles rest on (ADVICE r9: assert the margin so a corpus/SF change
  * that erodes it fails loudly here instead of surfacing as an oracle
  * hash mismatch). Runs the same measurement as
  * [[graft.tools.OracleMargins]] at sf0.01 — the SF the driver's
  * correctness gate runs at — and asserts the invariants with the
  * margins the README table records:
  *
  *  - q37 (threshold 0.99 = 32/32 matching positions): exactly the 50
  *    seeded copy pairs qualify, and the best ORGANIC pair stays ≥ 4
  *    signature positions below the threshold;
  *  - q38 (oracled maxDist 0): exactly the 50 copies sit at hamming 0,
  *    and the closest organic pair stays ≥ 2 bits above maxDist
  *    (scale-audited: the organic minimum is 4 at sf0.01 and 2 at
  *    sf0.1 — the reason the oracled entry pins 0, not 3).
  */
class OracleMarginSpec extends SparkSpec {

  test("q37/q38 copy-seed oracle margins hold at the correctness-gate SF") {
    val (q37Rows, organicPos, q38Rows, organicHam) =
      graft.tools.OracleMargins.measure(spark, "/root/testdata/sf0.01")
    assert(q37Rows == 50L) // exactly the seeded copy pairs at est >= 0.99
    assert(organicPos <= 28) // margin >= 4 positions below 32/32
    assert(q38Rows == 50L) // exactly the copies at hamming 0
    assert(organicHam >= 2) // margin >= 2 bits above the oracled maxDist 0
  }

  test("q83 embedding copy-seed cosine margin holds at the correctness-gate SF") {
    val maxCos = graft.tools.OracleMargins
      .embeddingMargin(spark, "/root/testdata/sf0.01")
    // observed 0.513 at sf0.01 / 0.601 at sf0.1 vs the 0.95 threshold;
    // assert a generous buffer so embedding-fixture drift fails here,
    // not as a q83 hash mismatch
    assert(maxCos <= 0.85, f"organic max cosine $maxCos%.4f")
  }
}
