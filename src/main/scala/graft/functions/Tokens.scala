package graft.functions

/** The package-wide whitespace-tokenization contract, in ONE place: a
  * token is a maximal run of non-`\s` bytes, where `\s` is the Java
  * regex class = the six ASCII whitespace bytes (all single-byte in
  * UTF-8, so a byte scan cannot split a multi-byte character;
  * non-ASCII Unicode spaces are token characters — the
  * [[graft.text.TextAnalysis]] `wsTokens` contract every fused scan
  * must bit-match). Every span-scanning expression
  * ([[TokenWindowHashes]], [[TermCounts]], [[BigramHashCounts]],
  * [[BigramCounts]]) tokenizes through THIS scan, so a change to the
  * separator set cannot silently desynchronize one of them from the
  * composable formulations their specs pin.
  */
private[functions] object Tokens {

  def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Token byte spans: `starts(i) until ends(i)` for i < n. */
  final class Spans(val starts: Array[Int], val ends: Array[Int], val n: Int)

  def scan(bytes: Array[Byte]): Spans = {
    val nb = bytes.length
    val cap = nb / 2 + 1 // a token needs >= 1 byte + a separator
    val starts = new Array[Int](cap)
    val ends = new Array[Int](cap)
    var nTok = 0
    var i = 0
    while (i < nb) {
      if (isWs(bytes(i))) i += 1
      else {
        starts(nTok) = i
        while (i < nb && !isWs(bytes(i))) i += 1
        ends(nTok) = i
        nTok += 1
      }
    }
    new Spans(starts, ends, nTok)
  }
}
