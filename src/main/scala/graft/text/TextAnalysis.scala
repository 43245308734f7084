package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, document fingerprinting.
  *
  * All pure column expressions (codegen'd, no UDFs) so they run inside
  * WholeStageCodegen over a parquet scan — at 100 TB these are a single
  * narrow map stage with zero shuffle.
  */
object TextAnalysis {

  /** Whitespace tokens; empty/blank input gives an empty array (Spark's
    * `split("")` would give `[""]`).
    */
  def wsTokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  def tokenCountWs(c: Column): Column = size(wsTokens(c))

  /** BPE-ish pre-tokenizer classes (letters / digits / single punct), the
    * word-splitting regex shape used by GPT-2-style byte-pair encoders.
    */
  val TokenRegex = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def reTokens(c: Column): Column = regexp_extract_all(c, lit(TokenRegex), lit(0))

  def tokenCountRe(c: Column): Column = size(reTokens(c))

  /** Fraction of non-alphanumeric, non-space chars. */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(length(regexp_replace(c, "[A-Za-z0-9\\s]", "")) / length(c))

  /** Tiny multilingual stopword table (heuristic tier; a production list
    * would broadcast a dictionary table).
    */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "que", "de", "es"),
    "fr" -> Seq("le", "et", "les", "des", "est"),
    "de" -> Seq("der", "und", "die", "das", "ist"),
    "zh" -> Seq("的", "是", "在", "了", "和"))

  private def hits(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isin(words.map(_.asInstanceOf[Any]): _*)))

  /** Fraction of whitespace tokens that are (any-language) stopwords. */
  def stopwordRatio(c: Column): Column = {
    val toks = wsTokens(c)
    val all = Stopwords.values.flatten.toSeq.distinct
    when(size(toks) === 0, lit(0.0)).otherwise(hits(toks, all) / size(toks))
  }

  /** Composite quality score in [0,1]: length saturation + low punctuation
    * + stopword density (the classic cheap pre-filter tier for web-scale
    * corpora).
    */
  def qualityScore(c: Column): Column =
    round(
      lit(0.4) * least(lit(1.0), length(c) / lit(500.0)) +
        lit(0.3) * (lit(1.0) - punctRatio(c)) +
        lit(0.3) * stopwordRatio(c), 6)

  /** Stopword-count language ID over [[Stopwords]]; ties break in the
    * fixed order en > es > fr > de > zh. Returns the winning language code
    * ("en" when nothing matches anywhere — score 0 ties resolve to the
    * first language).
    */
  def langId(c: Column): Column = {
    val toks = wsTokens(c)
    val order = Seq("en", "es", "fr", "de", "zh")
    val scores = order.map(l => l -> hits(toks, Stopwords(l))).toMap
    order.init.foldRight(lit(order.last): Column) { (l, rest) =>
      when(order.dropWhile(_ != l).tail
        .map(o => scores(l) >= scores(o)).reduce(_ && _), lit(l))
        .otherwise(rest)
    }
  }

  /** Accent-fold map used by [[normalizeText]] (the common Latin-1/2
    * diacritics; a production pipeline would use full NFKD + mark
    * stripping in a codec stage).
    */
  val AccentFrom = "áàâäãåéèêëíìîïóòôöõúùûüýÿçñÁÀÂÄÃÅÉÈÊËÍÌÎÏÓÒÔÖÕÚÙÛÜÝÇÑ"
  val AccentTo = "aaaaaaeeeeiiiiooooouuuuyycnAAAAAAEEEEIIIIOOOOOUUUUYCN"

  /** Corpus text normalization: lowercase, fold accents, collapse
    * whitespace runs, trim — the canonical pre-dedup cleanup pass (exact
    * dedup on raw text misses case/spacing variants).
    */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      lower(translate(c, AccentFrom, AccentTo)), "\\s+", " "))

  /** Document fingerprint: minimum MD5 over all 8-char shingles (the
    * winnowing/rolling-hash family collapsed to its min-hash special case —
    * robust to small edits, pure expressions). For texts shorter than the
    * shingle width the whole text is the shingle.
    *
    * Exposed as two pieces because the min runs per-document in an
    * aggregation: [[shingleStarts]] generates offsets to explode,
    * fingerprint = `min(md5(substring(text, i, n)))` grouped by doc.
    */
  def shingleStarts(c: Column, n: Int = 8): Column =
    sequence(lit(1), greatest(length(c) - (n - 1), lit(1)))
}
