package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the word-repetition counts behind
  * Gopher/C4-style quality filters, in ONE scan of the text.
  *
  * Returns `array<int>` of length 6:
  * `[n_words, distinct_words, top_word, n_bigrams, distinct_bigrams,
  * top_bigram]` — total whitespace-token count, number of distinct
  * tokens, occurrence count of the most frequent token, total adjacent
  * word-bigram count (`max(n_words - 1, 0)`), distinct bigrams, and the
  * most frequent bigram's count. Downstream filters derive the standard
  * repetition signals as ratios (duplicate-word fraction
  * `1 - distinct/total`, top-word mass `top/total`, and the bigram
  * analogues) — a high duplicate fraction or a dominant n-gram marks
  * boilerplate/spam documents that LLM training-data pipelines drop.
  *
  * Tokenization is maximal runs of non-whitespace bytes (the Java regex
  * `\s` class, all single-byte in UTF-8 — same contract as
  * [[StopwordCountsExpr]]), so `repetition_counts` and
  * `stopword_counts` agree on `n_words` by construction. Bigram keys
  * join adjacent tokens with a single space; tokens cannot contain
  * whitespace, so the combined key is unambiguous.
  *
  * Per-document distinct counting needs per-document state — a hash map
  * of token counts — so unlike the sketch expressions this one
  * allocates O(distinct tokens) per row. That is the floor for EXACT
  * repetition ratios (the signal the quality filters threshold on);
  * state is bounded by the document's own token count, never by corpus
  * size, and the scan stays a narrow codegen'd map with zero shuffle.
  * Null text propagates null.
  */
case class RepetitionCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "repetition_counts"

  override def nullSafeEval(input: Any): Any =
    RepetitionCounts.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val helper = RepetitionCounts.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.count($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionCounts {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  private val Space = UTF8String.fromString(" ")

  /** The one-pass scan. Public so generated code can call it. */
  def count(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // tokenize once; tokens are needed as map keys anyway
    val toks = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(bytes(i))) i += 1
        toks.add(UTF8String.fromBytes(bytes, start, i - start))
      }
    }
    val w = toks.size()
    val counts = new Array[Int](6)
    counts(0) = w
    counts(3) = math.max(w - 1, 0)
    val wc = new java.util.HashMap[UTF8String, Integer](w * 2)
    var k = 0
    while (k < w) {
      val prev = wc.get(toks.get(k))
      val c = if (prev == null) 1 else prev.intValue() + 1
      wc.put(toks.get(k), Integer.valueOf(c))
      if (c > counts(2)) counts(2) = c
      k += 1
    }
    counts(1) = wc.size()
    if (w > 1) {
      val bc = new java.util.HashMap[UTF8String, Integer](w * 2)
      k = 0
      while (k < w - 1) {
        val key = UTF8String.concat(toks.get(k), Space, toks.get(k + 1))
        val prev = bc.get(key)
        val c = if (prev == null) 1 else prev.intValue() + 1
        bc.put(key, Integer.valueOf(c))
        if (c > counts(5)) counts(5) = c
        k += 1
      }
      counts(4) = bc.size()
    }
    ArrayData.toArrayData(counts)
  }

  /** Column API over the registered function (see [[Texts.register]]). */
  def repetitionCounts(c: Column): Column = {
    Texts.ensureRegistered()
    org.apache.spark.sql.functions.call_function("repetition_counts", c)
  }
}
