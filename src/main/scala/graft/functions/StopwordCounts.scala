package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.text.TextAnalysis

/** Native Catalyst expression: all stopword + character-class counts for
  * language-ID / quality scoring in ONE byte-level scan of the text.
  *
  * Returns `array<int>` of length 9:
  * `[en, es, fr, de, zh, union-hits, n-tokens, punct-chars, n-chars]` —
  * per-language stopword hit counts in [[TextAnalysis.LangOrder]] order,
  * the number of tokens matching ANY language's list (each token counted
  * once), the total whitespace-token count, the number of code points
  * outside the `[A-Za-z0-9\s]` class (the punctuation-ratio numerator),
  * and the total code-point count (= Spark `length()`). Tokenization
  * matches `split(trim(text), "\\s+")`: maximal runs of non-whitespace
  * bytes, where whitespace is the Java regex `\s` class (space, \t, \n,
  * \x0B, \f, \r — all single-byte in UTF-8, so the scan never has to
  * decode multi-byte code points; UTF-8 continuation bytes are >= 0x80
  * and can never alias them, and a multi-byte lead byte counts as one
  * non-class code point exactly as the regex would).
  *
  * Versus the composable `aggregate(wsTokens(c), ...)` formulation this
  * replaces: no regex split, no per-token accumulator-array allocation,
  * no higher-order-function lambda dispatch, and it participates in
  * whole-stage codegen — the curation tier-1 filter runs it over every
  * document of the corpus, which at 100 TB is the single hottest
  * expression in the engine. Measured at 500k docs (local[32]): the
  * langId+quality filter pair went from ~9.7 s (HOF one-pass form;
  * ~25 s for the original fold-of-whens) to well under a second.
  * Null text propagates null.
  */
case class StopwordCountsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "stopword_counts"

  override def nullSafeEval(input: Any): Any =
    StopwordCountsExpr.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // one static helper call per row keeps the generated method tiny
      // (and inside the whole-stage span); the scan itself is compiled
      // JVM bytecode either way
      val helper = StopwordCountsExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.count($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StopwordCountsExpr {

  /** stopword -> bitmask of language indices in [[TextAnalysis.LangOrder]]
    * (a word appearing in several languages' lists sets several bits).
    */
  private val wordMask: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    for ((lang, i) <- TextAnalysis.LangOrder.zipWithIndex;
         w <- TextAnalysis.Stopwords(lang)) {
      val k = UTF8String.fromString(w)
      val prev = m.get(k)
      m.put(k, Integer.valueOf(if (prev == null) 1 << i else prev | (1 << i)))
    }
    m
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  private def isAlnum(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9')

  /** The one-pass scan. Public so generated code can call it. */
  def count(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val counts = new Array[Int](9)
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) { counts(8) += 1; i += 1 }
      if (i < n) {
        val start = i
        while (i < n && !isWs(bytes(i))) {
          val b = bytes(i)
          // code-point accounting: every byte except UTF-8 continuations
          // (10xxxxxx) starts a code point; single-byte non-alnum
          // (and any multi-byte point) is outside [A-Za-z0-9\s]
          if ((b & 0xC0) != 0x80) {
            counts(8) += 1
            if (!isAlnum(b)) counts(7) += 1
          }
          i += 1
        }
        counts(6) += 1
        val mask = wordMask.get(UTF8String.fromBytes(bytes, start, i - start))
        if (mask != null) {
          counts(5) += 1
          val m = mask.intValue()
          var j = 0
          while (j < 5) {
            if ((m & (1 << j)) != 0) counts(j) += 1
            j += 1
          }
        }
      }
    }
    ArrayData.toArrayData(counts)
  }

  /** Column API over the registered function (see [[graft.functions.Texts.register]]):
    * registration is session-scoped, so every graft entry point that uses
    * the text tier registers it first, and `GraftExtensions` injects it
    * for cluster deployments.
    */
  def stopwordCounts(c: Column): Column = {
    Texts.ensureRegistered()
    org.apache.spark.sql.functions.call_function("stopword_counts", c)
  }
}
