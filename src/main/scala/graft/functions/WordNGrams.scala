package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Scalar kernel for [[WordNGrams]] — static so whole-stage codegen
  * calls it directly. */
object NGramKernels {

  /** All word n-grams of a text in one pass: lowercase `\W+`
    * tokenization (identical to the relational
    * `TextAnalysis.tokens`), grams joined with a single space
    * (identical to `concat_ws(' ', ...)`) — the same construction
    * [[GramStatsKernel.gramStats]] streams, but materialized as the
    * gram list for operators that need the grams themselves (explode
    * → corpus-wide aggregation). Texts with fewer than n tokens yield
    * an empty array, matching the relational
    * `when(size(tk) >= n, ...).otherwise(array())` guard. */
  def wordNGrams(text: UTF8String, n: Int): ArrayData = {
    // UTF8String.toLowerCase is what Spark's lower() itself calls, so
    // the kernel matches the relational chain byte-for-byte in every
    // locale (String.toLowerCase(ROOT) would diverge from lower() on
    // e.g. Turkish dotted-I under a tr-TR default locale)
    val raw = text.toLowerCase.toString.split("\\W+", -1)
    var m = 0
    var i = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) { raw(m) = raw(i); m += 1 }
      i += 1
    }
    val total = if (m >= n) m - n + 1 else 0
    val out = new Array[AnyRef](total)
    val sb = new java.lang.StringBuilder
    i = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(raw(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[wordNGrams]] with the KenLM/CCNet sentence-boundary padding
    * (`TextAnalysis.wordNgramsBounded`'s contract, natively): n−1
    * `<s>` markers on the left, one `</s>` on the right — realized as
    * pure index arithmetic over the conceptual padded array, no
    * padding ever materialized. Every text (even empty) yields
    * m+1 grams; no gram ends in `<s>`. */
  def wordNGramsBounded(text: UTF8String, n: Int): ArrayData = {
    val raw = text.toLowerCase.toString.split("\\W+", -1)
    var m = 0
    var i = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) { raw(m) = raw(i); m += 1 }
      i += 1
    }
    val total = m + 1
    val out = new Array[AnyRef](total)
    val sb = new java.lang.StringBuilder
    i = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        val p = i + j // position in the conceptual padded array
        if (p < n - 1) sb.append("<s>")
        else if (p - (n - 1) < m) sb.append(raw(p - (n - 1)))
        else sb.append("</s>")
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `word_ngrams(text, n)` — native Catalyst expression returning the
  * text's word n-grams as `array<string>` in one generated call,
  * replacing the interpreted `transform(sequence(...), ...)` +
  * `concat_ws` higher-order chain in gram-explode operators
  * (cross-document duplicate-gram scoring, top-gram style rollups).
  * Tokenization and gram joining are byte-identical to the relational
  * form (FunctionsSpec pins the equivalence; the ta_dup_ngrams oracle
  * pins it against DuckDB). */
case class WordNGrams(child: Expression, n: Int,
    boundary: Boolean = false) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"word_ngrams requires a string argument, got ${child.dataType}")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(
        s"word_ngrams requires n >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String =
    if (boundary) "word_ngrams_bos" else "word_ngrams"

  private val kernel =
    if (boundary) "wordNGramsBounded" else "wordNGrams"

  override protected def nullSafeEval(input: Any): Any =
    if (boundary)
      NGramKernels.wordNGramsBounded(input.asInstanceOf[UTF8String], n)
    else NGramKernels.wordNGrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NGramKernels.$kernel($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): WordNGrams = copy(child = newChild)
}

object WordNGrams {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[WordNGrams].getName, "word_ngrams")
}
