package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Scalar kernels for [[CharGramCounts]] / [[WordGramCounts]] — per-doc
  * `map<gram, cnt>` in ONE generated call. The relational form these
  * replace (`explode(grams)` → `groupBy(key, gram).count()`) pays a
  * Generate of every gram INSTANCE plus a corpus-wide exchange keyed on
  * (doc, gram) just to count within each document; the kernel counts
  * doc-locally during the scan, so the explode shrinks to the doc's
  * DISTINCT grams and the per-doc aggregation exchange disappears
  * entirely (guide §2.3 "aggregate before you shuffle" applied at the
  * row level, plus the round-16 lambda rule: the `transform(sequence)`
  * char-gram array was lambda-built and re-ran per consumer). */
object GramCountKernels {

  /** Count grams into a map, first-occurrence key order (deterministic
    * for a given text; order is irrelevant downstream — the map is
    * exploded into join/aggregation inputs). */
  private def countsOf(grams: Array[String]): MapData = {
    val m = new java.util.LinkedHashMap[String, Array[Long]]()
    var i = 0
    while (i < grams.length) {
      val slot = m.get(grams(i))
      if (slot == null) m.put(grams(i), Array(1L))
      else slot(0) += 1L
      i += 1
    }
    val keys = new Array[AnyRef](m.size)
    val vals = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      keys(k) = UTF8String.fromString(e.getKey)
      vals(k) = e.getValue()(0)
      k += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys),
      new GenericArrayData(vals))
  }

  private val EmptyMap: MapData = new ArrayBasedMapData(
    new GenericArrayData(Array.empty[AnyRef]),
    new GenericArrayData(Array.empty[Any]))

  /** Sliding character n-gram counts of the lowercased text —
    * gram construction byte-identical to the relational
    * `Classify.charGrams` chain (`lower` = UTF8String.toLowerCase;
    * `substr` counts CODE POINTS, so the walk below indexes by code
    * point, not UTF-16 unit); texts shorter than n count nothing,
    * matching the relational empty-array guard. */
  def charGramCounts(text: UTF8String, n: Int): MapData = {
    val lc = text.toLowerCase.toString
    // code-point start offsets (surrogate pairs are one position for
    // substr, two UTF-16 units for String.substring)
    val offs = new Array[Int](lc.length + 1)
    var i = 0
    var m = 0
    while (i < lc.length) {
      offs(m) = i
      m += 1
      i += Character.charCount(lc.codePointAt(i))
    }
    offs(m) = lc.length
    val total = m - n + 1
    if (total <= 0) return EmptyMap
    val grams = new Array[String](total)
    i = 0
    while (i < total) {
      grams(i) = lc.substring(offs(i), offs(i + n))
      i += 1
    }
    countsOf(grams)
  }

  /** Word n-gram counts over [[NGramKernels.wordNGrams]]'s gram stream
    * (same tokenization/joining contract, already FunctionsSpec-pinned
    * against the relational chain). Counts the kernel's UTF8Strings
    * directly — word tokens repeat less per doc than char grams, so a
    * String round-trip per instance would dominate the map cost. */
  def wordGramCounts(text: UTF8String, n: Int): MapData = {
    val arr = NGramKernels.wordNGrams(text, n)
    val total = arr.numElements()
    if (total == 0) return EmptyMap
    val m = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < total) {
      val g = arr.getUTF8String(i)
      val slot = m.get(g)
      if (slot == null) m.put(g, Array(1L))
      else slot(0) += 1L
      i += 1
    }
    val keys = new Array[AnyRef](m.size)
    val vals = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      keys(k) = e.getKey
      vals(k) = e.getValue()(0)
      k += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys),
      new GenericArrayData(vals))
  }
}

/** `char_gram_counts(text, n)` — per-document character n-gram counts
  * as `map<string, bigint>`, replacing the
  * `explode(charGrams) → groupBy(doc, gram).count()` idiom in the NB
  * language-ID router's train and apply paths: the Generate shrinks
  * from every gram instance to each doc's distinct grams, and the
  * per-doc counting exchange disappears (the counts are scan-local).
  * FunctionsSpec pins byte-equivalence with the relational chain,
  * including multi-byte code points. */
case class CharGramCounts(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"char_gram_counts requires a string argument, got ${child.dataType}")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(
        s"char_gram_counts requires n >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "char_gram_counts"

  override protected def nullSafeEval(input: Any): Any =
    GramCountKernels.charGramCounts(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GramCountKernels.charGramCounts($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): CharGramCounts = copy(child = newChild)
}

object CharGramCounts {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CharGramCounts].getName, "char_gram_counts")
}

/** `word_gram_counts(text, n)` — per-document word n-gram counts as
  * `map<string, bigint>`; the word-token twin of [[CharGramCounts]]
  * for the NB classifier's train/apply paths (tokenization shared
  * with [[WordNGrams]], so the existing relational-equivalence pins
  * carry over). */
case class WordGramCounts(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"word_gram_counts requires a string argument, got ${child.dataType}")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(
        s"word_gram_counts requires n >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "word_gram_counts"

  override protected def nullSafeEval(input: Any): Any =
    GramCountKernels.wordGramCounts(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GramCountKernels.wordGramCounts($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): WordGramCounts = copy(child = newChild)
}

object WordGramCounts {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[WordGramCounts].getName, "word_gram_counts")
}
