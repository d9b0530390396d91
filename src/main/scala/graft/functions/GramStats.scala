package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Scalar kernel for [[GramStats]] — static so whole-stage codegen
  * calls it directly (the same pattern as [[HashKernels.simHash64]]). */
object GramStatsKernel {

  /** Total and distinct word n-gram counts of a text in one pass:
    * lowercase `\W+` tokenization (identical to the relational
    * `TextAnalysis.tokens`), n-grams joined with a single space
    * (identical to `concat_ws(' ', ...)`), distinct counted via a
    * hash set — no gram array materialization, no `array_distinct`
    * pairwise scan. Semantics match
    * [[graft.pipeline.TextAnalysis.repetitionStats]] exactly (the
    * driver gate runs both against the same DuckDB oracle). */
  def gramStats(text: UTF8String, n: Int): InternalRow = {
    // UTF8String.toLowerCase == Spark's lower() in every locale (see
    // NGramKernels.wordNGrams)
    val raw = text.toLowerCase.toString.split("\\W+", -1)
    // compact the non-empty tokens in place
    var m = 0
    var i = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) { raw(m) = raw(i); m += 1 }
      i += 1
    }
    val total = if (m >= n) m - n + 1 else 0
    val seen = new java.util.HashSet[String](total * 2 + 4)
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
      seen.add(sb.toString)
      i += 1
    }
    new GenericInternalRow(Array[Any](total.toLong, seen.size.toLong))
  }
}

/** `gram_stats(text, n)` — native Catalyst expression returning
  * `struct<n_grams: bigint, n_distinct: bigint>`: the one-pass codegen
  * form of the repetition signal's gram counting. The relational form
  * (`TextAnalysis.repetitionStats`) materializes the gram array and
  * runs `array_distinct` over it per row; this expression streams the
  * grams through a hash set inside the generated loop — same driver
  * oracle (ta_repetition vs ta_repetition_native_expr), so the two are
  * hash-verified equivalent. */
case class GramStats(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"gram_stats requires a string argument, got ${child.dataType}")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(
        s"gram_stats requires n >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))
  override def prettyName: String = "gram_stats"

  override protected def nullSafeEval(input: Any): Any =
    GramStatsKernel.gramStats(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GramStatsKernel.gramStats($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): GramStats =
    copy(child = newChild)
}

object GramStats {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[GramStats].getName, "gram_stats")
}
