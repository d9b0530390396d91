package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Scalar kernel for [[MinHashSigs]]. */
object MinHashSigsKernel {

  /** k-hash MinHash signature of a text in one scan-local pass:
    * lowercase `\W+` tokens → word 3-shingles (space-joined, exactly
    * [[graft.pipeline.Dedup.shingles]]) → per hash slot i the minimum
    * `md5("i|" + shingle)` hex string. Returns null when the text
    * yields no shingle (< 3 tokens), matching the relational
    * pipeline's groupBy, which emits no row for such documents.
    *
    * This replaces the shingle `posexplode` + window + groupBy of
    * [[graft.pipeline.Dedup.minHashSignatures]] — the signature never
    * leaves the scan, so the only shuffle left in the MinHash dedup
    * is the (band, hash) candidate join. */
  def minHashSigs(text: UTF8String, k: Int): ArrayData = {
    val raw = text.toString.toLowerCase(java.util.Locale.ROOT)
      .split("\\W+", -1)
    var m = 0
    var i = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) { raw(m) = raw(i); m += 1 }
      i += 1
    }
    if (m < 3) return null
    val mins = new Array[String](k)
    i = 0
    while (i <= m - 3) {
      val gram = raw(i) + " " + raw(i + 1) + " " + raw(i + 2)
      var h = 0
      while (h < k) {
        val hex = HashKernels.md5Hex(h.toString + "|" + gram)
        if (mins(h) == null || hex.compareTo(mins(h)) < 0) mins(h) = hex
        h += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString(_): Any))
  }
}

/** `minhash_sigs(text, k)` — native Catalyst expression returning the
  * k-slot MinHash signature as `array<string>` in one scan-local call.
  * Sits beside [[MinHashAgg]] (the aggregate form over pre-exploded
  * shingles): the aggregate is right when shingles already exist as
  * rows; this scalar is right when they don't — signatures come
  * straight off the document scan with zero shuffle. Both are
  * verified against the same DuckDB oracle as the fully relational
  * pipeline (dd_minhash_* queries). */
case class MinHashSigs(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"minhash_sigs requires a string argument, got ${child.dataType}")
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(
        s"minhash_sigs requires k >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType,
    containsNull = false)
  override def nullable: Boolean = true // < 3 tokens → null signature
  override def prettyName: String = "minhash_sigs"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigsKernel.minHashSigs(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    // the kernel itself may return null (no shingles) even for a
    // non-null input, so nullSafeCodeGen with an explicit isNull
    // update instead of defineCodeGen's non-null assumption
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHashSigsKernel.minHashSigs($c, $k);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinHashSigs].getName, "minhash_sigs")
}
