package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.security.MessageDigest

/** Shared scalar kernels for the custom expressions. Static methods so
  * generated code calls them directly (one static call inside the
  * whole-stage-codegen loop — no interpreted expression tree). */
object HashKernels {

  private val hexDigits = "0123456789abcdef".toCharArray

  def md5Hex(bytes: Array[Byte]): String = {
    val d = MessageDigest.getInstance("MD5").digest(bytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def md5Hex(s: String): String =
    md5Hex(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** 64-bit SimHash of a text: distinct `\W+`-separated lowercase
    * tokens vote ±1 per signature bit; bit b of md5-nibble n covers
    * position (n-1)*4+b. Bit-identical to the relational pipeline in
    * [[graft.pipeline.Dedup.simHashParts]] (and its DuckDB oracle) —
    * one expression call replaces a 64-way explode + two shuffles. */
  def simHash64(text: UTF8String): Long = {
    if (text == null) return 0L
    val tokens = text.toString.toLowerCase(java.util.Locale.ROOT).split("\\W+")
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      val tok = tokens(t)
      if (tok.nonEmpty && seen.add(tok)) {
        val h = md5Hex(tok)
        var ni = 0
        while (ni < 16) {
          val nv = Character.digit(h.charAt(ni), 16)
          var b = 0
          while (b < 4) {
            val bitpos = ni * 4 + b
            votes(bitpos) += (if (((nv >> b) & 1) == 1) 1 else -1)
            b += 1
          }
          ni += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}

/** `simhash64(text)` — native Catalyst expression (LongType) with
  * `doGenCode`: whole-stage codegen emits a single static call to
  * [[HashKernels.simHash64]], so the dedup hot path stays inside the
  * generated loop instead of dropping to an interpreted UDF
  * (SURVEY.md §2.10 / build-brief preference order (b)). */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    HashKernels.simHash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.simHash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SimHash64].getName, "simhash64")
}
