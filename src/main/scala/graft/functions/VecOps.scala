package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Static vector kernels: tight primitive loops over Spark's columnar
  * ArrayData, accumulating left-to-right in double after per-element
  * float→double widening — bit-identical to the
  * `aggregate(zip_with(...))` higher-order formulation they replace
  * (proven by the shared DuckDB oracle), but ~two orders of magnitude
  * cheaper: the HOF path interprets a lambda per element with boxed
  * accumulator updates; this is one static call per row inside
  * whole-stage codegen. */
object VecKernels {

  /** Null result (boxed) when lengths differ or any element is null —
    * exactly what `aggregate(zip_with(...))` produces in those cases,
    * so the kernel never silently reads a null slot as 0.0. */
  def dotF(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  def normF(a: ArrayData): java.lang.Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val v = a.getFloat(i).toDouble
      s += v * v
      i += 1
    }
    java.lang.Double.valueOf(math.sqrt(s))
  }

  /** Exact integer dot over two `array<long>` columns (the int8-ANN
    * scoring kernel — quantized weights are tiny, so overflow is
    * impossible for any dim < 2^47). Null on length mismatch or null
    * slot, like [[dotF]], and also null on Long overflow: the function
    * is registered for general SQL use, where a caller with
    * full-magnitude bigints must get an explicit null, never a
    * silently-wrapped wrong product. Math.*Exact is branch-predicted
    * free on the in-range hot path. */
  def dotL(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    try {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        s = Math.addExact(s, Math.multiplyExact(a.getLong(i), b.getLong(i)))
        i += 1
      }
    } catch { case _: ArithmeticException => return null }
    java.lang.Long.valueOf(s)
  }

  /** Exact integer dot over two `array<tinyint>` columns — the form
    * the int8 parquet pages feed straight into, no widening pass. */
  def dotB(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getByte(i).toLong * b.getByte(i).toLong
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  /** One-pass symmetric int8 quantization of an `array<float>`:
    * scale = max|x|/127, q_i = floor(x_i/scale + 0.5) as tinyint.
    * Null when the vector is empty, has a null slot, or is all-zero
    * (no direction to quantize) — the same rows the relational
    * formulation filters out. */
  def quantizeB(a: ArrayData): ArrayData = {
    val n = a.numElements()
    if (n == 0) return null
    var ma = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val f = a.getFloat(i)
      // a NaN/Inf element would otherwise quantize to 0 silently
      // (NaN.toByte == 0) — a malformed vector must not become a
      // valid-looking direction
      if (java.lang.Float.isNaN(f) || java.lang.Float.isInfinite(f))
        return null
      val v = math.abs(f.toDouble)
      if (v > ma) ma = v
      i += 1
    }
    if (ma == 0.0) return null
    val out = new Array[Byte](n)
    i = 0
    while (i < n) {
      out(i) = math.floor(a.getFloat(i).toDouble * 127.0 / ma + 0.5).toByte
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** `vec_dot(a, b)` over two `array<float>` columns → double. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two array<float> arguments, got " +
        s"${left.dataType} and ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName, NOT a fixed local: two vec_* calls in one
      // generated scope (dot / norms in a single projection) would
      // otherwise redefine the variable, fail Janino, and silently
      // drop the whole stage to interpreted execution
      val r = ctx.freshName("vecr")
      s"""
      java.lang.Double $r = graft.functions.VecKernels.dotF($a, $b);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $r.doubleValue(); }
    """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecDot = copy(left = newLeft, right = newRight)
}

/** `vec_norm(a)` over an `array<float>` column → double L2 norm. */
case class VecNorm(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_norm requires an array<float> argument, got $t")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any =
    VecKernels.normF(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("vecr") // see VecDot — no fixed locals
      s"""
      java.lang.Double $r = graft.functions.VecKernels.normF($a);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $r.doubleValue(); }
    """
    })

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}

/** `vec_dot_long(a, b)` over two `array<long>` columns → long (exact
  * integer arithmetic — the int8-quantized ANN scoring kernel). Null
  * (never a wrapped value) if the exact product or running sum would
  * overflow Long — see [[VecKernels.dotL]]. */
case class VecDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot_long requires two array<bigint> arguments, got " +
        s"${left.dataType} and ${right.dataType}")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "vec_dot_long"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.dotL(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("vecr") // see VecDot — no fixed locals
      s"""
      java.lang.Long $r = graft.functions.VecKernels.dotL($a, $b);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $r.longValue(); }
    """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecDotLong =
    copy(left = newLeft, right = newRight)
}

/** `vec_dot_int8(a, b)` over two `array<tinyint>` columns → long. */
case class VecDotInt8(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(org.apache.spark.sql.types.ByteType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot_int8 requires two array<tinyint> arguments, got " +
        s"${left.dataType} and ${right.dataType}")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "vec_dot_int8"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.dotB(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("vecr") // see VecDot — no fixed locals
      s"""
      java.lang.Long $r = graft.functions.VecKernels.dotB($a, $b);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $r.longValue(); }
    """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecDotInt8 =
    copy(left = newLeft, right = newRight)
}

/** `vec_quantize_int8(v)` over an `array<float>` column →
  * `array<tinyint>` (one-pass symmetric quantizer; null for empty,
  * null-slotted, or all-zero vectors). */
case class VecQuantizeInt8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_quantize_int8 requires an array<float> argument, got $t")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.ByteType, containsNull = false)
  override def prettyName: String = "vec_quantize_int8"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any =
    VecKernels.quantizeB(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("vecr") // see VecDot — no fixed locals
      s"""
      org.apache.spark.sql.catalyst.util.ArrayData $r =
        graft.functions.VecKernels.quantizeB($a);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $r; }
    """
    })

  override protected def withNewChildInternal(
      newChild: Expression): VecQuantizeInt8 = copy(child = newChild)
}
