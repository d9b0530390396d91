package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** `minhash_agg(shingle, k)` — a custom `TypedImperativeAggregate`
  * computing a k-hash MinHash signature in ONE aggregate pass.
  *
  * The relational formulation needs k parallel `min(md5(i||s))`
  * aggregates, each hashing the shingle again; this operator hashes
  * once per (row, i) into a single mutable k-slot buffer. The buffer
  * is tiny (k hex strings), merges map-side like any partial
  * aggregate, and serializes compactly for shuffle — the standard
  * sketch-aggregate shape for 100 TB corpora
  * (SURVEY.md §7.3's TypedImperativeAggregate candidate).
  *
  * Hash family is identical to [[graft.pipeline.Dedup
  * .minHashSignatures]] (min over md5("i|" ++ shingle)), so signatures
  * are bit-comparable with the relational path and the DuckDB oracle.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[String]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (numHashes < 1)
      TypeCheckResult.TypeCheckFailure(
        s"minhash_agg requires k >= 1, got $numHashes")
    else if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_agg requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[String] =
    new Array[String](numHashes)

  override def update(buffer: Array[String],
      input: InternalRow): Array[String] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var i = 0
      while (i < numHashes) {
        val h = HashKernels.md5Hex(s"$i|$s")
        if (buffer(i) == null || h.compareTo(buffer(i)) < 0) buffer(i) = h
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[String],
      other: Array[String]): Array[String] = {
    var i = 0
    while (i < numHashes) {
      if (buffer(i) == null ||
        (other(i) != null && other(i).compareTo(buffer(i)) < 0))
        buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[String]): Any =
    if (buffer(0) == null) null
    else new GenericArrayData(buffer.map(UTF8String.fromString))

  override def serialize(buffer: Array[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.length)
    buffer.foreach { h =>
      out.writeBoolean(h != null)
      if (h != null) out.writeUTF(h)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    Array.fill(n)(if (in.readBoolean()) in.readUTF() else null)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}
