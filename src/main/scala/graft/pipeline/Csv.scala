package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV interchange for FLAT relations (metadata tables, manifests,
  * label exports — the other format pipelines actually exchange).
  *
  * Same philosophy as [[Jsonl]]: Spark's native csv source does the
  * work; the value is the pinned CONTRACT. Writing always sets
  * `escape="` so embedded quotes serialize RFC-4180-style (doubled)
  * instead of Spark's legacy backslash default — the one option
  * without which a text corpus does NOT round-trip. Reading is
  * schema-first (inference is an extra corpus pass AND can widen
  * types differently per sample) and header-checked.
  *
  * Honest boundary: rows with embedded NEWLINES need `multiLine=true`
  * on read, which makes files non-splittable — for corpora with
  * newline-bearing text use [[Jsonl]] (newline-safe by construction).
  * Nested/array columns don't fit CSV at all; this module guards by
  * requiring a flat schema rather than writing something a reader
  * can't get back.
  */
object Csv {

  private def requireFlat(schema: StructType, who: String): Unit =
    require(schema.fields.forall(f =>
      !f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
      !f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] &&
      !f.dataType.isInstanceOf[StructType]),
      s"$who: CSV requires a flat schema; use Jsonl for nested data")

  /** Write `df` as headered CSV under `path`. */
  def write(df: DataFrame, path: String,
      options: Map[String, String] = Map.empty): Unit = {
    requireFlat(df.schema, "Csv.write")
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true").option("escape", "\"")
      .options(options).csv(path)
  }

  /** Read a CSV directory with an explicit schema. */
  def read(spark: SparkSession, path: String, schema: StructType,
      failFast: Boolean = false): DataFrame = {
    requireFlat(schema, "Csv.read")
    val r = spark.read.schema(schema)
      .option("header", "true").option("escape", "\"")
    (if (failFast) r.option("mode", "FAILFAST") else r).csv(path)
  }
}
