package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON Lines interchange: the format LLM data pipelines exchange
  * corpora in (one JSON object per line, splittable, append-friendly).
  *
  * Spark's native json source handles both directions — the value
  * here is the CONTRACT, pinned by the pp_jsonl_roundtrip gate: a
  * documents table written to JSONL and read back with its declared
  * schema is row-for-row lossless (text bytes included — the gate
  * compares per-group distinct-md5 cardinalities against the parquet
  * original via the DuckDB oracle). Reading always passes an explicit
  * schema: schema inference is a full extra pass over 100 TB and can
  * widen types differently per sample — the round-trip guarantee only
  * holds schema-first.
  *
  * Scale shape: both directions are embarrassingly parallel (one task
  * per file split; JSONL is newline-splittable so large files still
  * parallelize). Compression (`codec` option) and file sizing
  * (`maxRecordsPerFile`) compose via the normal writer options.
  */
object Jsonl {

  /** Write `df` as JSON Lines under `path` (one object per row);
    * `options` pass through to the writer (`compression`,
    * `maxRecordsPerFile`, ...). */
  def write(df: DataFrame, path: String,
      options: Map[String, String] = Map.empty): Unit =
    df.write.mode(SaveMode.Overwrite).options(options).json(path)

  /** Read a JSONL directory with an explicit schema (see class doc —
    * never schema-infer a corpus-sized read). Malformed lines follow
    * Spark's PERMISSIVE default unless `failFast`. */
  def read(spark: SparkSession, path: String, schema: StructType,
      failFast: Boolean = false): DataFrame = {
    val r = spark.read.schema(schema)
    (if (failFast) r.option("mode", "FAILFAST") else r).json(path)
  }
}
