package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The shared shuffle step in front of every partitioned-layout
  * write (`partitionBy(bucket)` parquet layouts: SRP/IVF/PQ/binary
  * ANN, BM25 postings, gram/span indexes, chunk stores, shards).
  *
  * History: these writers used `repartition(col(bucket))` — exactly
  * one task, and so one file, per bucket directory. That is the right
  * READ shape (probes list few files), but it caps the one-time base
  * write at `buckets` tasks and serializes a skewed bucket through a
  * single task — the next real ceiling at 100 TB once probe paths are
  * flat (round-12 verdict). Shuffling on (bucket, salt) instead lifts
  * write parallelism to `buckets × salts` tasks while
  * `partitionBy(bucket)` still lands per-bucket directories — each
  * dir now holds at most `salts` files, a file-listing cost probes
  * don't notice (partition pruning prunes whole dirs; PlanSpec pins
  * the dir counts, not file counts).
  *
  * The salt is a deterministic hash of a caller-chosen key column, so
  * replayed writes produce identical file contents per bucket
  * (overwrite-per-batch replay safety) and no nondeterministic
  * expression enters the plan.
  */
object LayoutWrite {

  /** Salt fan-out per bucket. 8 multiplies write parallelism of a
    * 64-bucket layout to 512 tasks and splits a pathological bucket
    * 8 ways, while keeping per-dir file counts far below where
    * listing would matter. */
  private[graft] val Salts = 8

  /** `df` shuffled on (bucket, hash(saltKey) % Salts) — the writer
    * then calls `.write.partitionBy(bucket)` exactly as before. */
  private[graft] def salted(df: DataFrame, bucket: String,
      saltKey: Column): DataFrame =
    df.withColumn("__salt", pmod(hash(saltKey), lit(Salts)))
      .repartition(col(bucket), col("__salt"))
      .drop("__salt")
}
