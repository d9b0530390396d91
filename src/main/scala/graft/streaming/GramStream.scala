package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.Dedup

/** Incremental maintenance of the at-rest decontamination gram index
  * ([[Dedup.writeGramIndex]]) — the last index family to get the
  * base + delta treatment ([[IvfStream]] for the ANN layouts,
  * [[Bm25Stream]] for BM25): new corpus documents append their
  * distinct `(doc_id, gram)` rows as a `delta/batch=<id>` mini-layout
  * next to `base/grams`, and a decontamination run probes base ∪
  * deltas with the benchmark grams' buckets pruning EVERY
  * generation's scan.
  *
  * Layout:
  * {{{
  *   root/base/grams/gram_bucket=N/…     (doc_id, gram)
  *   root/delta/batch=B/gram_bucket=N/…  (doc_id, gram) per batch
  * }}}
  *
  * Correct without merge logic: a document's gram set is a function
  * of that document alone ([[Dedup.gramIndexRows]] is the single
  * shared derivation), `n_shared` is a per-doc countDistinct over
  * the matched rows, and a gram's rows land in one bucket in every
  * generation — so the union of probed buckets sees exactly the full
  * corpus' rows for the benchmark grams, and the
  * dd_contamination_incremental gate hash-matches the inline oracle
  * verbatim. Contract: documents are append-only across batches
  * (decontamination counts evidence per doc_id; a re-crawled
  * document would need the [[Bm25Stream]] supersede sidecar, which
  * no gate has yet required here).
  *
  * 100 TB shape: an append grams ONLY the batch and shuffles once on
  * gram_bucket; probe cost tracks the benchmark vocabulary, not the
  * corpus or the batch count. [[compact]] folds generations through
  * the crash-safe staged swap shared with [[IvfStream]] (marker +
  * folded-entries manifest, so post-crash appends survive
  * recovery). */
object GramStream {

  /** The live index: base ∪ all streamed deltas, `gram_bucket` a
    * partition column on every generation. */
  def layout(spark: SparkSession, root: String): DataFrame = {
    val cols = Seq(col("doc_id"), col("gram"),
      col("gram_bucket").cast("int").as("gram_bucket"))
    val base = spark.read.parquet(s"$root/base/grams").select(cols: _*)
    try base.unionByName(
      spark.read.parquet(s"$root/delta").select(cols: _*))
    catch {
      // no delta written yet — the base alone is the layout
      case e: org.apache.spark.sql.AnalysisException
          if IvfStream.missingPath(e) => base
    }
  }

  /** Index one micro-batch: gram ONLY the batch, write its rows as
    * the `delta/batch=<id>` mini-layout (overwrite ⇒ replay-safe). */
  private[graft] def appendBatch(batch: DataFrame, batchId: Long,
      root: String, textCol: String, keyCol: String, n: Int,
      buckets: Int): Unit = {
    // Deliberately NO recoverPendingSwap preamble (unlike the
    // prior-state readers Bm25Stream/LshStream/ChunkStore): this
    // append derives ONLY from the batch, and the _SWAP_READY
    // manifest makes a mid-swap append safe in both directions — a
    // NEW id is absent from the manifest so recovery keeps it, and a
    // replayed FOLDED id regenerates bit-identical trees that
    // recovery deletes while the staged base already holds their
    // rows. Recovering FIRST would invert the second case: the
    // replayed folded id would land AFTER the swap and double every
    // one of its rows (StreamingSpec pins both directions).
    IvfStream.requireFreshBatchId(s"$root/delta", batchId,
      "GramStream.appendBatch")
    Dedup.gramIndexRows(batch, textCol, keyCol, n, buckets)
      .repartition(col("gram_bucket"))
      .write.mode("overwrite").partitionBy("gram_bucket")
      .parquet(s"$root/delta/batch=$batchId")
  }

  /** [[Dedup.contaminationHits]] against the live base ∪ delta
    * index: the benchmark grams' bucket filter pushes into every
    * generation's scan — bit-identical to a full rebuild, which the
    * dd_contamination_incremental gate replays with the inline
    * oracle SQL. */
  def contaminationHitsIncremental(spark: SparkSession, root: String,
      testDocs: DataFrame, textCol: String, keyCol: String, n: Int,
      buckets: Int = 64): DataFrame =
    Dedup.contaminationHitsFrames(layout(spark, root), testDocs,
      textCol, keyCol, n, buckets)

  /** Fold base ∪ deltas into a fresh single-level base — the staged
    * swap shared with [[IvfStream]]/[[Bm25Stream]] (all reads inside
    * the write lambda so interrupted-swap recovery works with base
    * absent). */
  def compact(spark: SparkSession, root: String): Unit =
    IvfStream.stagedSwap(root) { staging =>
      graft.pipeline.LayoutWrite.salted(layout(spark, root),
          "gram_bucket", col("doc_id"))
        .write.mode("overwrite").partitionBy("gram_bucket")
        .parquet(s"$staging/grams")
      new java.io.File(staging, "_SUCCESS").createNewFile(): Unit
    }

  /** Start incremental gram-index maintenance over a parquet
    * document directory. Pass `schema` to start before the first
    * file lands. */
  def run(spark: SparkSession, inputDir: String, root: String,
      checkpointDir: String, textCol: String = "text",
      keyCol: String = "doc_id", n: Int = 5, buckets: Int = 64,
      maxFilesPerTrigger: Int = 1,
      trigger: Trigger = Trigger.AvailableNow(),
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : StreamingQuery = {
    val inputSchema =
      schema.getOrElse(spark.read.parquet(inputDir).schema)
    spark.readStream
      .schema(inputSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        appendBatch(b, id, root, textCol, keyCol, n, buckets)
      }
      .start()
  }
}
