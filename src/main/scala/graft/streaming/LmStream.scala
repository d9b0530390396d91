package graft.streaming

import graft.pipeline.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Train-batch / score-stream: the bigram-LM quality score
  * ([[TextAnalysis.bigramLmScore]]) applied incrementally — the shape
  * every model-based quality filter takes in a live pipeline: the
  * model is TRAINED once, on a reference corpus, by a batch job; the
  * stream only APPLIES it.
  *
  * Why this split streams cleanly where the self-trained form cannot:
  * scoring is per-document given the model (a vocabulary-sized
  * relation that broadcast-joins each micro-batch), so there is no
  * cross-batch state at all — unlike dedup, two documents never
  * interact. Retraining on fresh data is a periodic batch job that
  * swaps the model relation; the stream's plan shape never changes.
  *
  * Exactly-once: per-batch `batch=<id>` partition overwrite, the same
  * replay-idempotence discipline as [[CurationStream]] — and with no
  * cross-batch state there is nothing else to protect.
  */
object LmStream {

  private[graft] def processBatch(batch: DataFrame, batchId: Long,
      model: DataFrame, outDir: String): Unit = {
    // no cross-batch state, but a reused id would still overwrite a
    // committed batch's verdicts with a different batch's
    IvfStream.requireNoPendingSwap(outDir, "LmStream.processBatch")
    IvfStream.requireFreshBatchId(outDir, batchId,
      "LmStream.processBatch")
    TextAnalysis.scoreWithBigramModel(batch, model, "text", "doc_id")
      .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
  }

  /** Start scoring a parquet document directory as files arrive.
    * `trainDocs` is the reference corpus; the model is trained ONCE
    * here and persisted to parquet under `outDir/_model` (an
    * underscore path, so verdict partition discovery skips it), then
    * read back — durable storage rather than executor-memory
    * checkpoint blocks, because the stream runs indefinitely and a
    * single executor loss must not poison every later micro-batch.
    * Read the verdicts with plain partition discovery over `outDir`. */
  def run(spark: SparkSession, trainDocs: DataFrame, inputDir: String,
      outDir: String, checkpointDir: String,
      maxFilesPerTrigger: Int = 1,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val modelDir = s"$outDir/_model"
    TextAnalysis.bigramModel(trainDocs, "text")
      .write.mode("overwrite").parquet(modelDir)
    val model = spark.read.parquet(modelDir)
    val schema = spark.read.parquet(inputDir).schema
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        processBatch(b, id, model, outDir)
      }
      .start()
  }
}
