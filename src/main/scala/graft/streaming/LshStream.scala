package graft.streaming

import graft.pipeline.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental MinHash-LSH candidate generation — the streaming form of
  * [[Dedup.minHashCandidates]], closing the batch-only boundary
  * [[CurationStream]] documents (its scaladoc keeps near-dup dedup as a
  * periodic batch sweep; this is the bounded-state incremental form for
  * pipelines that need candidates AS DOCUMENTS ARRIVE).
  *
  * State: the accumulated band-signature store — one `batch=<id>`
  * parquet partition per micro-batch holding that batch's (key, band,
  * band_hash) rows, exactly the relation the batch LSH self-joins. Per
  * micro-batch the candidates are
  *
  *  - within-batch: the batch's own band self-join (`key_a < key_b`) —
  *    identical code path to the batch form, and
  *  - cross-batch: the batch's bands equi-joined against all PRIOR
  *    batches' bands, pair order normalized with least/greatest.
  *
  * Every pair is emitted in exactly one batch partition — the batch of
  * its later-arriving member — so the union over partitions needs no
  * cross-partition dedup, and the result equals the batch form on the
  * full corpus for ANY arrival order (pairs are symmetric; nothing
  * depends on which member arrived first — unlike the funnel's
  * keeper-choice ordering contract). Proven stream==batch in
  * StreamingSpec over a corpus with cross-batch near-dups.
  *
  * Re-arrival (recrawl) semantics: LAST WRITE WINS per key, matching
  * the ingest tier's upsert contract. When a key re-arrives with
  * updated text, the prior-state read keeps only each key's
  * LATEST-batch bands (max-batch supersede below), so future batches
  * join against the current version, never a stale signature. This is
  * deliberately NOT the batch form's behavior on a corpus that still
  * contains both versions as separate rows (there, groupBy merges both
  * versions' shingles into one signature); the stream equals the batch
  * form run over the latest-version-per-key corpus — the corpus a
  * last-write-wins pipeline would actually have at rest. Pairs emitted
  * in earlier batches against a since-replaced version are candidates,
  * not verdicts; the exact-similarity verify stage re-checks them
  * against current text (same sketch-then-verify contract as
  * [[Dedup.verifiedJaccard]]).
  *
  * Exactly-once: both writes are overwrite-mode `batch=<id>` partition
  * directories, and the prior-state read EXCLUDES the batch's own
  * partition, so a replayed batch regenerates identical output instead
  * of double-joining against its own bands (the [[CurationStream]]
  * replay-safety discipline; same AnalysisException-means-empty
  * first-batch contract).
  *
  * 100 TB shape: per batch the work is bands(batch) ⨝ bands(seen) on
  * (band, band_hash) — bucket-local like the batch form, with the
  * stream's own bands on the (small) probe side. The state store only
  * ever grows by appending partitions; compaction of many small batch
  * partitions into fewer files is the same maintenance story as
  * [[XmlStreamIngest]] compaction and orthogonal to correctness. */
object LshStream {

  /** Read the accumulated candidate pairs (union of all batch
    * partitions; disjoint by construction, distinct for safety). */
  def pairs(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/pairs")
      .select(col("key_a"), col("key_b")).distinct()

  private[graft] def processBatch(batch: DataFrame, batchId: Long,
      pairsDir: String, bandsDir: String, textCol: String, keyCol: String,
      numHashes: Int, bands: Int): Unit = {
    val spark = batch.sparkSession
    // the band relation feeds both join sides and the state write —
    // cut the lineage once so shingling/minhashing runs once per batch
    val myBands = Dedup.lshBands(
      Dedup.minHashSignatures(batch, textCol, keyCol, numHashes),
      keyCol, numHashes, bands).localCheckpoint(true)
    val prior =
      try {
        // supersede: a re-arrived key's stale bands must not join —
        // keep only each key's latest-batch rows (one shuffle on key;
        // the band store is bands×keys rows, same scale as the join
        // it feeds)
        val w = org.apache.spark.sql.expressions.Window.partitionBy(keyCol)
        spark.read.parquet(bandsDir)
          .filter(col("batch") =!= lit(batchId))
          .withColumn("latest_batch", max(col("batch")).over(w))
          .filter(col("batch") === col("latest_batch"))
          .select(col(keyCol), col("band"), col("band_hash"))
      } catch {
        case _: org.apache.spark.sql.AnalysisException =>
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            myBands.schema)
      }
    val within = myBands
      .select(col(keyCol).as("key_a"), col("band"), col("band_hash"))
      .join(myBands.select(col(keyCol).as("key_b"), col("band"),
        col("band_hash")), Seq("band", "band_hash"))
      .filter(col("key_a") < col("key_b"))
    val cross = prior.select(col(keyCol).as("p_key"), col("band"),
        col("band_hash"))
      .join(myBands.select(col(keyCol).as("n_key"), col("band"),
        col("band_hash")), Seq("band", "band_hash"))
      .filter(col("p_key") =!= col("n_key"))
      .select(least(col("p_key"), col("n_key")).as("key_a"),
        greatest(col("p_key"), col("n_key")).as("key_b"))
    within.select(col("key_a"), col("key_b")).unionByName(cross)
      .distinct()
      .write.mode("overwrite").parquet(s"$pairsDir/batch=$batchId")
    myBands.write.mode("overwrite").parquet(s"$bandsDir/batch=$batchId")
  }

  /** Start incremental LSH over a parquet document directory: new files
    * → shingle → minhash → band → join against the accumulated band
    * store. Candidates land under `outDir/pairs`, band state under
    * `outDir/bands`; read results with [[pairs]].
    *
    * Pass `schema` explicitly to start the stream BEFORE the first
    * document lands (an empty/not-yet-created input dir has nothing to
    * infer from); when omitted, the schema is inferred from the files
    * already present. */
  def run(spark: SparkSession, inputDir: String, outDir: String,
      checkpointDir: String, textCol: String = "text",
      keyCol: String = "doc_id", numHashes: Int = 8, bands: Int = 4,
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
        processBatch(b, id, s"$outDir/pairs", s"$outDir/bands",
          textCol, keyCol, numHashes, bands)
      }
      .start()
  }
}
