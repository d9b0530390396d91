package graft.streaming

import graft.pipeline.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental curation funnel — the streaming form of the
  * pp_filter_e2e batch pass (quality → repetition → dedup), for the
  * pipeline that curates documents AS THEY ARRIVE instead of in one
  * corpus-wide job.
  *
  * Stage split, and why:
  *  - Quality heuristics and within-doc repetition are SCAN-LOCAL
  *    (each verdict reads one document), so they stream unchanged —
  *    the same [[TextAnalysis]] code runs per micro-batch.
  *  - Dedup must see other documents. The streaming form uses EXACT
  *    dedup (md5 fingerprint): cross-batch state is just the set of
  *    fingerprints already kept, accumulated as parquet alongside the
  *    output and anti-joined per batch — bounded, mergeable, and
  *    replayable. MinHash-LSH near-dup dedup deliberately STAYS BATCH:
  *    its candidate state is the banded signature table, and a
  *    cross-batch band index is a design commitment (compaction,
  *    re-banding) documented as the batch/stream boundary rather than
  *    half-built here. A production pipeline runs the exact stage
  *    inline and the fuzzy stage as a periodic batch sweep.
  *
  * Exactly-once: every per-batch write lands in its own
  * `batch=<id>` partition directory with overwrite mode, so a batch
  * replayed after a crash overwrites its own output instead of
  * double-appending — the same idempotence discipline as
  * [[XmlStreamIngest]] compaction. Readers see the union via plain
  * partition discovery.
  *
  * Ordering contract: a fingerprint is kept at its FIRST occurrence
  * (min doc_id within a batch; earliest batch across batches). When
  * files arrive in ascending doc_id order — the natural order of an
  * append-only ingest — the stream's verdicts equal
  * [[batchVerdicts]] on the full corpus exactly (proven in
  * StreamingSpec).
  */
object CurationStream {

  /** Scan-local verdict signals for one batch of documents: quality
    * and repetition flags (thresholds on the r3-rounded scores both
    * engines agree on — see ta_quality / ta_repetition), whitespace
    * token count, and the exact-dedup fingerprint. Shared verbatim by
    * the batch and streaming forms — the parity the spec asserts is
    * of the ORCHESTRATION, not of two reimplementations. */
  def stageVerdicts(docs: DataFrame, qMin: Double = 0.65,
      rMax: Double = 0.01): DataFrame =
    TextAnalysis.repetitionStats(
        TextAnalysis.qualityMetrics(docs, "text"), "text", n = 3)
      .select(col("doc_id"), col("lang"), col("source"),
        TextAnalysis.whitespaceTokenCount(col("text")).as("ws_tokens"),
        md5(col("text")).as("fp"),
        (col("quality_score") >= qMin).as("pass_q"),
        (col("dup_fraction") <= rMax).as("pass_r"))

  /** Batch reference: per-document stage attribution over the whole
    * corpus. Dedup keeps the min-doc_id passer per fingerprint —
    * documents already dropped by quality or repetition never claim a
    * fingerprint slot (each doc is charged to the FIRST stage that
    * rejects it, so stage counts always sum to the input count). */
  def batchVerdicts(docs: DataFrame, qMin: Double = 0.65,
      rMax: Double = 0.01): DataFrame = {
    // eager checkpoint, same reason as processBatch: the verdict
    // frame is consumed twice (keeper resolution + the join's left
    // side), and it is VERDICT-sized (no text column), so cutting
    // the lineage here both runs the text analysis once and stops
    // projection collapse from inlining the tokenizer chain into the
    // keeper filter (which cost pp_curation_verdicts 33 s at sf0.1)
    val v = stageVerdicts(docs, qMin, rMax).localCheckpoint(true)
    val keepers = v.filter(col("pass_q") && col("pass_r"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id"))
    v.join(keepers, Seq("fp"), "left_outer")
      .select(col("doc_id"), col("lang"), col("source"), col("ws_tokens"),
        when(!col("pass_q"), "drop_quality")
          .when(!col("pass_r"), "drop_repetition")
          .when(col("doc_id") =!= col("keep_id"), "drop_dup")
          .otherwise("kept").as("stage"))
  }

  /** One micro-batch of the streaming funnel. Within-batch dedup keeps
    * the min-doc_id passer per fingerprint; cross-batch dedup
    * anti-joins the accumulated kept-fingerprint state. Writes this
    * batch's verdicts and its newly-kept fingerprints to their
    * `batch=<id>` partitions (overwrite ⇒ replay-idempotent). */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
      verdictsDir: String, seenDir: String,
      qMin: Double, rMax: Double): Unit = {
    val spark = batch.sparkSession
    // a reused id would overwrite a committed batch's kept-fingerprint
    // state with the new batch's — the old fingerprints vanish from
    // dedup state and their future duplicates record as kept
    IvfStream.requireNoPendingSwap(verdictsDir,
      "CurationStream.processBatch")
    IvfStream.requireNoPendingSwap(seenDir,
      "CurationStream.processBatch")
    IvfStream.requireFreshBatchId(seenDir, batchId,
      "CurationStream.processBatch")
    // the verdict signals feed three downstream branches — cut the
    // lineage once so the text analysis runs once per batch
    val v = stageVerdicts(batch, qMin, rMax).localCheckpoint(true)
    val passers = v.filter(col("pass_q") && col("pass_r"))
    val batchKeep = passers.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"))
    // Cross-batch state read, with two replay-safety properties:
    //  1. EXCLUDE this batch's own partition — a batch replayed after
    //     a crash that landed both writes would otherwise see the
    //     fingerprints it itself kept, demote every keeper to
    //     drop_dup, and overwrite its state partition empty (losing
    //     those fingerprints from dedup state forever).
    //  2. Empty state is assumed ONLY when schema inference finds no
    //     committed data files at all — the first batch, or a crash
    //     that left nothing but an uncommitted _temporary dir (both
    //     provably-empty states; a bare existence check would turn
    //     the latter into a permanent replay crash loop, since the
    //     repairing overwrite happens after the failing read). A
    //     committed-but-corrupt file still fails the batch loudly at
    //     execution time — a swallowed error there would silently
    //     reset dedup state and record cross-batch duplicates as
    //     kept.
    val seen =
      try
        spark.read.parquet(seenDir)
          .filter(col("batch") =!= lit(batchId))
          .select(col("fp"))
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if IvfStream.missingPath(e) =>
          spark.emptyDataFrame.withColumn("fp", lit("")).select(col("fp"))
      }
    val newKeep = batchKeep.join(seen, Seq("fp"), "left_anti")
      .localCheckpoint(true) // fix the winner set BEFORE state advances
    val verdicts = v.join(newKeep, Seq("fp"), "left_outer")
      .select(col("doc_id"), col("lang"), col("source"), col("ws_tokens"),
        when(!col("pass_q"), "drop_quality")
          .when(!col("pass_r"), "drop_repetition")
          .when(col("keep_id").isNull || col("doc_id") =!= col("keep_id"),
            "drop_dup")
          .otherwise("kept").as("stage"))
    verdicts.write.mode("overwrite").parquet(s"$verdictsDir/batch=$batchId")
    newKeep.select(col("fp")).write.mode("overwrite")
      .parquet(s"$seenDir/batch=$batchId")
  }

  /** Start the incremental funnel over a parquet document directory:
    * new files → scan-local quality/repetition → exact dedup against
    * all prior batches → per-batch verdict partitions under
    * `outDir/verdicts` (state under `outDir/seen`). Read the result
    * with plain partition discovery:
    * `spark.read.parquet(outDir + "/verdicts")`. */
  def run(spark: SparkSession, inputDir: String, outDir: String,
      checkpointDir: String, qMin: Double = 0.65, rMax: Double = 0.01,
      maxFilesPerTrigger: Int = 1,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val schema = spark.read.parquet(inputDir).schema
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        processBatch(b, id, s"$outDir/verdicts", s"$outDir/seen",
          qMin, rMax)
      }
      .start()
  }
}
