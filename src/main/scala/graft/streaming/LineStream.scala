package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.TextAnalysis

/** Streaming maintainer for the corpus-wide boilerplate hot-line set
  * ([[TextAnalysis.boilerplateScrub]]) — the RefinedWeb/CCNet-style
  * repeated-paragraph detector maintained as data arrives, without
  * rescanning history per scrub.
  *
  * The hot SET itself is a threshold over corpus-wide counts, but its
  * SUFFICIENT STATISTICS are additive: per-batch `(lf, cnt)`
  * non-blank line-fingerprint counts sum cell-wise, so each
  * micro-batch persists its own counts under `counts/batch=<id>` and
  * the live hot set derives from the folded sums — bit-identical to
  * recounting the union of all batches (the [[NbStream]]/[[CmsStream]]
  * additive-partials argument applied to the line tier; the driver
  * gate proves it against the one-shot oracle verbatim).
  *
  * Scale shape: a batch's partial is line-TYPE-sized (distinct
  * fingerprints seen in the batch), never corpus-sized; the fold is
  * one keyed sum over `batches × line types`; the hot set is a tiny
  * fraction of that (the heavy hitters). Nothing here rescans
  * documents.
  *
  * Layout contract: append-only additive partials — each batch's rows
  * derive ONLY from the batch (replay-idempotent overwrite), reused
  * ids rejected by the shared fresh-id guard, foreign pending swaps
  * rejected up front (this writer owns no compaction tier). */
object LineStream {

  /** One micro-batch's additive line-fingerprint counts → its own
    * `batch=` partition. */
  private[graft] def appendBatch(batch: DataFrame, batchId: Long,
      root: String, textCol: String): Unit = {
    IvfStream.requireNoPendingSwap(root, "LineStream.appendBatch")
    IvfStream.requireFreshBatchId(s"$root/counts", batchId,
      "LineStream.appendBatch")
    TextAnalysis.boilerplateLineCounts(batch, textCol)
      .write.mode("overwrite").parquet(s"$root/counts/batch=$batchId")
  }

  /** Apply one RE-CRAWL batch: the superseded versions' line counts
    * as NEGATIVE partials, the new versions' as positive, folded
    * within the batch (pure function of (old, new) ⇒ replay-
    * idempotent overwrite) — subtraction IS the supersede, so the
    * folded hot set is bit-identical to recounting the latest
    * snapshot. Contract: `oldVersions` must be exactly the
    * previously-streamed versions of the re-crawled documents
    * (subtracting a never-added line leaves a negative cell, which
    * the fold rejects loudly). */
  private[graft] def appendDiffBatch(oldVersions: DataFrame,
      newVersions: DataFrame, batchId: Long, root: String,
      textCol: String): Unit = {
    IvfStream.requireNoPendingSwap(root, "LineStream.appendDiffBatch")
    IvfStream.requireFreshBatchId(s"$root/counts", batchId,
      "LineStream.appendDiffBatch")
    TextAnalysis.boilerplateLineCounts(newVersions, textCol)
      .unionByName(
        TextAnalysis.boilerplateLineCounts(oldVersions, textCol)
          .select(col("lf"), (-col("cnt")).as("cnt")))
      .groupBy(col("lf")).agg(sum(col("cnt")).as("cnt"))
      .write.mode("overwrite").parquet(s"$root/counts/batch=$batchId")
  }

  /** Folded counts with supersede semantics: zero cells (a line type
    * fully superseded out of the corpus) drop exactly as a recount
    * would never mint them; a NEGATIVE cell can only come from
    * subtracting a version that was never added and fails loudly. */
  private[graft] def foldedCounts(spark: SparkSession,
      root: String): DataFrame =
    try spark.read.parquet(s"$root/counts")
      .groupBy(col("lf")).agg(sum(col("cnt")).as("cnt"))
      .select(col("lf"),
        when(col("cnt") >= 0, col("cnt")).otherwise(raise_error(
          concat(lit("LineStream: negative folded count for line "),
            lit("fingerprint '"), col("lf"),
            lit("' — a diff batch subtracted a version that was " +
              "never added")))).as("cnt"))
      .filter(col("cnt") > 0)
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if IvfStream.missingPath(e) =>
        throw new IllegalStateException(
          s"LineStream: no count partials under $root — stream at " +
            "least one batch before asking for the hot set")
    }

  /** The live hot set (line fingerprints whose corpus-wide count
    * exceeds `maxRepeats`) over everything streamed so far —
    * identical to the one-shot hot set
    * [[TextAnalysis.boilerplateScrub]] computes inline, which is what
    * lets the at-rest scrub share the inline oracle verbatim. */
  def hotSet(spark: SparkSession, root: String,
      maxRepeats: Long = 2L): DataFrame =
    foldedCounts(spark, root)
      .filter(col("cnt") > maxRepeats)
      .select(col("lf"))
}
