package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.TextAnalysis

/** Streaming maintainer for the n-gram LM family — ONE additive
  * (n, gram, cnt) store serving every smoothing scheme and order
  * (Jelinek-Mercer, interpolated/modified Kneser-Ney at orders 2-5,
  * Stupid Backoff): the corpus-filter model retrained as data
  * arrives, without rescanning history — the [[NbStream]]
  * sufficient-statistics pattern applied to the LM tier.
  *
  * The interpolated grid is NOT additive (p_ML denominators and the
  * unigram total move with every batch) but its sufficient statistics
  * are: per-batch `(n, gram, cnt)` unigram/bigram occurrence counts
  * sum cell-wise, so each micro-batch persists its own counts under
  * `counts/batch=<id>` and the live grids derive from the folded sums
  * — bit-identical to retraining on the union of all batches, which
  * the driver gate proves against the one-shot oracle verbatim.
  *
  * Scale shape: a batch's partial is model-sized (distinct grams seen
  * in the batch); the fold is one keyed sum; grid derivation is
  * model-sized joins. Nothing rescans documents.
  *
  * Layout contract: append-only additive partials — replay-idempotent
  * overwrite, reused ids rejected, re-crawls supersede by NEGATIVE
  * partials ([[appendDiffBatch]]), foreign pending swaps fail fast. */
object NgramLmStream {

  /** One micro-batch's additive counts → its own `batch=` partition.
    * `maxN` is a LAYOUT parameter: every batch under one root must
    * carry the same orders, or the fold under-counts the orders a
    * batch omitted — so the FIRST append stamps `maxn.json` and
    * every later append (including re-crawl diffs) validates against
    * it instead of trusting caller discipline. */
  private[graft] def appendBatch(batch: DataFrame, batchId: Long,
      root: String, textCol: String, maxN: Int = 2,
      minN: Int = 1, boundary: Boolean = false): Unit = {
    IvfStream.requireNoPendingSwap(root, "NgramLmStream.appendBatch")
    IvfStream.requireFreshBatchId(s"$root/counts", batchId,
      "NgramLmStream.appendBatch")
    requireSameMaxN(root, maxN, minN, boundary,
      "NgramLmStream.appendBatch")
    TextAnalysis.ngramLmCounts(batch, textCol, maxN, minN, boundary)
      .write.mode("overwrite").parquet(s"$root/counts/batch=$batchId")
  }

  /** Stamp-or-validate the store's gram-stream parameters (order
    * range + boundary padding): a mixed store would silently
    * under-count the orders some batches omitted — or mix padded and
    * unpadded gram streams — which no fold-side check can see. The
    * stamp is written before the first batch's parquet commit, so a
    * crash in that window leaves a stamp with NO committed `batch=`
    * partition — that store is still cold (the fold would fail
    * loudly on zero partials), so a later first append with
    * DIFFERENT parameters is legitimate and re-stamps instead of
    * rejecting (round-16 ADVICE: don't let a batch that never landed
    * dictate the layout). min_n/boundary default to 1/false when the
    * stamp predates them (pre-round-16 stores). */
  private def requireSameMaxN(root: String, maxN: Int, minN: Int,
      boundary: Boolean, what: String): Unit = {
    val f = new java.io.File(IvfStream.localPath(root), "maxn.json")
    val stamped: Option[(Int, Int, Boolean)] =
      if (!f.exists()) None
      else {
        val body = new String(
          java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        """"max_n":(\d+)""".r.findFirstMatchIn(body)
          .map(_.group(1).toInt)
          .map { mx =>
            (mx,
              """"min_n":(\d+)""".r.findFirstMatchIn(body)
                .map(_.group(1).toInt).getOrElse(1),
              """"boundary":(true|false)""".r.findFirstMatchIn(body)
                .exists(_.group(1) == "true"))
          }
      }
    if (stamped != Some((maxN, minN, boundary))) {
      if (stamped.nonEmpty) {
        // Hadoop-API listing (the requireFreshBatchId discipline): a
        // java.io listing is silently empty on non-local filesystems
        val p = new org.apache.hadoop.fs.Path(s"$root/counts")
        val fs = p.getFileSystem(IvfStream.hadoopConf())
        val committed = fs.exists(p) && fs.listStatus(p)
          .exists(_.getPath.getName.startsWith("batch="))
        require(!committed,
          s"$what: store at $root was stamped " +
            s"(max_n, min_n, boundary)=${stamped.get} by its first " +
            s"batch, this append carries ($maxN, $minN, $boundary) " +
            "— a mixed store under-counts the orders some batches " +
            "omit (or mixes padded and unpadded gram streams); " +
            "rebuild the store or match the stamped parameters")
      }
      Option(f.getParentFile).foreach(_.mkdirs())
      val w = new java.io.PrintWriter(f, "UTF-8")
      try w.print(s"""{"max_n":$maxN,"min_n":$minN,""" +
        s""""boundary":$boundary}""")
      finally w.close()
    }
  }

  /** Apply one re-crawl batch: superseded versions' counts as
    * NEGATIVE partials, new versions' as positive, folded within the
    * batch — subtraction IS the supersede (the [[NbStream]]
    * contract). `oldVersions` must be exactly the previously-streamed
    * versions; subtracting a never-added version leaves a negative
    * cell that the model derivation rejects loudly. */
  private[graft] def appendDiffBatch(oldVersions: DataFrame,
      newVersions: DataFrame, batchId: Long, root: String,
      textCol: String, maxN: Int = 2, minN: Int = 1,
      boundary: Boolean = false): Unit = {
    IvfStream.requireNoPendingSwap(root,
      "NgramLmStream.appendDiffBatch")
    IvfStream.requireFreshBatchId(s"$root/counts", batchId,
      "NgramLmStream.appendDiffBatch")
    requireSameMaxN(root, maxN, minN, boundary,
      "NgramLmStream.appendDiffBatch")
    TextAnalysis.ngramLmCounts(newVersions, textCol, maxN, minN,
        boundary)
      .unionByName(
        TextAnalysis.ngramLmCounts(oldVersions, textCol, maxN, minN,
          boundary)
        .select(col("n"), col("gram"), (-col("cnt")).as("cnt")))
      .groupBy(col("n"), col("gram"))
      .agg(sum(col("cnt")).as("cnt"))
      .write.mode("overwrite").parquet(s"$root/counts/batch=$batchId")
  }

  /** Folded counts with supersede semantics: zero cells drop exactly
    * as a retrain would never mint them; a negative cell can only
    * come from subtracting a version never added and fails loudly.
    * `upToN` prunes BELOW the fold: a bigram consumer of the shared
    * n=1..5 store must not pay a 5-order shuffle for the two orders
    * it reads (the filter reaches the parquet scan as a pushed
    * predicate, and per-cell supersede algebra is untouched —
    * orders fold independently). */
  private def foldedCounts(spark: SparkSession,
      root: String, upToN: Int = Int.MaxValue): DataFrame =
    try spark.read.parquet(s"$root/counts")
      .filter(col("n") <= upToN)
      .groupBy(col("n"), col("gram"))
      .agg(sum(col("cnt")).as("cnt"))
      .select(col("n"), col("gram"),
        when(col("cnt") >= 0, col("cnt")).otherwise(raise_error(
          concat(lit("NgramLmStream: negative folded count for " +
            "gram '"), col("gram"),
            lit("' — a diff batch subtracted a version that was " +
              "never added")))).as("cnt"))
      .filter(col("cnt") > 0)
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if IvfStream.missingPath(e) =>
        throw new IllegalStateException(
          s"NgramLmStream: no count partials under $root — stream " +
            "at least one batch before asking for a model")
    }

  /** The folded live counts — the shared input BOTH smoothing-family
    * model derivations consume ([[model]] for Jelinek-Mercer;
    * [[graft.pipeline.TextAnalysis.ngramLmKnModel]] for Kneser-Ney:
    * its continuation / fan-out / type counts are distinct-row counts
    * over the folded pair table, so one store serves both). */
  def foldedCountsOf(spark: SparkSession, root: String,
      upToN: Int = Int.MaxValue): DataFrame =
    foldedCounts(spark, root, upToN)

  /** The live (bigram grid, unigram backoff grid) over everything
    * streamed so far — identical to
    * [[TextAnalysis.ngramLmSmoothedModel]] on the union of all
    * appended batches. */
  def model(spark: SparkSession,
      root: String): (DataFrame, DataFrame) =
    TextAnalysis.ngramLmSmoothedModel(
      foldedCounts(spark, root, upToN = 2))

  /** Maintain the count store from a parquet document directory as
    * files arrive. */
  def run(spark: SparkSession, inputDir: String, root: String,
      checkpointDir: String, textCol: String,
      maxFilesPerTrigger: Int = 1,
      trigger: Trigger = Trigger.AvailableNow(),
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      maxN: Int = 2)
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
        appendBatch(b, id, root, textCol, maxN)
      }
      .start()
  }
}
