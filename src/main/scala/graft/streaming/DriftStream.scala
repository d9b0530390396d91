package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.TextAnalysis

/** Streaming maintainer for the PSI distribution-drift monitor
  * ([[TextAnalysis.distributionDrift]]) — the per-ingest-batch form
  * of "is the crawler drifting": the BASELINE slice's bucket counts
  * are persisted once, each arriving micro-batch contributes its own
  * nBuckets-row count relation under `root/counts/batch=<id>`, and
  * the report sums streamed counts cell-wise against the baseline.
  * Bucket counts are plain sums, so the streamed report is
  * BIT-IDENTICAL to the inline two-slice monitor over the same data —
  * the pp_drift_incremental gate replays the inline oracle SQL
  * verbatim (the [[CmsStream]] additive-cells argument applied to the
  * monitoring tier).
  *
  * Like [[CmsStream]], this is an append-only additive layout: the
  * per-batch write derives ONLY from the batch (replay-idempotent
  * overwrite, reused ids rejected), there is no supersede machinery,
  * and the bucketing parameters are persisted and validated on every
  * touch — counts bucketed under different (width, nBuckets) sum into
  * nonsense with no error anywhere, so drift in the CONTRACT fails
  * pointedly rather than corrupting the drift REPORT. */
object DriftStream {

  /** Persist the baseline slice's bucket counts (one nBuckets-row
    * relation). The bucketing parameters ride IN the baseline rows —
    * one file is the whole contract, so no crash ordering can pair a
    * new baseline with old parameters (or vice versa) and silently
    * mix two bucketings in one report. */
  def writeBaseline(docs: DataFrame, valueCol: String, root: String,
      bucketWidth: Long, nBuckets: Int): Unit = {
    require(bucketWidth >= 1 && nBuckets >= 2,
      "DriftStream.writeBaseline: bucketWidth >= 1 and nBuckets >= 2")
    require(!docs.isEmpty,
      "DriftStream.writeBaseline: the baseline slice is empty — a " +
        "drift monitor needs a reference distribution")
    bucketCounts(docs, valueCol, bucketWidth, nBuckets)
      .withColumn("bucket_width", lit(bucketWidth))
      .withColumn("n_buckets", lit(nBuckets))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$root/baseline")
  }

  private def bucketCounts(docs: DataFrame, valueCol: String,
      bucketWidth: Long, nBuckets: Int): DataFrame =
    docs.select(TextAnalysis
        .driftBucket(valueCol, bucketWidth, nBuckets).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))

  /** The bucketing contract, read off the baseline itself; fails
    * loudly when no baseline exists — a drift monitor without its
    * baseline is meaningless, never silently empty. */
  private def params(spark: SparkSession, root: String): (Long, Int) = {
    val r = spark.read.parquet(s"$root/baseline")
      .select(col("bucket_width"), col("n_buckets")).limit(1)
      .collect()(0)
    (r.getAs[Long]("bucket_width"), r.getAs[Int]("n_buckets"))
  }

  /** One micro-batch's bucket counts → its own `batch=` partition,
    * bucketed under and STAMPED WITH the baseline's contract — so a
    * later rebaseline under different parameters cannot silently mix
    * with counts streamed under the old ones ([[report]] validates
    * the stamps agree). */
  private[graft] def appendBatch(batch: DataFrame, batchId: Long,
      root: String, valueCol: String): Unit = {
    IvfStream.requireNoPendingSwap(root, "DriftStream.appendBatch")
    IvfStream.requireFreshBatchId(s"$root/counts", batchId,
      "DriftStream.appendBatch")
    val (w, n) = params(batch.sparkSession, root)
    bucketCounts(batch, valueCol, w, n)
      .withColumn("bucket_width", lit(w))
      .withColumn("n_buckets", lit(n))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$root/counts/batch=$batchId")
  }

  /** The live drift report: baseline counts vs the cell-wise sum of
    * every streamed batch's counts, through the SAME PSI tail as the
    * inline monitor — bit-identical to [[TextAnalysis
    * .distributionDrift]] over baseline ∪ arrived documents. */
  def report(spark: SparkSession, root: String): DataFrame = {
    val (w, n) = params(spark, root)
    val base = spark.read.parquet(s"$root/baseline")
      .select(col("bucket"), col("n").as("n_base"))
    val arrived =
      try {
        val c = spark.read.parquet(s"$root/counts")
        // counts streamed under a DIFFERENT bucketing (a rebaseline
        // happened without clearing the counts tree) would sum into a
        // nonsense report with no error anywhere — fail pointedly
        val drifted = c
          .filter(col("bucket_width") =!= lit(w) ||
            col("n_buckets") =!= lit(n))
          .select(col("bucket_width"), col("n_buckets"))
          .limit(1).collect()
        require(drifted.isEmpty,
          s"DriftStream.report: counts under $root were streamed " +
            s"with bucketing ${drifted.headOption.orNull} but the " +
            s"baseline declares (bucket_width=$w, n_buckets=$n) — " +
            "clear the counts tree when rebaselining under new " +
            "parameters")
        c.groupBy(col("bucket")).agg(sum(col("n")).as("n_new"))
      } catch {
        // nothing streamed yet — an all-zero new slice is still a
        // well-defined (maximally drifted) report
        case e: org.apache.spark.sql.AnalysisException
            if IvfStream.missingPath(e) =>
          spark.range(0).select(col("id").cast("int").as("bucket"),
            col("id").as("n_new"))
      }
    TextAnalysis.psiFromCounts(
      base.join(arrived, Seq("bucket"), "full_outer")
        .select(col("bucket"),
          coalesce(col("n_base"), lit(0L)).as("n_base"),
          coalesce(col("n_new"), lit(0L)).as("n_new")),
      n)
  }

  /** Monitor a parquet document directory as files arrive. */
  def run(spark: SparkSession, inputDir: String, root: String,
      checkpointDir: String, valueCol: String = "n_chars",
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
        appendBatch(b, id, root, valueCol)
      }
      .start()
  }
}
