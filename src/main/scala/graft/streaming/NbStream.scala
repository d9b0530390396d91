package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.Classify

/** Streaming maintainer for the multinomial Naive Bayes classifier
  * ([[Classify]]) — the curation-pipeline classifier retrained as
  * labeled data arrives, without ever rescanning history.
  *
  * The smoothed log-likelihood grid itself is NOT additive (the
  * Laplace denominator `n_tok_c + V` moves with every batch), but its
  * SUFFICIENT STATISTICS are: per-batch `(label, token, cnt)` token
  * counts and `(label, n_docs)` doc counts sum cell-wise, so each
  * micro-batch persists its own counts under `counts/batch=<id>` /
  * `docs/batch=<id>` and the live model derives from the folded sums
  * through [[Classify.nbModelFromCounts]] — bit-identical to
  * retraining on the union of all batches (the [[DqStream]]/
  * [[CmsStream]] additive-partials argument applied to the model
  * tier; the driver gate proves it against the one-shot oracle
  * verbatim).
  *
  * Scale shape: a batch's partial is vocabulary-sized (distinct
  * tokens seen in the batch × its labels), never corpus-sized; the
  * fold is one keyed sum over `batches × vocab` rows; deriving the
  * grid is model-sized work. Nothing here rescans documents.
  *
  * Layout contract: append-only additive partials — each batch's
  * rows derive ONLY from the batch (replay-idempotent overwrite),
  * reused ids rejected by the shared fresh-id guard. */
object NbStream {

  /** One micro-batch's additive sufficient statistics → its own
    * `batch=` partitions. */
  private[graft] def appendBatch(batch: DataFrame, batchId: Long,
      root: String, textCol: String, labelCol: String): Unit = {
    IvfStream.requireNoPendingSwap(root, "NbStream.appendBatch")
    IvfStream.requireFreshBatchId(s"$root/counts", batchId,
      "NbStream.appendBatch")
    val obsN = org.apache.spark.sql.Observation()
    Classify.tokenCounts(batch, textCol, labelCol)
      .observe(obsN, count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$root/counts/batch=$batchId")
    val obsL = org.apache.spark.sql.Observation()
    Classify.docCounts(batch, labelCol)
      .observe(obsL, count(lit(1)).as("n"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$root/docs/batch=$batchId")
    stampParams(batch.sparkSession, root, batchId,
      obsN.get("n").asInstanceOf[Long], obsL.get("n").asInstanceOf[Long])
  }

  /** Stamp the committed batch's partial sizes into
    * `params/batch=<id>`: `n_rows` (count partial rows) and
    * `n_labels` (doc partial rows) — the row-count hints
    * [[model]] feeds the broadcast size gate, so deriving the grid
    * never measures anything at read time (the derivation-time
    * sizing discipline). Both counts are captured via `observe`
    * DURING the partial writes themselves — no re-read, no extra
    * jobs per append/replay (round-17 advice). Σn_rows · Σn_labels
    * upper-bounds the grid (|vocab|·|labels| ≤ |folded counts|·
    * |labels|; folds only shrink partial sums) — an over-estimate
    * can only decline a broadcast that would have fit. Written
    * LAST: a crash beforehand leaves a missing-params batch, which
    * [[gridHint]] fails on loudly (replaying the batch rewrites
    * both and then stamps). */
  private def stampParams(spark: SparkSession, root: String,
      batchId: Long, nRows: Long, nLabels: Long): Unit = {
    import spark.implicits._
    Seq((nRows, nLabels)).toDF("n_rows", "n_labels").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/params/batch=$batchId")
  }

  /** Apply one RE-CRAWL batch: the superseded versions' counts as
    * NEGATIVE partials, the new versions' as positive, folded within
    * the batch (pure function of (old, new) ⇒ replay-idempotent
    * overwrite). Counts stay additive, so the folded model is
    * bit-identical to retraining on the latest snapshot — the
    * [[Bm25Stream]] supersede contract expressed in the
    * sufficient-statistics algebra instead of a sidecar: subtraction
    * IS the supersede. Contract: `oldVersions` must be exactly the
    * previously-streamed versions of the re-crawled documents
    * (subtracting a never-added version leaves a negative cell,
    * which the model derivation rejects loudly). */
  private[graft] def appendDiffBatch(oldVersions: DataFrame,
      newVersions: DataFrame, batchId: Long, root: String,
      textCol: String, labelCol: String): Unit = {
    IvfStream.requireNoPendingSwap(root, "NbStream.appendDiffBatch")
    IvfStream.requireFreshBatchId(s"$root/counts", batchId,
      "NbStream.appendDiffBatch")
    def neg(df: DataFrame, c: String) =
      df.select((Seq(col("label")) ++
        (if (c == "cnt") Seq(col("token")) else Seq.empty) :+
        (-col(c)).as(c)): _*)
    val obsN = org.apache.spark.sql.Observation()
    Classify.tokenCounts(newVersions, textCol, labelCol)
      .unionByName(
        neg(Classify.tokenCounts(oldVersions, textCol, labelCol), "cnt"))
      .groupBy(col("label"), col("token"))
      .agg(sum(col("cnt")).as("cnt"))
      .observe(obsN, count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$root/counts/batch=$batchId")
    val obsL = org.apache.spark.sql.Observation()
    Classify.docCounts(newVersions, labelCol)
      .unionByName(
        neg(Classify.docCounts(oldVersions, labelCol), "n_docs"))
      .groupBy(col("label"))
      .agg(sum(col("n_docs")).as("n_docs"))
      .observe(obsL, count(lit(1)).as("n"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$root/docs/batch=$batchId")
    stampParams(oldVersions.sparkSession, root, batchId,
      obsN.get("n").asInstanceOf[Long], obsL.get("n").asInstanceOf[Long])
  }

  /** Folded counts with supersede semantics: zero cells (a token
    * fully superseded out of a class) drop from the vocabulary
    * exactly as a retrain would never mint them; a NEGATIVE cell can
    * only come from subtracting a version that was never added and
    * fails loudly instead of feeding ln() a negative count. */
  private def foldedCounts(spark: SparkSession, root: String): DataFrame =
    try spark.read.parquet(s"$root/counts")
      .groupBy(col("label"), col("token"))
      .agg(sum(col("cnt")).as("cnt"))
      .select(col("label"), col("token"),
        when(col("cnt") >= 0, col("cnt")).otherwise(raise_error(
          concat(lit("NbStream: negative folded count for token '"),
            col("token"), lit("' in class '"), col("label"),
            lit("' — a diff batch subtracted a version that was " +
              "never added")))).as("cnt"))
      .filter(col("cnt") > 0)
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if IvfStream.missingPath(e) =>
        throw new IllegalStateException(
          s"NbStream: no count partials under $root — stream at " +
            "least one batch before asking for a model")
    }

  /** The folded grid-size hint from the stamped per-batch params:
    * Σn_rows · Σn_labels (see [[stampParams]]). Fails loudly when a
    * committed count batch has no params row — a pre-round-17 store
    * or a crash between the partial write and the stamp; replaying
    * the batch (or rebuilding the store) repairs both. */
  private def gridHint(spark: SparkSession, root: String): Long = {
    def batchIds(sub: String): Set[Long] = {
      val p = new org.apache.hadoop.fs.Path(s"$root/$sub")
      val fs = p.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) Set.empty
      else fs.listStatus(p).map(_.getPath.getName)
        .collect { case n if n.startsWith("batch=") =>
          n.drop(6).toLong }.toSet
    }
    val counts = batchIds("counts")
    val params = batchIds("params")
    val missing = counts -- params
    require(missing.isEmpty,
      s"NbStream: count batches ${missing.toSeq.sorted.mkString(",")} " +
        s"under $root have no stamped params — a pre-params store or " +
        "a crash between the partial write and the stamp; replay the " +
        "batch or rebuild the store")
    val p = spark.read.parquet(s"$root/params")
      .agg(sum(col("n_rows")), sum(col("n_labels"))).head()
    math.max(p.getLong(0), 1L) * math.max(p.getLong(1), 1L)
  }

  /** The live smoothed log-likelihood grid over everything streamed
    * so far — identical schema and values to
    * [[Classify.nbModel]] on the union of all appended batches. The
    * broadcast size gate is fed from the stamped params, so deriving
    * the grid runs no measuring jobs over the fold. */
  def model(spark: SparkSession, root: String): DataFrame =
    Classify.nbModelFromCountsHinted(foldedCounts(spark, root),
      gridHint(spark, root))

  /** The live log class priors over everything streamed so far
    * (zero-doc classes drop — a fully-superseded class has no prior,
    * exactly as a retrain would never see it). */
  def priors(spark: SparkSession, root: String): DataFrame =
    Classify.nbPriorsFromCounts(
      spark.read.parquet(s"$root/docs")
        .groupBy(col("label"))
        .agg(sum(col("n_docs")).as("n_docs"))
        // mirror foldedCounts: a NEGATIVE folded doc count can only
        // come from a diff batch that subtracted versions never added
        // — fail loudly instead of silently dropping the class for a
        // caller consulting only priors()
        .select(col("label"),
          when(col("n_docs") >= 0, col("n_docs")).otherwise(raise_error(
            concat(lit("NbStream: negative folded doc count for " +
              "class '"), col("label"),
              lit("' — a diff batch subtracted a version that was " +
                "never added")))).as("n_docs"))
        .filter(col("n_docs") > 0))

  /** Maintain the model store from a parquet directory of labeled
    * documents as files arrive. */
  def run(spark: SparkSession, inputDir: String, root: String,
      checkpointDir: String, textCol: String, labelCol: String,
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
        appendBatch(b, id, root, textCol, labelCol)
      }
      .start()
  }
}
