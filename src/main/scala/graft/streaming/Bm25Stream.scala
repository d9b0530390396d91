package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.Retrieval

/** Incremental maintenance of the at-rest BM25 postings index
  * ([[Retrieval.writeBm25Index]]) — the same base + delta design the
  * ANN layouts get from [[IvfStream]], applied to the lexical tier so
  * a live corpus keeps "write once, probe cheap" without re-indexing
  * per batch.
  *
  * Layout (one generation per directory, append-only documents):
  * {{{
  *   root/base/postings/term_bucket=N/…   (doc_id, dl, term, tf)
  *   root/base/stats/                     (n_docs, avgdl, n, sdl)
  *   root/delta/batch=B/term_bucket=N/…   postings rows per batch
  *   root/delta_stats/batch=B/            (n, sdl) per batch
  * }}}
  *
  * Why this is correct without any merge logic: BM25's corpus state
  * is (postings, df, n_docs, avgdl). A document's postings rows (tf,
  * dl) are functions of that document alone, so a delta batch writes
  * rows bit-identical to a full rebuild's ([[Retrieval.postingsFromTok]]
  * is the single shared derivation). df is recounted by every probe
  * from the rows it reads — a term's postings land in ONE bucket in
  * every generation (same [[Retrieval.termBucket]]), so the union of
  * probed buckets sees exactly the full corpus' rows for the query
  * terms. And the corpus scalars combine exactly: each generation
  * stores integral `(n, sdl)`, and `n_docs = Σn`,
  * `avgdl = Σsdl / Σn` reproduce the inline `avg()` bit-for-bit
  * (integer-valued double sums below 2^53 are exact, so generation
  * order cannot perturb them). The pp_bm25_incremental gate proves
  * the whole chain against the INLINE oracle SQL verbatim.
  *
  * Contract: documents are append-only across batches (a doc_id
  * lives in exactly one generation). Re-crawled/updated documents
  * need the supersede-sidecar pattern [[LshStream]] implements;
  * composing it here is mechanical (broadcast stale-key sidecar,
  * anti-join at probe time) and deliberately out of scope until a
  * gate needs it.
  *
  * 100 TB shape: a delta append tokenizes ONLY the batch and shuffles
  * on term_bucket once; probes prune `term_bucket=` partitions on the
  * base AND every delta (the union pushes the literal IN into each
  * scan — PlanSpec-pinned), so steady-state probe cost tracks the
  * query vocabulary, not the corpus or the batch count. When small
  * delta files accumulate, [[compact]] folds them into a fresh base
  * via the crash-safe staged swap shared with [[IvfStream]].
  */
object Bm25Stream {

  /** The live postings relation: base ∪ all streamed deltas, with
    * `term_bucket` as a partition column on every generation so a
    * probe filter prunes each scan at file-listing time. */
  def layout(spark: SparkSession, root: String): DataFrame = {
    val cols = Seq(col("doc_id"), col("dl"), col("term"), col("tf"),
      col("term_bucket").cast("int").as("term_bucket"))
    val base = spark.read.parquet(s"$root/base/postings")
      .select(cols: _*)
    try base.unionByName(
      spark.read.parquet(s"$root/delta").select(cols: _*))
    catch {
      // no delta written yet — the base alone is the layout
      case _: org.apache.spark.sql.AnalysisException => base
    }
  }

  /** Every generation's integral `(n, sdl)` stats rows:
    * base + streamed deltas. */
  private def genStats(spark: SparkSession, root: String): DataFrame = {
    val base = spark.read.parquet(s"$root/base/stats")
      .select(col("n"), col("sdl"))
    try base.unionByName(
      spark.read.parquet(s"$root/delta_stats")
        .select(col("n"), col("sdl")))
    catch {
      case _: org.apache.spark.sql.AnalysisException => base
    }
  }

  /** The live corpus scalars as one `(n_docs, avgdl)` row: exact
    * integral combine over base + delta generation stats. */
  def stats(spark: SparkSession, root: String): DataFrame =
    genStats(spark, root)
      .agg(sum(col("n")).as("n"), sum(col("sdl")).as("sdl"))
      .select(col("n").cast("double").as("n_docs"),
        (col("sdl").cast("double") / col("n")).as("avgdl"))

  /** Index one micro-batch: tokenize the batch alone, write its
    * postings as the `delta/batch=<id>` mini-layout and its integral
    * stats next to it (overwrite ⇒ replay-safe — a crash-replayed
    * batch regenerates byte-identical files instead of duplicating
    * evidence). */
  private[graft] def appendBatch(batch: DataFrame, batchId: Long,
      root: String, textCol: String, keyCol: String,
      buckets: Int): Unit = {
    // eager: the postings and stats writes are two ACTIONS; the lazy
    // form would tokenize the batch twice (micro-batch-sized, so the
    // materialization is the cheap side — the PQ-codewords rule)
    val tok = Retrieval.tokenized(batch, textCol, keyCol)
      .localCheckpoint()
    Retrieval.postingsFromTok(tok, buckets)
      .repartition(col("term_bucket"))
      .write.mode("overwrite").partitionBy("term_bucket")
      .parquet(s"$root/delta/batch=$batchId")
    Retrieval.genStatsFromTok(tok)
      .write.mode("overwrite")
      .parquet(s"$root/delta_stats/batch=$batchId")
  }

  /** [[Retrieval.bm25TopK]] against the live base ∪ delta layout:
    * the probe-set filter pushes into every generation's scan, df is
    * recounted from the probed rows, the corpus scalars are the exact
    * generation combine — bit-identical to a full rebuild, which the
    * pp_bm25_incremental gate replays with the inline oracle SQL. */
  def bm25TopKIncremental(spark: SparkSession, root: String,
      queries: DataFrame, qKeyCol: String, qTextCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      buckets: Int = 64): DataFrame =
    Retrieval.bm25TopKFrames(layout(spark, root), stats(spark, root),
      queries, qKeyCol, qTextCol, k, k1, b, buckets)

  /** Fold base ∪ deltas into a fresh single-level base and drop the
    * delta trees — same crash-safe staged swap as [[IvfStream]]
    * (staging fully written first; interrupted-swap recovery removes
    * surviving delta trees before completing the move, since the
    * staged copy already contains their rows — a survivor would
    * double tf/df evidence). Postings are re-clustered one file per
    * bucket; the combined stats are rewritten in the base format. */
  def compact(spark: SparkSession, root: String): Unit =
    // every read happens INSIDE the write lambda: stagedSwap only
    // invokes it outside the interrupted-swap recovery branch, where
    // base/ is guaranteed present (reading the layout up front would
    // crash recovery itself — base absent, only staging complete)
    IvfStream.stagedSwap(root,
      clear = Seq("delta", "delta_stats")) { staging =>
      val posts = layout(spark, root).localCheckpoint()
      // integral combine, collected as longs — no double round-trip
      val t = genStats(spark, root)
        .agg(sum(col("n")).as("n"), sum(col("sdl")).as("sdl"))
        .collect()(0)
      val (n, sdl) = (t.getLong(0), t.getLong(1))
      posts
        .repartition(col("term_bucket"))
        .write.mode("overwrite").partitionBy("term_bucket")
        .parquet(s"$staging/postings")
      spark.range(1)
        .select(lit(n).cast("double").as("n_docs"),
          (lit(sdl).cast("double") / lit(n).cast("double")).as("avgdl"),
          lit(n).as("n"), lit(sdl).as("sdl"))
        .write.mode("overwrite").parquet(s"$staging/stats")
      new java.io.File(staging, "_SUCCESS").createNewFile(): Unit
    }

  /** Start incremental BM25 maintenance over a parquet document
    * directory: new files → tokenize → delta postings append. Pass
    * `schema` to start before the first file lands. */
  def run(spark: SparkSession, inputDir: String, root: String,
      checkpointDir: String, textCol: String = "text",
      keyCol: String = "doc_id", buckets: Int = 64,
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
        appendBatch(b, id, root, textCol, keyCol, buckets)
      }
      .start()
  }
}
