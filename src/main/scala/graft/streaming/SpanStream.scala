package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.TextAnalysis

/** Incremental maintenance of the exact-substring gram-span index
  * ([[TextAnalysis.writeSpanIndex]]) — the same base + delta design as
  * [[GramStream]], applied to the scrub tier so a live corpus keeps
  * "tokenize once, scrub cheap" as documents arrive.
  *
  * Layout (parallel per-kind delta trees, the [[Bm25Stream]] shape —
  * a single tree with a plain `tokens`/`grams` level between the
  * `batch=`/`gram_bucket=` partition dirs breaks Spark's partition
  * discovery):
  * {{{
  *   root/base/tokens/                    (doc_id, pos, tok)
  *   root/base/grams/gram_bucket=N/…      (doc_id, start, gram)
  *   root/base/params/                    (n, buckets)
  *   root/delta_tokens/batch=B/…          per-batch mini-layouts
  *   root/delta_grams/batch=B/gram_bucket=N/…
  * }}}
  *
  * Correct without merge logic: a document's positional token and
  * gram streams are functions of that document alone (the SAME
  * derivations the base writer uses), and the scrub's duplicated-gram
  * detection is a COUNT over the union — a gram's occurrences land in
  * one bucket in every generation, so the union holds exactly the
  * full corpus's rows and the scrub tail produces results
  * bit-identical to a full rebuild's. The
  * dd_exact_substring_incremental gate replays the inline oracle SQL
  * verbatim. Contract: documents are APPEND-ONLY across batches
  * (span coverage counts every occurrence — a re-crawled document
  * would double its grams' counts and needs the [[Bm25Stream]]
  * supersede sidecar, which no gate has required here; the
  * [[IvfStream.requireFreshBatchId]] guard rejects the id-reuse form
  * of the same hazard).
  *
  * 100 TB shape: an append tokenizes ONLY the batch and shuffles once
  * on gram_bucket; the full-corpus scrub is the same join/aggregate
  * plan as the single-base form over the union. [[compact]] folds
  * generations through the crash-safe staged swap shared with
  * [[IvfStream]]/[[Bm25Stream]]/[[GramStream]]. */
object SpanStream {

  /** Append one micro-batch: the batch's positional token and gram
    * mini-layouts under its own `delta/batch=<id>` subtree
    * (overwrite ⇒ replay-safe; reused ids rejected). The gram/token
    * derivations are [[TextAnalysis.writeSpanIndex]]'s, via the
    * shared span-row builders. */
  /** The generation trees a compaction folds and clears — shared by
    * [[compact]]'s swap and [[appendBatch]]'s id guard. */
  private val ClearDirs = Seq("delta_tokens", "delta_grams")

  private[graft] def appendBatch(batch: DataFrame, batchId: Long,
      root: String, textCol: String, keyCol: String, n: Int,
      buckets: Int): Unit = {
    // Deliberately NO recoverPendingSwap preamble: additive append,
    // manifest-protected in both mid-swap directions — see
    // GramStream.appendBatch for the full argument (recovering first
    // would double a replayed folded id's rows).
    // guard on the tree written LAST: a batch that crashed between
    // the two writes replays with id == max(delta_grams)+0/1, both
    // allowed; a reused lower id is rejected before any write
    IvfStream.requireFreshBatchId(s"$root/delta_grams", batchId,
      "SpanStream.appendBatch")
    val spark = batch.sparkSession
    graft.functions.GraftFunctions.register(spark)
    batch.select(col(keyCol).as("doc_id"),
        posexplode(TextAnalysis.tokens(col(textCol)))
          .as(Seq("pos", "tok")))
      .write.mode("overwrite")
      .parquet(s"$root/delta_tokens/batch=$batchId")
    batch.select(col(keyCol).as("doc_id"), posexplode(
        graft.functions.GraftFunctions.word_ngrams(col(textCol), n))
        .as(Seq("start", "gram")))
      .withColumn("gram_bucket",
        graft.pipeline.Retrieval.termBucket(col("gram"), buckets))
      .repartition(col("gram_bucket"))
      .write.mode("overwrite").partitionBy("gram_bucket")
      .parquet(s"$root/delta_grams/batch=$batchId")
  }

  private def unionGen(spark: SparkSession, base: DataFrame,
      deltaDir: String, cols: Seq[String]): DataFrame =
    try base.select(cols.map(col): _*).unionByName(
      spark.read.parquet(deltaDir).select(cols.map(col): _*))
    catch {
      // no delta written yet — the base alone is the layout
      case e: org.apache.spark.sql.AnalysisException
          if IvfStream.missingPath(e) => base.select(cols.map(col): _*)
    }

  /** The live token relation: base ∪ all streamed deltas. */
  private[graft] def tokens(spark: SparkSession, root: String): DataFrame =
    unionGen(spark, spark.read.parquet(s"$root/base/tokens"),
      s"$root/delta_tokens", Seq("doc_id", "pos", "tok"))

  /** The live positional-gram relation: base ∪ all streamed deltas. */
  private[graft] def grams(spark: SparkSession, root: String): DataFrame =
    unionGen(spark, spark.read.parquet(s"$root/base/grams"),
      s"$root/delta_grams", Seq("doc_id", "start", "gram"))

  /** [[TextAnalysis.exactSubstringScrubAtRest]] against the live
    * base ∪ delta layout — bit-identical to a full rebuild (span
    * coverage is a count over the union), which the
    * dd_exact_substring_incremental gate replays with the inline
    * oracle SQL verbatim. */
  def scrubIncremental(spark: SparkSession, root: String,
      minCount: Int = 2): DataFrame = {
    require(minCount >= 2, "scrubIncremental: minCount >= 2")
    val n = spark.read.parquet(s"$root/base/params")
      .collect()(0).getAs[Int]("n")
    TextAnalysis.scrubFrames(tokens(spark, root), grams(spark, root),
      n, minCount)
  }

  /** Fold base ∪ deltas into a fresh single-level base via the
    * staged swap shared with the other index maintainers (all reads
    * inside the write lambda so interrupted-swap recovery works with
    * base absent); `n` is carried forward — it is baked into the
    * spans and must survive the fold. */
  def compact(spark: SparkSession, root: String): Unit =
    IvfStream.stagedSwap(root, clear = ClearDirs) { staging =>
      val p = spark.read.parquet(s"$root/base/params").collect()(0)
      val (n, buckets) = (p.getAs[Int]("n"), p.getAs[Int]("buckets"))
      tokens(spark, root).write.mode("overwrite")
        .parquet(s"$staging/tokens")
      graft.pipeline.LayoutWrite.salted(
        grams(spark, root)
          .withColumn("gram_bucket",
            graft.pipeline.Retrieval.termBucket(col("gram"), buckets)),
        "gram_bucket", col("doc_id"))
        .write.mode("overwrite").partitionBy("gram_bucket")
        .parquet(s"$staging/grams")
      import spark.implicits._
      Seq((n, buckets)).toDF("n", "buckets").coalesce(1)
        .write.mode("overwrite").parquet(s"$staging/params")
      new java.io.File(staging, "_SUCCESS").createNewFile(): Unit
    }

  /** Start incremental span-index maintenance over a parquet
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
