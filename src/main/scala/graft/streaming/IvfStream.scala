package graft.streaming

import graft.pipeline.{PartitionedAnn, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental maintenance of the cent_id-partitioned at-rest IVF ANN
  * layout — the streaming half of the "build once, probe cheap"
  * contract. [[PartitionedAnn.writeIvfPartitioned]] builds the base
  * layout; this module keeps it fresh as new embeddings arrive,
  * without rebuilding: per micro-batch, assign each new vector to its
  * nearest centroid (the SAME [[Similarity.ivfAssign]] rule the base
  * writer uses, against the SAME fixed codebook) and write the rows as
  * a `delta/batch=<id>/cent_id=<c>/` mini-layout next to `base/`.
  *
  * Probes read base ∪ deltas ([[layout]] +
  * [[PartitionedAnn.ivfTopKFrames]]): the probe set prunes `cent_id=`
  * partitions in every delta exactly as in the base, so a query pays
  * listing+scan proportional to probed clusters, never corpus size.
  * Because assignment is deterministic under a fixed codebook, the
  * incremental layout holds row-for-row the SAME (vector, cent_id)
  * pairs a full rebuild would — the ann_ivf_incremental gate proves it
  * by hash-matching the full-rebuild oracle verbatim.
  *
  * Replay safety: each delta write overwrites its own `batch=<id>`
  * subtree, so a crash-replay regenerates identical files instead of
  * appending duplicates (the [[LshStream]]/[[CurationStream]]
  * discipline).
  *
  * 100 TB shape: assignment is a broadcast of the codebook against the
  * micro-batch (both small) — nothing corpus-sized shuffles, and the
  * accumulated layout is only ever APPENDED to, one new directory
  * level per batch. Two maintenance jobs own the rest, both offline
  * and orthogonal to correctness: compaction folds deltas into base
  * when small files accumulate (same story as [[XmlStreamIngest]]
  * compaction), and codebook refresh re-clusters when drift degrades
  * recall — until then new vectors get exactly the recall the base
  * build would give them, since both use one codebook. */
object IvfStream {

  /** The live layout: base ∪ all streamed deltas, as the
    * `(c_id, c_vec, c_norm, cent_id)` relation probes consume. */
  def layout(spark: SparkSession, root: String): DataFrame = {
    val cols = Seq(col("c_id"), col("c_vec"), col("c_norm"),
      col("cent_id").cast("int").as("cent_id"))
    val base = spark.read.parquet(s"$root/base").select(cols: _*)
    try base.unionByName(
      spark.read.parquet(s"$root/delta").select(cols: _*))
    catch {
      // no delta written yet — the base alone is the layout
      case _: org.apache.spark.sql.AnalysisException => base
    }
  }

  /** Assign one micro-batch against the fixed codebook and write it
    * as the `delta/batch=<id>` mini-layout (overwrite ⇒ replay-safe). */
  private[graft] def appendBatch(batch: DataFrame, batchId: Long,
      root: String, centroids: DataFrame, vecCol: String,
      keyCol: String): Unit =
    Similarity.ivfAssign(batch, vecCol, keyCol, centroids)
      .withColumn("cent_id", col("cent_id").cast("int"))
      // one file per cent_id dir, as in the base writer
      .repartition(col("cent_id"))
      .write.mode("overwrite").partitionBy("cent_id")
      .parquet(s"$root/delta/batch=$batchId")

  /** The live INT8 layout: base ∪ deltas as the `(c_id, q, qn,
    * cent_id)` relation [[PartitionedAnn.ivfTopKFramesInt8]] scores
    * with exact integer cosines. */
  def layoutInt8(spark: SparkSession, root: String): DataFrame = {
    val cols = Seq(col("c_id"), col("q"), col("qn"),
      col("cent_id").cast("int").as("cent_id"))
    val base = spark.read.parquet(s"$root/base").select(cols: _*)
    try base.unionByName(
      spark.read.parquet(s"$root/delta").select(cols: _*))
    catch {
      case _: org.apache.spark.sql.AnalysisException => base
    }
  }

  /** [[appendBatch]] for the int8-quantized layout
    * ([[PartitionedAnn.writeIvfPartitionedInt8]] as the base writer):
    * assignment runs on the float vectors against the float codebook
    * (the cluster boundary must not move), the delta files store
    * tinyint pages. Per-vector quantization is corpus-independent
    * (each vector scales by its own max-abs), so streamed pages are
    * bit-identical to what a full rebuild writes. */
  private[graft] def appendBatchInt8(batch: DataFrame, batchId: Long,
      root: String, centroids: DataFrame, vecCol: String,
      keyCol: String): Unit = {
    val assigned = Similarity.ivfAssign(batch, vecCol, keyCol, centroids)
      .withColumn("cent_id", col("cent_id").cast("int"))
    Similarity.quantizeInt8(
      assigned.select(col("c_id"), col("c_vec"), col("cent_id")),
      "c_vec", "c_id", keep = Seq("cent_id"))
      .select(col("c_id"), col("q"), col("qn"), col("cent_id"))
      .repartition(col("cent_id"))
      .write.mode("overwrite").partitionBy("cent_id")
      .parquet(s"$root/delta/batch=$batchId")
  }

  /** The live PQ layout: base ∪ deltas as the `(c_id, codes, cent_id)`
    * relation [[PartitionedAnn.ivfPqTopKFrames]] scores via ADC
    * lookup — the maximally-compressed streamed form (8 ints per
    * vector at rest). */
  def layoutPq(spark: SparkSession, root: String): DataFrame = {
    val cols = Seq(col("c_id"), col("codes"),
      col("cent_id").cast("int").as("cent_id"))
    val base = spark.read.parquet(s"$root/base").select(cols: _*)
    try base.unionByName(
      spark.read.parquet(s"$root/delta").select(cols: _*))
    catch {
      case _: org.apache.spark.sql.AnalysisException => base
    }
  }

  /** [[appendBatch]] for the IVF+PQ layout
    * ([[PartitionedAnn.writeIvfPqPartitioned]] as the base writer):
    * assignment AND encoding run against the FIXED float
    * centroids/codewords (neither boundary may move), and both are
    * per-vector deterministic, so the streamed codes are bit-identical
    * to a full rebuild's — the ann_pq_ivf_incremental gate proves it
    * against the full-rebuild oracle verbatim. */
  private[graft] def appendBatchPq(batch: DataFrame, batchId: Long,
      root: String, centroids: DataFrame, codewords: DataFrame,
      vecCol: String, keyCol: String, numSub: Int,
      subDim: Int): Unit =
    PartitionedAnn.ivfPqRows(batch, vecCol, keyCol, centroids,
      codewords, numSub, subDim)
      .repartition(col("cent_id"))
      .write.mode("overwrite").partitionBy("cent_id")
      .parquet(s"$root/delta/batch=$batchId")

  /** Compaction — the offline maintenance job the delta design
    * defers to: fold base ∪ all deltas into a fresh single-level
    * base (one file per `cent_id=` dir again) and drop the delta
    * tree. Layout-format agnostic: pass the matching reader
    * ([[layout]], [[layoutInt8]], [[layoutPq]]) and the live relation
    * is rewritten as-is — assignment/pages/codes are already final,
    * so compaction never recomputes anything, it only re-clusters
    * files.
    *
    * Crash safety (swap ordering): the compacted copy is FULLY
    * written to `base_compact/` first; only then are `base/` and
    * `delta/` deleted and the staging dir moved into place. A crash
    * before the move leaves a complete `base_compact/` — the next
    * [[compact]] call detects the interrupted swap (staging present,
    * base absent) and completes the move before doing anything else.
    * A crash before the deletes leaves the old tree intact and a
    * stale staging dir that the next run overwrites. */
  def compact(spark: SparkSession, root: String,
      layoutOf: (SparkSession, String) => DataFrame = layout): Unit =
    stagedSwap(root) { staging =>
      layoutOf(spark, root)
        .repartition(col("cent_id"))
        .write.mode("overwrite").partitionBy("cent_id")
        .parquet(staging)
    }

  /** Codebook refresh — the other offline maintenance job the delta
    * design defers to: when drift degrades recall, re-cluster the
    * LIVE corpus (base ∪ deltas) with spherical k-means
    * ([[Similarity.kmeansCentroids]]) and rewrite the layout
    * partitioned by the NEW assignment, via the same staged swap as
    * [[compact]]. Float layout only — re-assignment needs the raw
    * vectors; the int8/PQ forms re-derive from a refreshed float
    * corpus through their own writers, codebooks being format-
    * independent. Returns the new `(cent_id, cent_vec)` table, which
    * all subsequent probes and delta appends MUST use (one codebook
    * per layout generation — the invariant every incremental path
    * relies on); the same table is also PERSISTED to
    * `root/codebook/` after the swap, so a later session (or a
    * warm-cache gate replay) can probe the refreshed layout without
    * re-deriving the centroids. Write ordering: layout first, then
    * codebook — a crash between the two leaves a refreshed base with
    * the previous on-disk codebook, which a re-run of refresh
    * repairs; the reverse order could pair a NEW codebook with the
    * OLD partitioning, mis-pruning every probe until repair. */
  def refreshCodebook(spark: SparkSession, root: String, k: Int,
      iters: Int = 5): DataFrame = {
    val live = layout(spark, root)
      .select(col("c_id"), col("c_vec"))
      .localCheckpoint() // consumed by k-means AND the rewrite
    val cents = Similarity.kmeansCentroids(live, "c_vec", "c_id", k,
      iters) // already checkpointed per iteration
    stagedSwap(root) { staging =>
      PartitionedAnn.writeIvfPartitioned(live, "c_vec", "c_id", cents,
        staging)
    }
    cents.write.mode("overwrite").parquet(s"$root/codebook")
    spark.read.parquet(s"$root/codebook")
  }

  /** The staged base swap shared by [[compact]], [[refreshCodebook]],
    * and [[Bm25Stream.compact]]: write the replacement fully into
    * `base_compact/`, then delete `base/` + every delta tree in
    * `clear`, then move. A crash before the move leaves a complete
    * staging dir; the next call detects staging-present/base-absent
    * and completes the move before doing anything else — REMOVING the
    * delta trees first, because the staged copy already contains
    * their contents and a survivor (crash between rm(base) and the
    * delta deletes) would duplicate every delta row in the recovered
    * layout: double top-k candidates in the float ANN form, doubled
    * ADC partial sums in PQ, doubled tf/df evidence in BM25. */
  private[streaming] def stagedSwap(root: String,
      clear: Seq[String] = Seq("delta"))(write: String => Unit): Unit = {
    import java.io.File
    import java.nio.file.{Files, Paths}
    def rm(f: File): Unit = if (f.exists()) {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    val staging = new File(s"$root/base_compact")
    val base = new File(s"$root/base")
    if (staging.exists() && !base.exists()) {
      clear.foreach(d => rm(new File(s"$root/$d")))
      Files.move(staging.toPath, base.toPath)
      return
    }
    write(staging.toString)
    rm(base)
    clear.foreach(d => rm(new File(s"$root/$d")))
    Files.move(staging.toPath, Paths.get(s"$root/base"))
  }

  /** Start incremental IVF maintenance over a parquet embedding
    * directory: new files → nearest-centroid assignment → delta
    * append. Pass `schema` to start before the first file lands. */
  def run(spark: SparkSession, inputDir: String, root: String,
      checkpointDir: String, centroids: DataFrame,
      vecCol: String = "embedding", keyCol: String = "vec_id",
      maxFilesPerTrigger: Int = 1,
      trigger: Trigger = Trigger.AvailableNow(),
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      int8: Boolean = false): StreamingQuery = {
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
        if (int8) appendBatchInt8(b, id, root, centroids, vecCol, keyCol)
        else appendBatch(b, id, root, centroids, vecCol, keyCol)
      }
      .start()
  }
}
