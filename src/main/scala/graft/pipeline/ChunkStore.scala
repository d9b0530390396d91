package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** At-rest + incrementally-maintained store for the content-defined
  * chunks of [[Sampling.chunkContentDefined]] — the "chunk once,
  * probe many" form of the CDC dedup pass, and the layout a
  * snapshot-to-snapshot crawl updates without re-chunking the corpus.
  *
  * Layout:
  * {{{
  * root/base/chunks/fp_bucket=N/   full-snapshot chunk rows
  * root/delta/chunks/batch=G/...   added+changed docs' chunks, gen G
  * root/delta/tombstones/batch=G/  (doc_id) rows: doc's pre-G state
  *                                 is dead (removed OR re-chunked)
  * root/params.json                (window, buckets) stamped at base
  * }}}
  *
  * Maintenance contract (the shape every graft streamed layout
  * converged on, minus the parts this one doesn't need):
  *  - A batch is derived ONLY from the snapshot diff and the new
  *    snapshot's text — never from accumulated prior state — so an
  *    overwrite-replayed batch rewrites bit-identical files and needs
  *    no sidecar (no round-11 read-own-output window exists at all).
  *  - Reused batch ids are rejected via
  *    [[graft.streaming.IvfStream.requireFreshBatchId]]: equal-to-max
  *    is the legitimate crash replay, below-max is a fresh-checkpoint
  *    restart whose overwrite would corrupt committed generations.
  *  - `params.json` is written with the base and validated on every
  *    append (the Sharding round-12 lesson: the base writer, not the
  *    first append, owns the layout contract).
  *
  * Read-side precedence is pure generation arithmetic: base rows are
  * generation −1, a batch's chunks and tombstones are generation G,
  * and a document's live chunks are the rows carrying its MAXIMUM
  * generation (a changed doc tombstones its old state and re-chunks
  * at the same G; a removed doc tombstones without re-chunking, so
  * its max generation has no chunk rows). Chunking is doc-local, so
  * a delta batch's rows are bit-identical to a full rebuild's for
  * those documents — which is what lets the incremental gate share
  * the rebuild oracle verbatim.
  *
  * At 100 TB: the base write pays the one full chunk+md5 pass;
  * steady-state cost tracks the CRAWL DELTA (added+changed docs),
  * not the corpus. `fp_bucket` partitioning keeps any
  * fingerprint-keyed probe (dup mass, cross-snapshot chunk lookup)
  * bucket-local on disk.
  */
object ChunkStore {

  /** Every `java.io.File` touch goes through this: a `file:`-scheme
    * root handed to raw java.io is a RELATIVE `./file:/x` path, so
    * markers/deletes silently act on the wrong directory (the
    * [[graft.streaming.IvfStream.localPath]] hazard). Hadoop-API and
    * Spark read/write paths are immune and keep the raw root. */
  private def lp(root: String): String =
    graft.streaming.IvfStream.localPath(root)

  /** Chunk rows + the fingerprint bucket the layout partitions by —
    * ONE derivation shared by the base writer and every delta batch,
    * so generations are bit-identical to a rebuild per document. */
  private def bucketedChunks(docs: DataFrame, textCol: String,
      keyCol: String, window: Int, buckets: Int): DataFrame =
    Sampling.chunkContentDefined(docs, textCol, keyCol, window)
      .withColumn("fp_bucket",
        Retrieval.termBucket(col("fingerprint"), buckets))

  def writeBase(docs: DataFrame, textCol: String, keyCol: String,
      root: String, window: Int = 4, buckets: Int = 64): Unit = {
    require(window > 0 && buckets >= 1 && buckets <= 4096,
      s"ChunkStore.writeBase: window > 0, 1..4096 buckets; " +
        s"got window=$window buckets=$buckets")
    // a rebuilt base supersedes ALL prior history under the root:
    // stale uncompacted delta batches (and a crashed compact's
    // staging) would otherwise mix into liveChunks as if they
    // postdated the fresh base. Drop the completion marker FIRST so a
    // crash mid-rebuild reads as a cold store, not a torn one.
    new java.io.File(lp(root), "_SUCCESS").delete(): Unit
    graft.streaming.IvfStream.rmRec(
      new java.io.File(s"${lp(root)}/delta"))
    graft.streaming.IvfStream.rmRec(
      new java.io.File(s"${lp(root)}/base_compact"))
    LayoutWrite.salted(
      bucketedChunks(docs, textCol, keyCol, window, buckets),
      "fp_bucket", col(keyCol))
      .write.mode("overwrite").partitionBy("fp_bucket")
      .parquet(s"$root/base/chunks")
    // a FRESH base has no fold history: a watermark.json left by a
    // prior compact under the same root would reject the rebuilt
    // store's first delta batch as a fresh-checkpoint restart
    new java.io.File(s"${lp(root)}/base/watermark.json").delete(): Unit
    writeParams(root, window, buckets)
    new java.io.File(lp(root), "_SUCCESS").createNewFile(): Unit
  }

  /** Apply one snapshot-diff batch: `diff` is a
    * [[Dedup.snapshotDiff]] relation (key, status), `newSnap` the new
    * snapshot's (key, text). Added+changed docs are re-chunked into
    * `delta/chunks/batch=G`; removed+changed docs tombstone their
    * pre-G state in `delta/tombstones/batch=G`. Pure function of
    * (diff, newSnap) ⇒ overwrite is replay-idempotent. */
  def appendDiffBatch(diff: DataFrame, newSnap: DataFrame,
      batchId: Long, root: String, textCol: String,
      keyCol: String): Unit = {
    // complete a crashed compact FIRST: mid-swap, base/ is absent and
    // delta trees are about to be deleted by recovery — appending
    // into that window against a half-swapped root must not happen
    graft.streaming.IvfStream.recoverPendingSwap(root, ClearDirs)
    val (window, buckets) = readParams(root)
    graft.streaming.IvfStream.requireFreshBatchId(
      s"$root/delta/chunks", batchId, "ChunkStore.appendDiffBatch")
    // ids folded away by compact leave the delta tree empty, so the
    // fresh-id guard alone cannot see them — the fold watermark can
    foldWatermark(root).foreach(w => require(batchId > w,
      s"ChunkStore.appendDiffBatch: batch id $batchId is at or " +
        s"below the fold watermark $w — those generations were " +
        "compacted into the base; a fresh-checkpoint restart is " +
        "reusing ids. Resume from the original checkpoint or start " +
        "ids above the watermark"))
    val keyed = diff.select(col(keyCol), col("status"))
    val reChunk = newSnap.join(
      keyed.filter(col("status").isin("added", "changed"))
        .select(col(keyCol)),
      Seq(keyCol))
    bucketedChunks(reChunk, textCol, keyCol, window, buckets)
      .repartition(col("fp_bucket"))
      .write.mode("overwrite").partitionBy("fp_bucket")
      .parquet(s"$root/delta/chunks/batch=$batchId")
    keyed.filter(col("status").isin("removed", "changed"))
      .select(col(keyCol).as("doc_id"))
      .coalesce(1)
      .write.mode("overwrite")
      .parquet(s"$root/delta/tombstones/batch=$batchId")
  }

  /** The live chunk relation: per document, the rows of its newest
    * generation (see precedence contract above). Output columns match
    * [[Sampling.chunkContentDefined]] plus `fp_bucket`. */
  def liveChunks(spark: SparkSession, root: String,
      keyCol: String = "doc_id"): DataFrame = {
    val base = spark.read.parquet(s"$root/base/chunks")
      .withColumn("gen", lit(-1L))
    val chunkCols = base.columns.map(col).toIndexedSeq
    val withDeltas =
      try base.unionByName(
        spark.read.parquet(s"$root/delta/chunks")
          .withColumn("gen", col("batch").cast("long"))
          .select(chunkCols: _*))
      catch {
        // no delta committed yet — base alone is the layout; any
        // other failure (torn batch, schema drift) must surface
        case e: org.apache.spark.sql.AnalysisException
            if graft.streaming.IvfStream.missingPath(e) => base
      }
    val tombGens =
      try spark.read.parquet(s"$root/delta/tombstones")
        .select(col("doc_id").as(keyCol),
          col("batch").cast("long").as("gen"))
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if graft.streaming.IvfStream.missingPath(e) =>
          spark.range(0).select(col("id").as(keyCol),
            col("id").as("gen"))
      }
    val topGen = withDeltas.select(col(keyCol), col("gen"))
      .unionByName(tombGens)
      .groupBy(col(keyCol))
      .agg(max(col("gen")).as("top_gen"))
    withDeltas
      .join(topGen, Seq(keyCol))
      .filter(col("gen") === col("top_gen"))
      .drop("gen", "top_gen")
  }

  /** Per-document duplicated-chunk token mass over an explicit chunk
    * relation — ONE body shared by the inline pp_cdc_dedup query, the
    * at-rest probe and the incremental probe, so all three share the
    * oracle verbatim. */
  def dupMass(chunks: DataFrame, keyCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val owners = chunks
      .groupBy(col("fingerprint"))
      .agg(countDistinct(col(keyCol)).as("n_owner_docs"))
    chunks
      .join(owners, Seq("fingerprint"))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(when(col("n_owner_docs") >= 2, col("n_tokens"))
          .otherwise(0L)).as("dup_tokens"))
      .withColumn("dup_frac",
        round((col("dup_tokens") / col("total_tokens"))
          .cast(DecimalType(28, 10)), 6).cast("double"))
  }

  private val ClearDirs = Seq("delta/chunks", "delta/tombstones")

  /** Fold base ∪ deltas − tombstones into a fresh single-level base
    * via the staged swap shared with the other index maintainers
    * (all reads inside the write lambda, manifest-bearing
    * `_SWAP_READY`, recovery deletes exactly the manifested delta
    * entries). The max folded generation is stamped into
    * `base/watermark.json` so a fresh-checkpoint restart reusing a
    * folded id fails pointedly in [[appendDiffBatch]] instead of
    * silently re-introducing superseded document versions. */
  def compact(spark: SparkSession, root: String): Unit = {
    graft.streaming.IvfStream.stagedSwap(root, clear = ClearDirs) {
      staging =>
        val prior = foldWatermark(root).getOrElse(-1L)
        val deltaGens =
          Option(new java.io.File(
              s"${lp(root)}/delta/chunks").listFiles())
            .toSeq.flatten.map(_.getName).collect {
              case s if s.startsWith("batch=") => s.drop(6).toLong
            }
        LayoutWrite.salted(liveChunks(spark, root), "fp_bucket",
            col("doc_id"))
          .write.mode("overwrite").partitionBy("fp_bucket")
          .parquet(s"$staging/chunks")
        val wm = (deltaGens :+ prior).max
        val f = new java.io.File(staging, "watermark.json")
        val w = new java.io.PrintWriter(f, "UTF-8")
        try w.print(s"""{"max_folded_gen":$wm}""")
        finally w.close()
    }
  }

  /** The max generation ever folded into the base by [[compact]], if
    * any fold has happened. */
  private def foldWatermark(root: String): Option[Long] = {
    val f = new java.io.File(s"${lp(root)}/base/watermark.json")
    if (!f.exists()) None
    else {
      val s = new String(java.nio.file.Files.readAllBytes(f.toPath),
        "UTF-8")
      """"max_folded_gen":(-?\d+)""".r.findFirstMatchIn(s)
        .map(_.group(1).toLong)
    }
  }

  private def writeParams(root: String, window: Int,
      buckets: Int): Unit = {
    val f = new java.io.File(lp(root), "params.json")
    val w = new java.io.PrintWriter(f, "UTF-8")
    try w.print(s"""{"window":$window,"buckets":$buckets}""")
    finally w.close()
  }

  private def readParams(root: String): (Int, Int) = {
    val f = new java.io.File(lp(root), "params.json")
    require(f.exists(),
      s"ChunkStore: no params.json under $root — write the base " +
        "with writeBase before appending diff batches")
    val s = new String(java.nio.file.Files.readAllBytes(f.toPath),
      "UTF-8")
    def field(n: String): Int = {
      val m = s"""\"$n\":(\\d+)""".r.findFirstMatchIn(s)
      require(m.isDefined, s"ChunkStore: params.json missing $n")
      m.get.group(1).toInt
    }
    (field("window"), field("buckets"))
  }
}
