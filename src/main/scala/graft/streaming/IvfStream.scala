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

  /** True only for the analysis failures that mean "this generation
    * tree was never written" (missing path, or a dir with nothing to
    * infer a schema from). Catching AnalysisException any wider than
    * this turns a GENUINELY broken delta (half-written batch, schema
    * drift) into a silent base-only fallback: probes return
    * plausible top-k missing every streamed row, with no error
    * anywhere — so every base∪delta reader narrows on this. */
  private[graft] def missingPath(
      e: org.apache.spark.sql.AnalysisException): Boolean = {
    val m = Option(e.getMessage).getOrElse("")
    m.contains("PATH_NOT_FOUND") || m.contains("UNABLE_TO_INFER_SCHEMA")
  }

  /** Reject REUSED micro-batch ids over an overwrite-per-batch state
    * tree. Structured streaming replays only the LAST (uncommitted)
    * batch — every earlier `batch=` partition is committed state — so
    * a batch id BELOW the newest on disk can only come from a stream
    * restarted with a FRESH checkpoint: its overwrite-mode write
    * would silently REPLACE a committed batch's state with different
    * content (vectors/grams/cells/fingerprints vanish; sidecar rows
    * recorded against the old generation start matching the new one).
    * Equal-to-max is the legitimate crash replay and stays allowed.
    * Applied by every overwrite-per-batch appender; the analogous
    * guard for ids FOLDED AWAY by compaction is
    * [[Bm25Stream]]'s fold watermark. */
  private[graft] def requireFreshBatchId(stateDir: String,
      batchId: Long, what: String): Unit = {
    // list via the Hadoop FileSystem API, NOT java.io.File: on a
    // non-local filesystem (HDFS/S3) a java.io listing is silently
    // empty and the guard would pass exactly where the corruption it
    // prevents is most expensive
    val p = new org.apache.hadoop.fs.Path(stateDir)
    val fs = p.getFileSystem(hadoopConf())
    val ids =
      (if (fs.exists(p)) fs.listStatus(p).toSeq else Seq.empty)
        .map(_.getPath.getName).collect {
          case s if s.startsWith("batch=") => s.drop(6).toLong
        }
    if (ids.nonEmpty) {
      val mx = ids.max
      require(batchId >= mx,
        s"$what: batch id $batchId is below the newest committed " +
          s"batch $mx under $stateDir — a stream restarted with a " +
          "fresh checkpoint reuses ids, and the overwrite would " +
          "silently replace that batch's committed state; resume " +
          "from the original checkpoint or start ids above the max")
    }
  }

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
      case e: org.apache.spark.sql.AnalysisException
          if missingPath(e) => base
    }
  }

  /** Assign one micro-batch against the fixed codebook and write it
    * as the `delta/batch=<id>` mini-layout (overwrite ⇒ replay-safe). */
  private[graft] def appendBatch(batch: DataFrame, batchId: Long,
      root: String, centroids: DataFrame, vecCol: String,
      keyCol: String): Unit = {
    // Deliberately NO recoverPendingSwap preamble: additive append,
    // manifest-protected in both mid-swap directions — see
    // GramStream.appendBatch for the full argument (recovering first
    // would double a replayed folded id's rows).
    requireFreshBatchId(s"$root/delta", batchId, "IvfStream.appendBatch")
    Similarity.ivfAssign(batch, vecCol, keyCol, centroids)
      .withColumn("cent_id", col("cent_id").cast("int"))
      // one file per cent_id dir, as in the base writer
      .repartition(col("cent_id"))
      .write.mode("overwrite").partitionBy("cent_id")
      .parquet(s"$root/delta/batch=$batchId")
  }

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
      case e: org.apache.spark.sql.AnalysisException
          if missingPath(e) => base
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
    requireFreshBatchId(s"$root/delta", batchId,
      "IvfStream.appendBatchInt8")
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
      case e: org.apache.spark.sql.AnalysisException
          if missingPath(e) => base
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
      subDim: Int): Unit = {
    requireFreshBatchId(s"$root/delta", batchId,
      "IvfStream.appendBatchPq")
    PartitionedAnn.ivfPqRows(batch, vecCol, keyCol, centroids,
      codewords, numSub, subDim)
      .repartition(col("cent_id"))
      .write.mode("overwrite").partitionBy("cent_id")
      .parquet(s"$root/delta/batch=$batchId")
  }

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
      graft.pipeline.LayoutWrite.salted(layoutOf(spark, root),
          "cent_id", col("c_id"))
        .write.mode("overwrite").partitionBy("cent_id")
        .parquet(staging)
      // carry the generation's codebook forward: a refreshed layout
      // keeps `_codebook/` inside base ([[refreshCodebook]]); folding
      // the deltas must not detach the partitioning from the codebook
      // that defines it
      val cb = new java.io.File(s"${localPath(root)}/base/_codebook")
      if (cb.exists())
        spark.read.parquet(cb.toString)
          .write.mode("overwrite").parquet(s"$staging/_codebook")
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
    * relies on). The table is PERSISTED as `_codebook/` INSIDE the
    * staged layout — the underscore prefix hides it from Spark's
    * file index, so base scans ignore it — which makes codebook and
    * partitioning atomic under the swap: they move together, so no
    * crash ordering can pair a new codebook with an old partitioning
    * (or vice versa) and silently mis-prune every probe. All reads
    * happen inside the swap lambda, so a call on a root left
    * mid-swap by a crashed predecessor first completes that swap,
    * then re-clusters the recovered layout. */
  def refreshCodebook(spark: SparkSession, root: String, k: Int,
      iters: Int = 5): DataFrame = {
    stagedSwap(root) { staging =>
      val live = layout(spark, root)
        .select(col("c_id"), col("c_vec"))
        .localCheckpoint() // consumed by k-means AND the rewrite
      val cents = Similarity.kmeansCentroids(live, "c_vec", "c_id", k,
        iters) // already checkpointed per iteration
      PartitionedAnn.writeIvfPartitioned(live, "c_vec", "c_id", cents,
        staging)
      cents.write.mode("overwrite").parquet(s"$staging/_codebook")
    }
    spark.read.parquet(s"$root/base/_codebook")
  }

  /** The staged base swap shared by [[compact]], [[refreshCodebook]],
    * and [[Bm25Stream.compact]]: write the replacement fully into
    * `base_compact/`, stamp it complete (`_SWAP_READY`, whose body is
    * the MANIFEST of delta entries the staged copy folded), then
    * delete `base/` + exactly the manifested delta entries, then
    * move.
    *
    * Crash matrix, all replay-safe by calling ANY swap-based
    * maintenance op again:
    *  - during `write`: staging exists without the marker — it is an
    *    incomplete artifact and is DISCARDED; base and deltas are
    *    untouched, the op simply re-runs. (Treating an unmarked
    *    staging as authoritative was the old hazard's mirror image.)
    *  - during `rm(base)` (even partway — base still present but
    *    missing files): the marker makes staging authoritative, so
    *    recovery finishes removing base rather than REBUILDING
    *    staging from the half-deleted base, which would silently drop
    *    the already-removed rows.
    *  - between the delta deletes: recovery removes only the
    *    MANIFESTED entries. Delta batches appended AFTER the crash
    *    (a streaming job resumed while the layout sat mid-swap) are
    *    not in the manifest and SURVIVE — deleting them would lose
    *    committed batches structured streaming will never replay. A
    *    survivor that IS manifested is removed, because the staged
    *    copy already contains its rows and keeping it would double
    *    top-k candidates / ADC partial sums / tf-df evidence.
    *  - after the move: only the marker cleanup remains; a stale
    *    in-base marker is removed on the next call (Spark ignores
    *    underscore files).
    *
    * The maintenance CALL itself still requires the offline contract
    * (no appends racing the `write` lambda's layout read — an append
    * in that window may or may not be folded); the manifest protects
    * the arbitrarily-long CRASH-RECOVERY window, not the write. */
  private[graft] def hadoopConf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  /** The staged-swap machinery (sidecar marker files, atomic
    * directory moves) is implemented over the LOCAL filesystem; on a
    * remote root it would neither find pending swaps nor stage
    * atomically. Fail fast instead of silently degrading — the
    * 100 TB deployment path is to run maintenance against a local or
    * locally-mounted layout root (or port this tier to the Hadoop
    * FileSystem API). */
  private def requireLocalRoot(root: String, what: String): Unit =
    require(!root.matches("^[a-zA-Z][a-zA-Z0-9+.\\-]*://.*") ||
        root.startsWith("file:"),
      s"$what: layout root $root is not on the local filesystem — " +
        "the staged-swap/sidecar maintenance tier uses local file " +
        "operations (_SWAP_READY markers, atomic directory moves) " +
        "and would silently misbehave on a remote scheme")

  /** Appenders and one-shot store writers with NO compaction tier of
    * their own (NbStream, CmsStream, DriftStream, DqStream, LmStream,
    * CurationStream, the tokenizer model stores) can never LEAVE a
    * swap pending — but a `_SWAP_READY` marker under their root means
    * some OTHER maintainer owns the layout mid-swap, and writing into
    * that recovery window would race its deletes. They cannot
    * complete a swap they don't own (the manifest's clear-dirs are
    * the owner's), so they FAIL FAST and name the contract. */
  private[graft] def requireNoPendingSwap(root: String,
      what: String): Unit = {
    val marker = new java.io.File(
      s"${localPath(root)}/base_compact/_SWAP_READY")
    if (marker.exists())
      throw new IllegalStateException(
        s"$what: a staged swap is pending under $root " +
          "(base_compact/_SWAP_READY) — this writer has no recovery " +
          "tier; complete the swap with the maintainer that owns " +
          "the layout before writing")
  }

  /** Normalize a `file:`-scheme root to the plain local path the
    * java.io tier operates on. [[requireLocalRoot]] admits `file:`
    * URIs (Spark writers/readers produce and accept them), but
    * `new java.io.File("file:/x")` is a RELATIVE `./file:/x` path —
    * markers and atomic moves would act on the wrong directory, the
    * exact silent misbehavior the guard exists to prevent. */
  private[graft] def localPath(root: String): String =
    if (root.startsWith("file:"))
      java.nio.file.Paths.get(java.net.URI.create(root)).toString
    else root

  private[graft] def rmRec(f: java.io.File): Unit = if (f.exists()) {
    Option(f.listFiles()).foreach(_.foreach(rmRec))
    f.delete(): Unit
  }

  /** Stamp a just-written `batch=` partition directory with its row
    * count as a body-bearing `_ROWS` marker (hidden from parquet
    * readers — `_`-prefixed files are filtered like `_SUCCESS`). The
    * count is captured via `observe` DURING the partition write (the
    * NbStream params discipline — zero extra jobs) and read back by
    * [[sidecarRowHint]] as the broadcast-gate hint for the supersede
    * sidecars, which are NOT bounded relations: between compactions
    * they grow with total re-arrivals — corpus-scale for the
    * re-crawl-heavy corpora this tier exists for — so a forced
    * broadcast would fail the job at 100 TB instead of degrading to
    * a shuffled anti-join. Written via tmp + ATOMIC_MOVE and LAST
    * (after the parquet commit): a crash in between leaves a
    * stamp-less partition, which the hint treats as unbounded
    * (shuffle — degraded, never wrong), and the replay's overwrite
    * rewrites both. */
  private[graft] def stampRows(dir: String, n: Long): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val d = localPath(dir)
    val tmp = Paths.get(d, "_ROWS.tmp")
    Files.write(tmp, n.toString.getBytes("UTF-8"))
    Files.move(tmp, Paths.get(d, "_ROWS"),
      StandardCopyOption.ATOMIC_MOVE): Unit
  }

  /** The summed `_ROWS` stamps of a sidecar directory's `batch=`
    * partitions — a pure driver-side listing, no Spark job, so
    * probe-path callers can size-gate the sidecar join on every call
    * for free. `excludeBatch` mirrors the reader's own-partition
    * exclusion (replay safety) so the hint sizes exactly the relation
    * being joined. Missing directory ⇒ 0 (the reader's empty-frame
    * fallback); any included partition without a stamp (a crash
    * between parquet commit and stamp, or a pre-stamp layout) ⇒
    * Long.MaxValue — conservative: the gate declines the broadcast
    * and the anti-join degrades to a shuffle, correct at any size. */
  private[graft] def sidecarRowHint(dir: String,
      excludeBatch: Option[Long] = None): Long = {
    // a REMOTE-scheme root cannot be listed by the java.io tier — it
    // would read as "no partitions ⇒ hint 0" and force-broadcast a
    // possibly corpus-scale sidecar; stay conservative (shuffle)
    if (dir.matches("^[a-zA-Z][a-zA-Z0-9+.\\-]*://.*") &&
        !dir.startsWith("file:")) return Long.MaxValue
    val parts = Option(new java.io.File(localPath(dir)).listFiles())
      .toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .filter(f => !excludeBatch.contains(f.getName.drop(6).toLong))
    val stamps = parts.map { p =>
      val m = new java.io.File(p, "_ROWS")
      if (m.exists())
        try Some(new String(java.nio.file.Files.readAllBytes(m.toPath),
          "UTF-8").trim.toLong)
        catch {
          case _: NumberFormatException =>
            // a missing stamp is an expected pre-stamp/crash state,
            // but an UNPARSEABLE one is corruption — degrading to a
            // shuffle forever with no trace would hide it until
            // someone profiles the plan, so name the file loudly
            // (the hint itself stays conservative either way)
            Console.err.println(s"WARN IvfStream.sidecarRowHint: " +
              s"unparseable _ROWS stamp at $m — treating the sidecar " +
              "as unbounded (joins degrade to shuffle) until a " +
              "compaction or replay rewrites the stamp")
            None
        }
      else None
    }
    if (stamps.forall(_.isDefined)) stamps.flatten.sum
    else Long.MaxValue
  }

  private def finishSwap(root: String, clear: Seq[String],
      folded: Seq[String]): Unit = {
    import java.io.File
    import java.nio.file.{Files, Paths}
    val base = new File(s"$root/base")
    rmRec(base)
    folded.foreach(p => rmRec(new File(s"$root/$p")))
    // drop clear roots left empty (readers treat them as absent)
    clear.map(d => new File(s"$root/$d")).foreach { dir =>
      if (dir.exists() && Option(dir.listFiles()).forall(_.isEmpty))
        rmRec(dir)
    }
    Files.move(Paths.get(s"$root/base_compact"), Paths.get(s"$root/base"))
    rmRec(new File(base, "_SWAP_READY"))
  }

  /** Complete a crashed predecessor's staged swap, if one is pending;
    * no-op otherwise. Maintenance ops run it as the preamble of
    * [[stagedSwap]]; DELTA APPENDERS over swap-managed roots (e.g.
    * [[Bm25Stream.appendBatch]]) must ALSO run it before reading any
    * prior state — mid-swap, `base/` is absent and a reader's
    * missingPath fallback silently degrades the base registry/stats
    * to empty, so a batch re-crawling a base-resident document would
    * record no supersede row and leave both versions live forever. */
  private[graft] def recoverPendingSwap(rawRoot: String,
      clear: Seq[String] = Seq("delta")): Unit = {
    import java.io.File
    import java.nio.file.Files
    requireLocalRoot(rawRoot, "IvfStream.recoverPendingSwap")
    val root = localPath(rawRoot)
    val staging = new File(s"$root/base_compact")
    val base = new File(s"$root/base")
    val marker = new File(staging, "_SWAP_READY")
    if (staging.exists() && marker.exists()) {
      val folded = new String(
        Files.readAllBytes(marker.toPath), "UTF-8")
        .linesIterator.filter(_.nonEmpty).toSeq
      finishSwap(root, clear, folded)
    } else if (staging.exists() && !base.exists()) {
      // pre-manifest staging from an older crashed swap (complete by
      // the old ordering: base was only removed after a full write) —
      // honor the legacy recovery: whole clear trees were folded
      finishSwap(root, clear, clear)
    }
  }

  private[graft] def stagedSwap(rawRoot: String,
      clear: Seq[String] = Seq("delta"))(write: String => Unit): Unit = {
    import java.io.File
    import java.nio.file.Files
    requireLocalRoot(rawRoot, "IvfStream.stagedSwap")
    val root = localPath(rawRoot)
    val staging = new File(s"$root/base_compact")
    val base = new File(s"$root/base")
    val marker = new File(staging, "_SWAP_READY")
    // complete a crashed predecessor's swap FIRST, then still run
    // this call's own op over the recovered layout (the caller asked
    // for a compact/refresh and gets one — recovery is a preamble,
    // not a substitute)
    recoverPendingSwap(root, clear)
    rmRec(staging) // unmarked staging next to a live base: incomplete
    rmRec(new File(base, "_SWAP_READY")) // stale marker from a post-move crash
    // snapshot the delta entries this swap folds — under the offline
    // contract this is exactly what the write lambda will read
    val folded = clear.flatMap { d =>
      Option(new File(s"$root/$d").listFiles()).toSeq.flatten
        .map(f => s"$d/${f.getName}")
    }
    write(staging.toString)
    // the marker must appear ATOMICALLY with its full manifest: a
    // torn write would leave a trusted-but-truncated manifest whose
    // unlisted folded batches survive recovery and double their rows
    val tmpMarker = new File(staging, "_SWAP_READY.tmp")
    Files.write(tmpMarker.toPath,
      folded.mkString("\n").getBytes("UTF-8"))
    Files.move(tmpMarker.toPath, marker.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    finishSwap(root, clear, folded)
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
