package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.{Retrieval, TextAnalysis}

/** Incremental maintenance of the at-rest BM25 postings index
  * ([[Retrieval.writeBm25Index]]) — the same base + delta design the
  * ANN layouts get from [[IvfStream]], applied to the lexical tier so
  * a live corpus keeps "write once, probe cheap" without re-indexing
  * per batch.
  *
  * Layout (one generation per directory):
  * {{{
  *   root/base/postings/term_bucket=N/…   (doc_id, dl, term, tf)
  *   root/base/stats/                     (n_docs, avgdl, n, sdl)
  *   root/base/docs/                      (doc_id, dl) registry
  *   root/delta/batch=B/term_bucket=N/…   postings rows per batch
  *   root/delta_stats/batch=B/            (n, sdl) per batch
  *   root/delta_docs/batch=B/             (doc_id, dl) per batch
  *   root/superseded/batch=B/             (doc_id, gen, dl) sidecar
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
  * RE-CRAWLED / UPDATED documents (same doc_id arriving again) use
  * the supersede-sidecar pattern [[LshStream]] established: each
  * generation also writes a tiny `(doc_id, dl)` registry, and an
  * append that re-indexes known documents records the STALE
  * `(doc_id, gen, dl)` versions in the sidecar — deduplicated
  * against earlier sidecar rows, so a twice-updated document's first
  * version is recorded stale exactly once. Probes anti-join postings
  * rows against the size-gated sidecar on (doc_id, gen) and subtract
  * the stale `(count, Σdl)` from the corpus scalars — both exact
  * integer arithmetic, so a probe over base ∪ deltas ∪ updates still
  * hash-matches an inline rebuild over the LATEST versions
  * (pp_bm25_updated). Sidecar and registry rows are ∝ corpus +
  * re-arrivals (registry is scanned once per append); [[compact]]
  * folds everything to a fresh base and resets both.
  *
  * SIDECAR GROWTH CONTRACT: the sidecar holds one row per superseded
  * document version SINCE THE LAST COMPACTION — bounded only by
  * operational compaction cadence, so for a re-crawl-heavy corpus it
  * is corpus-scale between folds, NOT a broadcastable relation. Every
  * sidecar anti-join therefore routes through the broadcast size gate
  * ([[graft.pipeline.TextAnalysis.gateBySize]]) with a hint summed
  * from per-batch `_ROWS` stamps written during the sidecar writes
  * themselves ([[IvfStream.stampRows]] — observe-captured, zero extra
  * jobs, pure driver listing to read): small sidecars still
  * broadcast, an unbounded one degrades to the shuffled anti-join
  * instead of failing the job at 100 TB. [[compact]] resets the
  * sidecar to EMPTY on the happy path (StreamingSpec pins this), so
  * the operational knob is simply "compact before the stamp sum
  * crosses the gate's cap".
  *
  * 100 TB shape: a delta append tokenizes ONLY the batch, shuffles
  * once on term_bucket, and scans the doc_id registry (key + length
  * columns only — the same order of work [[LshStream]] pays for its
  * store scan, and far smaller than the postings). Probes prune
  * `term_bucket=` partitions on the base AND every delta (the union
  * pushes the literal IN into each scan — PlanSpec-pinned), so
  * steady-state probe cost tracks the query vocabulary, not the
  * corpus or the batch count.
  */
object Bm25Stream {

  /** Generation id of rows whose generation is unknown (an original
    * [[graft.pipeline.Retrieval.writeBm25Index]] base, which carries
    * no `gen` column). Rows that pass through [[compact]] KEEP their
    * original generation as a data column — gen identity must
    * survive folds, because supersede-sidecar rows written after a
    * crashed swap reference the generation a delta HAD, and a fold
    * that collapsed gens would dangle those references (the stale
    * version would silently resurrect). */
  private val BaseGen = -1L

  /** The generation trees a compaction folds and clears — shared by
    * [[compact]]'s swap and [[appendBatch]]'s recovery preamble (the
    * two must agree, or recovery deletes the wrong entries). */
  private val ClearDirs =
    Seq("delta", "delta_stats", "delta_docs", "superseded")

  /** The highest generation id ever folded into `base/` (stamped by
    * [[compact]] into the stats row), or [[BaseGen]] for never-folded
    * and pre-watermark roots. An append whose batch id is not above
    * this is a REUSED id — a stream restarted with a fresh checkpoint
    * against a folded layout — and must fail pointedly: the folded
    * rows keep their original `gen` as a data column, so a re-crawl
    * in reused batch N would skip its own supersede rows (excluded as
    * "own batch") and sidecar (doc_id, gen) rows could match both the
    * old and the new version. */
  private def foldWatermark(spark: SparkSession, root: String): Long =
    try {
      val st = spark.read.parquet(s"$root/base/stats")
      if (st.schema.fieldNames.contains("max_gen"))
        st.agg(max(col("max_gen").cast("long"))).collect()(0) match {
          case r if r.isNullAt(0) => BaseGen
          case r => r.getLong(0)
        }
      else BaseGen
    } catch {
      case e: org.apache.spark.sql.AnalysisException
          if IvfStream.missingPath(e) => BaseGen
    }

  /** Base postings/registry reads: folded bases carry the preserved
    * `gen` data column; an original writeBm25Index base does not —
    * tag its rows [[BaseGen]]. */
  private def genOf(df: DataFrame) =
    if (df.schema.fieldNames.contains("gen")) col("gen").cast("long")
    else lit(BaseGen)

  /** The live postings relation WITH generation identity — the form
    * [[compact]] folds (gen must survive the rewrite, see
    * [[BaseGen]]); probes use [[layout]], which drops it. */
  private def liveWithGen(spark: SparkSession, root: String): DataFrame = {
    val baseRaw = spark.read.parquet(s"$root/base/postings")
    val base = baseRaw
      .select(col("doc_id"), col("dl"), col("term"), col("tf"),
        col("term_bucket").cast("int").as("term_bucket"),
        genOf(baseRaw).as("gen"))
    val all =
      try base.unionByName(
        spark.read.parquet(s"$root/delta")
          .select(col("doc_id"), col("dl"), col("term"), col("tf"),
            col("term_bucket").cast("int").as("term_bucket"),
            col("batch").cast("long").as("gen")))
      catch {
        // no delta written yet — the base alone is the layout
        case e: org.apache.spark.sql.AnalysisException
          if IvfStream.missingPath(e) => base
      }
    // size-gated, never forced: the sidecar is compaction-cadence-
    // bounded, not bounded (see the growth contract above)
    all.join(TextAnalysis.gateBySize(sidecar(spark, root)
        .select(col("doc_id").as("s_doc"), col("gen").as("s_gen")),
        IvfStream.sidecarRowHint(s"$root/superseded")),
      col("doc_id") === col("s_doc") && col("gen") === col("s_gen"),
      "left_anti")
  }

  /** The live postings relation: base ∪ all streamed deltas minus
    * superseded document versions, with `term_bucket` as a partition
    * column on every generation so a probe filter prunes each scan
    * at file-listing time. */
  def layout(spark: SparkSession, root: String): DataFrame =
    liveWithGen(spark, root).drop("gen")

  /** Every generation's integral `(n, sdl)` stats rows:
    * base + streamed deltas. */
  private def genStats(spark: SparkSession, root: String): DataFrame = {
    val base = spark.read.parquet(s"$root/base/stats")
      .select(col("n"), col("sdl"))
    try base.unionByName(
      spark.read.parquet(s"$root/delta_stats")
        .select(col("n"), col("sdl")))
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if IvfStream.missingPath(e) => base
    }
  }

  /** The accumulated supersede sidecar `(doc_id, gen, dl)`; empty
    * frame when nothing was ever superseded (append-only roots, or
    * roots written before the registry existed). `excludeBatch`
    * drops that batch's own partition — REQUIRED when computing a
    * batch's stale set during append: a crash-REPLAYED batch must
    * not anti-join against its own previous sidecar write, or the
    * replay records an empty stale set and overwrites the real one
    * (resurrecting the versions it had superseded). */
  private def sidecar(spark: SparkSession, root: String,
      excludeBatch: Option[Long] = None): DataFrame =
    try {
      val all = spark.read.parquet(s"$root/superseded")
      excludeBatch
        .map(b => all.filter(col("batch").cast("long") =!= lit(b)))
        .getOrElse(all)
        .select(col("doc_id"), col("gen").cast("long").as("gen"),
          col("dl"))
    } catch {
      case e: org.apache.spark.sql.AnalysisException
          if IvfStream.missingPath(e) =>
        spark.range(0).select(col("id").as("doc_id"),
          col("id").as("gen"), col("id").as("dl"))
    }

  /** The per-generation `(doc_id, dl)` registry, tagged with `gen`;
    * empty for pre-registry roots (which are append-only by
    * construction — the registry writer and the supersede path
    * shipped together). */
  private def registry(spark: SparkSession, root: String): DataFrame = {
    val base =
      try {
        val raw = spark.read.parquet(s"$root/base/docs")
        raw.select(col("doc_id"), col("dl"), genOf(raw).as("gen"))
      } catch {
        case e: org.apache.spark.sql.AnalysisException
            if IvfStream.missingPath(e) =>
          spark.range(0).select(col("id").as("doc_id"),
            col("id").as("dl"), col("id").as("gen"))
      }
    try base.unionByName(
      spark.read.parquet(s"$root/delta_docs")
        .select(col("doc_id"), col("dl"),
          col("batch").cast("long").as("gen")))
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if IvfStream.missingPath(e) => base
    }
  }

  /** The live corpus scalars as one `(n_docs, avgdl)` row: exact
    * integral combine over generation stats MINUS the superseded
    * versions' exact `(count, Σdl)` — still pure integer arithmetic,
    * so the result is bit-identical to an inline rebuild over the
    * latest document versions. */
  def stats(spark: SparkSession, root: String): DataFrame = {
    val gens = genStats(spark, root)
      .agg(sum(col("n")).as("n"), sum(col("sdl")).as("sdl"))
    val stale = sidecar(spark, root)
      .agg(coalesce(count(lit(1)), lit(0L)).as("sn"),
        coalesce(sum(col("dl").cast("long")), lit(0L)).as("ssdl"))
    gens.crossJoin(broadcast(stale))
      .select((col("n") - col("sn")).as("n"),
        (col("sdl") - col("ssdl")).as("sdl"))
      .select(col("n").cast("double").as("n_docs"),
        // an all-superseded (or empty) live corpus would make this
        // 0/0 = NaN; probes over it return no rows regardless
        when(col("n") > 0, col("sdl").cast("double") / col("n"))
          .otherwise(lit(0.0)).as("avgdl"))
  }

  /** Index one micro-batch: tokenize the batch alone, write its
    * postings as the `delta/batch=<id>` mini-layout, its integral
    * stats and its `(doc_id, dl)` registry next to it, and record in
    * the sidecar every OLDER version this batch's documents
    * supersede (registry semi-join, deduplicated against earlier
    * sidecar rows so each stale version is subtracted exactly once).
    * Every write is overwrite-per-batch ⇒ replay-safe — a
    * crash-replayed batch regenerates byte-identical files instead
    * of duplicating evidence. */
  private[graft] def appendBatch(batch: DataFrame, batchId: Long,
      root: String, textCol: String, keyCol: String,
      buckets: Int): Unit = {
    val spark = batch.sparkSession
    // a crashed compact leaves base/ absent and staging marked: the
    // registry/stats readers' missingPath fallback would silently see
    // an EMPTY base, so a batch re-crawling a base-resident document
    // would record no supersede row (both versions live forever, no
    // error anywhere). Complete the pending swap FIRST, mirroring how
    // compact/refreshCodebook recover before running their own op.
    IvfStream.recoverPendingSwap(root, ClearDirs)
    // live (unfolded) generations: a reused id would overwrite a
    // committed delta with different documents — their postings/stats
    // evidence silently vanishes
    IvfStream.requireFreshBatchId(s"$root/delta", batchId,
      "Bm25Stream.appendBatch")
    val wm = foldWatermark(spark, root)
    require(batchId > wm,
      s"Bm25Stream.appendBatch: batch id $batchId is not above the " +
        s"compaction watermark $wm — the layout has folded " +
        "generations up to that id (a stream restarted with a fresh " +
        "checkpoint reuses ids, and a reused id would silently skip " +
        "its own supersede rows); resume from the original " +
        "checkpoint or start batch ids above the watermark")
    // eager: the four writes below are separate ACTIONS; the lazy
    // form would tokenize the batch once per write (micro-batch-
    // sized, so the materialization is the cheap side — the
    // PQ-codewords rule)
    val obsTok = org.apache.spark.sql.Observation()
    val tok = Retrieval.tokenized(batch, textCol, keyCol)
      .observe(obsTok, count(lit(1)).as("n_rows"))
      .localCheckpoint()
    // sidecar FIRST: it reads the registry excluding this batch's own
    // partition (replay safety), so it must run before this batch's
    // registry write on the happy path too, keeping replay and first
    // run identical
    val obsKeys = org.apache.spark.sql.Observation()
    val myKeys = tok.select(col("doc_id")).distinct()
      .observe(obsKeys, count(lit(1)).as("n_docs"))
    val prior = registry(spark, root)
      .filter(col("gen") =!= lit(batchId))
      .join(broadcast(myKeys), Seq("doc_id"))
    val alreadyStale = sidecar(spark, root, excludeBatch = Some(batchId))
      .select(col("doc_id").as("s_doc"), col("gen").as("s_gen"))
    val obs = org.apache.spark.sql.Observation()
    prior
      // accumulated sidecar — size-gated like every other sidecar
      // join (the growth contract); `prior` itself is batch-bounded
      .join(TextAnalysis.gateBySize(alreadyStale,
          IvfStream.sidecarRowHint(s"$root/superseded",
            excludeBatch = Some(batchId))),
        col("doc_id") === col("s_doc") && col("gen") === col("s_gen"),
        "left_anti")
      .select(col("doc_id"), col("gen"), col("dl"))
      .observe(obs, count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$root/superseded/batch=$batchId")
    // stamp LAST (observe-captured during the write): the hint future
    // reads sum to size-gate the sidecar joins
    IvfStream.stampRows(s"$root/superseded/batch=$batchId",
      obs.get("n").asInstanceOf[Long])
    // one version per document per micro-batch: the supersede sidecar
    // resolves versions ACROSS generations, so two crawls of the same
    // doc_id inside one batch would both stay live (doubled evidence,
    // double-counted stats). The check rides two actions that run
    // anyway (total rows observed during the checkpoint
    // materialization, distinct docs during the sidecar write's
    // broadcast build) instead of its own grouped-count job; the
    // offending id is looked up only on the failure path. Ordering:
    // the raise lands after the sidecar write but BEFORE the
    // delta/stats/registry writes — the sidecar derives from the
    // DISTINCT keys (correct under a dup batch), and it is the
    // delta/stats evidence that a dup batch would double; a replay
    // with the same id overwrites the committed sidecar partition
    // byte-identically (the round-11 own-batch exclusion).
    val nRows = obsTok.get("n_rows").asInstanceOf[Long]
    val nDocs = obsKeys.get("n_docs").asInstanceOf[Long]
    if (nRows != nDocs) {
      val dup = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).limit(1).collect()
      throw new IllegalArgumentException(
        s"Bm25Stream.appendBatch: batch $batchId carries doc_id " +
          s"${dup.headOption.map(_.get(0)).orNull} more than once — " +
          "one version per document per micro-batch")
    }
    Retrieval.postingsFromTok(tok, buckets)
      .repartition(col("term_bucket"))
      .write.mode("overwrite").partitionBy("term_bucket")
      .parquet(s"$root/delta/batch=$batchId")
    Retrieval.genStatsFromTok(tok)
      .write.mode("overwrite")
      .parquet(s"$root/delta_stats/batch=$batchId")
    tok.select(col("doc_id"),
        size(col("tk")).cast("long").as("dl"))
      .write.mode("overwrite")
      .parquet(s"$root/delta_docs/batch=$batchId")
  }

  /** [[Retrieval.bm25TopK]] against the live base ∪ delta layout
    * (superseded versions filtered, corpus scalars corrected): the
    * probe-set filter pushes into every generation's scan, df is
    * recounted from the live probed rows — bit-identical to a full
    * rebuild over the latest document versions, which the
    * pp_bm25_incremental / pp_bm25_updated gates replay with the
    * inline oracle SQL. */
  def bm25TopKIncremental(spark: SparkSession, root: String,
      queries: DataFrame, qKeyCol: String, qTextCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      buckets: Int = 64): DataFrame =
    Retrieval.bm25TopKFrames(layout(spark, root), stats(spark, root),
      queries, qKeyCol, qTextCol, k, k1, b, buckets)

  /** Fold base ∪ deltas (minus superseded versions) into a fresh
    * single-level base and drop the delta + sidecar trees — same
    * crash-safe staged swap as [[IvfStream]] (staging fully written
    * first; interrupted-swap recovery removes only the MANIFESTED
    * delta entries, whose rows the staged copy already contains).
    * Postings are re-clustered one file per bucket WITH their
    * generation identity preserved as a data column (see [[BaseGen]]
    * — sidecar rows written after a crashed swap reference the
    * folded generations and must keep matching); the LIVE stats and
    * registry are rewritten in the base format, so supersede
    * bookkeeping restarts empty on the happy path. */
  def compact(spark: SparkSession, root: String): Unit =
    // every read happens INSIDE the write lambda: stagedSwap only
    // invokes it outside the interrupted-swap recovery branch, where
    // base/ is guaranteed present (reading the layout up front would
    // crash recovery itself — base absent, only staging complete)
    IvfStream.stagedSwap(root, clear = ClearDirs) { staging =>
      val posts = liveWithGen(spark, root).localCheckpoint()
      val liveReg = registry(spark, root)
        // size-gated (the growth contract) — the registry side is
        // corpus-sized too, so over the cap this is a plain shuffled
        // anti-join, fine for an offline fold
        .join(TextAnalysis.gateBySize(sidecar(spark, root)
            .select(col("doc_id").as("s_doc"), col("gen").as("s_gen")),
            IvfStream.sidecarRowHint(s"$root/superseded")),
          col("doc_id") === col("s_doc") && col("gen") === col("s_gen"),
          "left_anti")
        .select(col("doc_id"), col("dl"), col("gen"))
        .localCheckpoint()
      // pre-registry roots (an original base written before the
      // registry existed) would otherwise fold to a PRESENT-but-empty
      // registry — later re-crawls would silently never supersede.
      // Backfill from the live postings (distinct per doc by
      // construction); zero-token documents have no postings row and
      // stay unrecoverable for pre-registry bases, documented.
      val live = liveReg.unionByName(
        posts.select(col("doc_id"), col("dl").cast("long").as("dl"),
            col("gen")).distinct()
          // NOT broadcast: the registry is corpus-sized — a plain
          // shuffled anti-join is fine for an offline fold
          .join(liveReg.select(col("doc_id")), Seq("doc_id"),
            "left_anti"))
        .localCheckpoint()
      // integral live totals, collected as longs — no double
      // round-trip; equals genStats − sidecar by construction, but
      // derived from the registry so pre-registry roots (empty
      // registry) fall back to the generation stats
      val t = genStats(spark, root)
        .agg(sum(col("n")).as("n"), sum(col("sdl")).as("sdl"))
        .collect()(0)
      val s = sidecar(spark, root)
        .agg(coalesce(count(lit(1)), lit(0L)).as("sn"),
          coalesce(sum(col("dl").cast("long")), lit(0L)).as("ssdl"))
        .collect()(0)
      val n = t.getLong(0) - s.getLong(0)
      val sdl = t.getLong(1) - s.getLong(1)
      // the fold watermark: max over the prior base's watermark and
      // every delta generation this swap folds (dir names — the same
      // driver-side listing the swap manifest snapshots). Superseded
      // gens count too: their ids are spent even if no row survives.
      val deltaGens = ClearDirs.flatMap { d =>
        Option(new java.io.File(s"$root/$d").listFiles()).toSeq.flatten
          .map(_.getName).collect {
            case s0 if s0.startsWith("batch=") => s0.drop(6).toLong
          }
      }
      val maxGen = (foldWatermark(spark, root) +: deltaGens).max
      graft.pipeline.LayoutWrite.salted(posts, "term_bucket",
          col("doc_id"))
        .write.mode("overwrite").partitionBy("term_bucket")
        .parquet(s"$staging/postings")
      spark.range(1)
        .select(lit(n).cast("double").as("n_docs"),
          lit(if (n > 0) sdl.toDouble / n else 0.0).as("avgdl"),
          lit(n).as("n"), lit(sdl).as("sdl"),
          lit(maxGen).as("max_gen"))
        .write.mode("overwrite").parquet(s"$staging/stats")
      live.write.mode("overwrite").parquet(s"$staging/docs")
      new java.io.File(staging, "_SUCCESS").createNewFile(): Unit
    }

  /** Start incremental BM25 maintenance over a parquet document
    * directory: new files → tokenize → delta postings append (with
    * supersede bookkeeping for re-crawled doc_ids). Pass `schema` to
    * start before the first file lands. */
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
