package graft.streaming

import graft.pipeline.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental MinHash-LSH candidate generation — the streaming form of
  * [[Dedup.minHashCandidates]], closing the batch-only boundary
  * [[CurationStream]] documents (its scaladoc keeps near-dup dedup as a
  * periodic batch sweep; this is the bounded-state incremental form for
  * pipelines that need candidates AS DOCUMENTS ARRIVE).
  *
  * State: the accumulated band-signature store — one `batch=<id>`
  * parquet partition per micro-batch holding that batch's (key, band,
  * band_hash) rows, exactly the relation the batch LSH self-joins. Per
  * micro-batch the candidates are
  *
  *  - within-batch: the batch's own band self-join (`key_a < key_b`) —
  *    identical code path to the batch form, and
  *  - cross-batch: the batch's bands equi-joined against all PRIOR
  *    batches' bands, pair order normalized with least/greatest.
  *
  * Every pair is emitted in exactly one batch partition — the batch of
  * its later-arriving member — so the union over partitions needs no
  * cross-partition dedup, and the result equals the batch form on the
  * full corpus for ANY arrival order (pairs are symmetric; nothing
  * depends on which member arrived first — unlike the funnel's
  * keeper-choice ordering contract). Proven stream==batch in
  * StreamingSpec over a corpus with cross-batch near-dups.
  *
  * Re-arrival (recrawl) semantics: LAST WRITE WINS per key, matching
  * the ingest tier's upsert contract. When a key re-arrives with
  * updated text, its older bands are superseded IMMEDIATELY — the
  * prior-state read anti-joins away the current batch's keys (so the
  * re-arrival batch's other documents never join the stale signature)
  * and records the superseded (key, batch) rows in a sidecar that
  * every later batch's prior-state read also anti-joins. A stale
  * signature therefore never joins, in the re-arrival batch or after
  * it. This is deliberately NOT the batch form's behavior on a corpus
  * that still contains both versions as separate rows (there, groupBy
  * merges both versions' shingles into one signature); the stream
  * equals the batch form run over the latest-version-per-key corpus —
  * the corpus a last-write-wins pipeline would actually have at rest.
  * Pairs emitted in batches BEFORE the re-arrival were computed
  * against the then-current version and remain in the store as
  * candidates, not verdicts; the exact-similarity verify stage
  * re-checks them against current text (same sketch-then-verify
  * contract as [[Dedup.verifiedJaccard]]).
  *
  * Exactly-once: all three writes (pairs, bands, superseded sidecar)
  * are overwrite-mode `batch=<id>` partition directories, and every
  * prior-state read EXCLUDES the batch's own partition, so a replayed
  * batch regenerates identical output instead of double-joining
  * against its own bands (the [[CurationStream]] replay-safety
  * discipline; same AnalysisException-means-empty first-batch
  * contract).
  *
  * 100 TB shape: per batch the work is bands(batch) ⨝ bands(seen) on
  * (band, band_hash) — bucket-local like the batch form, with the
  * stream's own bands on the (small) probe side. The accumulated band
  * store is only ever SCANNED, never shuffled while the sidecar stays
  * small: supersede filtering is two anti-joins — the current batch's
  * keys (micro-batch-bounded, always broadcast) and the superseded
  * sidecar, which grows with TOTAL RE-ARRIVALS SINCE THE LAST
  * COMPACTION and is therefore corpus-scale for a re-crawl-heavy
  * corpus, not a broadcastable relation. The sidecar anti-joins route
  * through the broadcast size gate
  * ([[graft.pipeline.TextAnalysis.gateBySize]]) with a hint summed
  * from per-batch `_ROWS` stamps ([[IvfStream.stampRows]], observe-
  * captured during the sidecar writes — zero extra jobs, driver-only
  * listing to read): under the cap the store is scanned and the
  * sidecar broadcast; over it the join degrades to a shuffle instead
  * of failing at 100 TB. The maintenance story is periodic
  * [[compact]]ion: rewrite the store dropping superseded rows and
  * reset the sidecar to EMPTY (StreamingSpec pins the reset) — the
  * crash-safe staged swap shared with the other index maintainers —
  * so the operational knob is "compact before the stamp sum crosses
  * the gate's cap". (The previous design
  * superseded via a per-key max-batch window, which re-shuffled the
  * ENTIRE store on every micro-batch — a per-batch cost growing with
  * corpus size, exactly what a 1000-executor deployment cannot pay.) */
object LshStream {

  /** Read the accumulated candidate pairs (union of all batch
    * partitions; disjoint by construction, distinct for safety). */
  def pairs(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/pairs")
      .select(col("key_a"), col("key_b")).distinct()

  /** Sidecar directory recording superseded band rows: one
    * `batch=<id>` partition per micro-batch holding the (key,
    * stale_batch) pairs whose store rows that batch's re-arrivals
    * made stale. Rows ∝ total re-arrivals, not corpus size. */
  private[graft] def supersededDir(bandsDir: String): String =
    bandsDir.stripSuffix("/") + "_superseded"

  /** The layout root `bandsDir` sits under — `root/bands`,
    * `root/bands_superseded`, and (once [[compact]] has run)
    * `root/base/{bands,meta}` are siblings there. */
  private def rootOf(bandsDir: String): String =
    new java.io.File(bandsDir.stripSuffix("/")).getParentFile.getPath

  /** The trees a compaction folds and clears (NOT `pairs` — the
    * candidate output is append-only and survives folds). */
  private val ClearDirs = Seq("bands", "bands_superseded")

  /** The folded base's band rows, batch provenance preserved as the
    * `gen` data column (sidecar rows written after a crashed swap
    * reference the generation a delta HAD — a fold that collapsed
    * gens would dangle them and resurrect stale bands); None when no
    * fold has happened yet. */
  private def baseBands(spark: SparkSession, root: String,
      keyCol: String): Option[DataFrame] =
    try Some(spark.read.parquet(s"$root/base/bands")
      .select(col(keyCol), col("band"), col("band_hash"),
        col("gen").cast("long").as("batch")))
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if IvfStream.missingPath(e) => None
    }

  /** The highest generation ever folded into `base/` (stamped by
    * [[compact]]), or -1 — the [[Bm25Stream]] fold-watermark pattern:
    * an append whose id is not above this is a fresh-checkpoint
    * restart reusing ids, and its sidecar rows would cross-match the
    * folded generation's rows. */
  private def foldWatermark(spark: SparkSession, root: String): Long =
    try spark.read.parquet(s"$root/base/meta")
      .agg(max(col("max_gen").cast("long"))).collect()(0) match {
        case r if r.isNullAt(0) => -1L
        case r => r.getLong(0)
      }
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if IvfStream.missingPath(e) => -1L
    }

  /** The accumulated band store — folded base ∪ streamed deltas —
    * minus the current batch's own delta partition (replay safety),
    * batch provenance retained for supersede filtering. `emptyLike`
    * supplies the (key, band, band_hash) schema for the
    * nothing-written-yet first batch. */
  private[graft] def storeBands(spark: SparkSession, bandsDir: String,
      batchId: Long, keyCol: String, emptyLike: DataFrame): DataFrame = {
    val base = baseBands(spark, rootOf(bandsDir), keyCol)
    val delta =
      try Some(spark.read.parquet(bandsDir)
        .filter(col("batch") =!= lit(batchId))
        .select(col(keyCol), col("band"), col("band_hash"),
          col("batch")))
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if IvfStream.missingPath(e) => None
      }
    (base, delta) match {
      case (Some(b), Some(d)) => b.unionByName(d)
      case (Some(b), None) => b
      case (None, Some(d)) => d
      case (None, None) =>
        emptyLike.select(col(keyCol), col("band"), col("band_hash"))
          .limit(0).withColumn("batch", lit(0L))
    }
  }

  /** The LIVE prior-state relation for `batchId`: [[storeBands]] minus
    * rows superseded by earlier batches' re-arrivals (sidecar
    * anti-join) minus rows for keys in `myKeys` (immediate supersede —
    * the re-arrival batch's other documents must not see stale bands).
    * Both anti-join sides broadcast, so the store is only ever
    * SCANNED, never shuffled — the plan shape StreamingSpec pins. */
  private[graft] def livePrior(spark: SparkSession, bandsDir: String,
      batchId: Long, keyCol: String, myKeys: DataFrame,
      emptyLike: DataFrame): DataFrame = {
    val staleDir = supersededDir(bandsDir)
    val superseded =
      try spark.read.parquet(staleDir)
        .filter(col("batch") =!= lit(batchId))
        .select(col(keyCol).as("s_key"), col("stale_batch"))
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if IvfStream.missingPath(e) =>
          emptyLike.select(col(keyCol).as("s_key")).limit(0)
            .withColumn("stale_batch", lit(0L))
      }
    storeBands(spark, bandsDir, batchId, keyCol, emptyLike)
      // sidecar size-gated (the growth contract above); myKeys stays
      // forced — it is micro-batch-bounded by construction
      .join(graft.pipeline.TextAnalysis.gateBySize(superseded,
          IvfStream.sidecarRowHint(staleDir,
            excludeBatch = Some(batchId))),
        col(keyCol) === col("s_key") &&
          col("batch") === col("stale_batch"), "left_anti")
      .join(broadcast(myKeys), Seq(keyCol), "left_anti")
      .select(col(keyCol), col("band"), col("band_hash"))
  }

  private[graft] def processBatch(batch: DataFrame, batchId: Long,
      pairsDir: String, bandsDir: String, textCol: String, keyCol: String,
      numHashes: Int, bands: Int): Unit = {
    val spark = batch.sparkSession
    // a crashed compact leaves base/ absent and staging marked: the
    // store readers' missingPath fallback would silently see an EMPTY
    // base, so a batch re-crawling a base-resident key would record
    // no supersede row and its stale bands would join forever.
    // Complete the pending swap FIRST (the Bm25Stream discipline).
    IvfStream.recoverPendingSwap(rootOf(bandsDir), ClearDirs)
    // a reused id would overwrite committed band state — and the
    // sidecar's (key, stale_batch) rows recorded against the OLD
    // generation would silently supersede the NEW rows written under
    // the same id, anti-joining a fresh document's bands away forever
    IvfStream.requireFreshBatchId(bandsDir, batchId,
      "LshStream.processBatch")
    // ids folded away by compaction are spent too (their rows keep
    // `gen` identity in the base — a reused id's sidecar rows would
    // cross-match them)
    val wm = foldWatermark(spark, rootOf(bandsDir))
    require(batchId > wm,
      s"LshStream.processBatch: batch id $batchId is not above the " +
        s"compaction watermark $wm — a stream restarted with a fresh " +
        "checkpoint reuses ids; resume from the original checkpoint " +
        "or start batch ids above the watermark")
    // the band relation feeds both join sides and the state write —
    // cut the lineage once so shingling/minhashing runs once per batch
    val myBands = Dedup.lshBands(
      Dedup.minHashSignatures(batch, textCol, keyCol, numHashes),
      keyCol, numHashes, bands).localCheckpoint(true)
    val myKeys = myBands.select(col(keyCol)).distinct()
    val staleDir = supersededDir(bandsDir)
    // rows this batch's re-arrivals make stale, recorded for every
    // later batch (the store scan here is the same scan the candidate
    // join pays; the result is tiny — re-arrived keys only)
    val obs = org.apache.spark.sql.Observation()
    storeBands(spark, bandsDir, batchId, keyCol, myBands)
      .join(broadcast(myKeys), Seq(keyCol))
      .select(col(keyCol), col("batch").as("stale_batch")).distinct()
      .observe(obs, count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$staleDir/batch=$batchId")
    // stamp LAST (observe-captured): the summed stamps size-gate
    // every later sidecar anti-join
    IvfStream.stampRows(s"$staleDir/batch=$batchId",
      obs.get("n").asInstanceOf[Long])
    val prior = livePrior(spark, bandsDir, batchId, keyCol, myKeys, myBands)
    val within = myBands
      .select(col(keyCol).as("key_a"), col("band"), col("band_hash"))
      .join(myBands.select(col(keyCol).as("key_b"), col("band"),
        col("band_hash")), Seq("band", "band_hash"))
      .filter(col("key_a") < col("key_b"))
    val cross = prior.select(col(keyCol).as("p_key"), col("band"),
        col("band_hash"))
      .join(myBands.select(col(keyCol).as("n_key"), col("band"),
        col("band_hash")), Seq("band", "band_hash"))
      .filter(col("p_key") =!= col("n_key"))
      .select(least(col("p_key"), col("n_key")).as("key_a"),
        greatest(col("p_key"), col("n_key")).as("key_b"))
    within.select(col("key_a"), col("key_b")).unionByName(cross)
      .distinct()
      .write.mode("overwrite").parquet(s"$pairsDir/batch=$batchId")
    myBands.write.mode("overwrite").parquet(s"$bandsDir/batch=$batchId")
  }

  /** The periodic maintenance job the sidecar design defers to (the
    * scaladoc's "rewrite the store dropping superseded rows and reset
    * the sidecar", now implemented): fold base ∪ all delta batches
    * MINUS the superseded rows into a fresh `base/bands`, stamp the
    * fold watermark, and clear the delta + sidecar trees — through
    * the crash-safe staged swap shared with the other index
    * maintainers. Band rows keep their original batch as the `gen`
    * data column (see [[baseBands]]); the candidate `pairs/` output
    * is untouched. A recrawl-heavy corpus runs this whenever the
    * sidecar's growth starts taxing the per-batch broadcast. */
  def compact(spark: SparkSession, outDir: String,
      keyCol: String = "doc_id"): Unit =
    IvfStream.stagedSwap(outDir, clear = ClearDirs) { staging =>
      val bandsDir = s"$outDir/bands"
      // every generation, nothing excluded (batchId = -1 matches no
      // partition), minus ALL sidecar rows — the live relation
      val all = storeBands(spark, bandsDir, batchId = -1L, keyCol,
        emptyLike = spark.range(0)
          .select(col("id").as(keyCol), col("id").cast("int")
            .as("band"), col("id").cast("string").as("band_hash")))
      val stale =
        try spark.read.parquet(supersededDir(bandsDir))
          .select(col(keyCol).as("s_key"),
            col("stale_batch").cast("long").as("s_gen"))
        catch {
          case e: org.apache.spark.sql.AnalysisException
              if IvfStream.missingPath(e) =>
            spark.range(0).select(col("id").as("s_key"),
              col("id").as("s_gen"))
        }
      // size-gated (the growth contract): the fold is exactly the
      // moment the sidecar is at its LARGEST
      val live = all.join(graft.pipeline.TextAnalysis.gateBySize(stale,
          IvfStream.sidecarRowHint(supersededDir(bandsDir))),
        col(keyCol) === col("s_key") &&
          col("batch") === col("s_gen"), "left_anti")
      val deltaGens = Option(new java.io.File(bandsDir).listFiles())
        .toSeq.flatten.map(_.getName).collect {
          case s if s.startsWith("batch=") => s.drop(6).toLong
        }
      val maxGen = (foldWatermark(spark, outDir) +: deltaGens).max
      import spark.implicits._
      live.withColumnRenamed("batch", "gen")
        .write.mode("overwrite").parquet(s"$staging/bands")
      Seq(maxGen).toDF("max_gen").coalesce(1)
        .write.mode("overwrite").parquet(s"$staging/meta")
      new java.io.File(staging, "_SUCCESS").createNewFile(): Unit
    }

  /** Start incremental LSH over a parquet document directory: new files
    * → shingle → minhash → band → join against the accumulated band
    * store. Candidates land under `outDir/pairs`, band state under
    * `outDir/bands`; read results with [[pairs]].
    *
    * Pass `schema` explicitly to start the stream BEFORE the first
    * document lands (an empty/not-yet-created input dir has nothing to
    * infer from); when omitted, the schema is inferred from the files
    * already present. */
  def run(spark: SparkSession, inputDir: String, outDir: String,
      checkpointDir: String, textCol: String = "text",
      keyCol: String = "doc_id", numHashes: Int = 8, bands: Int = 4,
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
        processBatch(b, id, s"$outDir/pairs", s"$outDir/bands",
          textCol, keyCol, numHashes, bands)
      }
      .start()
  }
}
