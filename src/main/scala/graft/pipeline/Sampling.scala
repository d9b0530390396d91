package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling operators for training-data pipelines.
  *
  * Complements the global deterministic Bernoulli sample
  * (ExtendedQueries q32: md5-prefix thresholding) with the per-source
  * quota form used to hit a target source *mixture* — "take N_i
  * documents from source i" — which is how pretraining mixes are
  * specified in practice.
  */
object Sampling {

  /** Deterministic per-group quota sample: keep the `quota(group)`
    * documents with the smallest md5(key) per group (defaultQuota for
    * groups not in the map), ties broken by key. Hash order makes the
    * sample reproducible across runs, partitionings, and engines —
    * re-running with a bigger quota grows the sample monotonically
    * (the first k stay chosen), which is what an iterative mixture
    * tuning loop needs.
    *
    * Shuffle profile: one hash partition + sort per group (the
    * row_number window); quotas travel as a literal CASE chain, so no
    * join. At 100 TB group cardinality is small (sources), so AQE's
    * skew handling plus the window's internal spill keep this one
    * clean pass; output adds `sample_rank`. */
  def mixtureSample(df: DataFrame, keyCol: String, groupCol: String,
      quotas: Map[String, Int], defaultQuota: Int): DataFrame = {
    require(defaultQuota >= 0 && quotas.values.forall(_ >= 0),
      "mixtureSample: quotas must be non-negative")
    val quotaCol = quotas.toSeq.sortBy(_._1)
      .foldRight(lit(defaultQuota)) { case ((g, q), acc) =>
        when(col(groupCol) === g, lit(q)).otherwise(acc)
      }
    df.withColumn("sample_rank", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(md5(col(keyCol).cast("string")), col(keyCol))))
      .filter(col("sample_rank") <= quotaCol)
  }

  /** Concat-and-chunk packing spans: where each document lands when
    * the corpus is concatenated in key order and cut into fixed
    * `chunkTokens`-token blocks — the GPT-style pretraining packing.
    * Per document: its token count, global start offset within its
    * group's stream, and the first/last chunk it touches (a document
    * spans `last_chunk - first_chunk + 1` blocks).
    *
    * Packing is PER GROUP (source/shard), matching how real pipelines
    * shard the stream: the running-sum window partitions by group, so
    * groups pack in parallel and the serial spine is one shard's
    * cumulative sum — the unavoidable sequential dependency of
    * order-preserving packing, confined to a shard. One shuffle (hash
    * by group + sort by key). */
  def concatChunkSpans(df: DataFrame, textCol: String, keyCol: String,
      groupCol: String, chunkTokens: Int): DataFrame = {
    require(chunkTokens > 0, "concatChunkSpans: chunkTokens must be > 0")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens",
        size(TextAnalysis.tokens(col(textCol))).cast("long"))
      .withColumn("start_token",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("first_chunk",
        floor(col("start_token") / chunkTokens).cast("long"))
      // empty documents occupy no tokens: they "touch" only the chunk
      // they start in (last == first)
      .withColumn("last_chunk",
        floor(greatest(col("start_token"),
          col("start_token") + col("n_tokens") - 1) / chunkTokens)
          .cast("long"))
  }

  /** Length-bucketed batch assignment — the padding-minimization step
    * of a training data loader: documents are bucketed by token-count
    * magnitude (bucket = bit-length of the count — an INTEGER
    * `floor(log2)+1`, computed as `length(bin(n))` so both engines
    * agree exactly where a float log2 could straddle a power-of-two
    * boundary), then batched `batchSize` at a time in deterministic
    * md5 hash order within the bucket. Same-bucket documents differ
    * in length by at most 2×, bounding padding waste per batch.
    *
    * One shuffle (the per-bucket window); bucket cardinality is
    * log(max tokens) — tiny — so at corpus scale each bucket's sort
    * spills like any window, and the hash order keeps batches
    * reproducible across runs and partitionings. Output adds
    * n_tokens, bucket, batch_idx. */
  def lengthBucketBatches(df: DataFrame, textCol: String,
      keyCol: String, batchSize: Int): DataFrame = {
    require(batchSize > 0, "lengthBucketBatches: batchSize must be > 0")
    val w = Window.partitionBy(col("bucket"))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("n_tokens",
        TextAnalysis.whitespaceTokenCount(col(textCol)))
      .withColumn("bucket",
        length(bin(greatest(col("n_tokens"), lit(1)))).cast("long"))
      .withColumn("batch_idx",
        floor((row_number().over(w) - lit(1)).cast("double") / batchSize)
          .cast("long"))
  }

  /** Token-budget-capped selection — the data-constrained subsetting
    * step ("take at most `budget` tokens per group"): documents are
    * consumed in deterministic md5 hash order within each group and
    * kept while the running token total stays within budget. The hash
    * order makes the selection reproducible AND monotonic in the
    * budget (a bigger budget keeps a superset — what an iterative
    * data-mix search needs). One window pass per group, same shuffle
    * shape as [[mixtureSample]]. Output adds n_tokens, cum_tokens. */
  def budgetSelect(df: DataFrame, textCol: String, keyCol: String,
      groupCol: String, budget: Long): DataFrame = {
    require(budget >= 0, "budgetSelect: budget must be >= 0")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens",
        TextAnalysis.whitespaceTokenCount(col(textCol)))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Sliding-window chunking with overlap — the retrieval-indexing /
    * long-context-training cut: each document's token stream is cut
    * into `chunkTokens`-token windows starting every `stride` tokens
    * (stride < chunkTokens ⇒ adjacent chunks share
    * `chunkTokens - stride` tokens of context). Differs from
    * [[concatChunkSpans]] (the GPT-style cross-document packing) in
    * that chunks never cross document boundaries and may overlap.
    *
    * Chunk i covers tokens [i·stride, i·stride + chunkTokens); the
    * count is 1 for docs at most one window long (an empty document
    * still yields one empty chunk, so every input row is represented
    * downstream), else floor((n − chunk + stride − 1)/stride) + 1 —
    * FLOOR over DOUBLE rather than integer `div` because that is the
    * one division both engines define identically (values ≪ 2^52, so
    * the double round-trip is exact; the pp_packing lesson).
    *
    * Purely scan-local: tokenize, per-row `sequence` explode, array
    * slice — no shuffle, no state, so it maps over 100 TB at input
    * parallelism and the output is at most ⌈chunk/stride⌉× the input
    * tokens. All output columns are integers/strings — no float
    * determinism caveats at all. */
  def chunkWithOverlap(df: DataFrame, textCol: String, keyCol: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      "chunkWithOverlap: need 0 < stride <= chunkTokens")
    df.withColumn("tk", TextAnalysis.tokens(col(textCol)))
      .withColumn("n_tokens", size(col("tk")).cast("long"))
      .withColumn("n_chunks",
        when(col("n_tokens") <= chunkTokens, lit(1L))
          .otherwise(floor(
            (col("n_tokens") - chunkTokens + stride - 1).cast("double")
              / stride).cast("long") + 1L))
      .withColumn("chunk_idx",
        explode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumn("start_token", col("chunk_idx") * stride)
      .withColumn("chunk_tokens",
        least(col("n_tokens") - col("start_token"),
          lit(chunkTokens.toLong)))
      .withColumn("chunk_text",
        array_join(slice(col("tk"),
          (col("start_token") + 1).cast("int"), lit(chunkTokens)), " "))
      .select(col(keyCol), col("n_tokens"), col("chunk_idx"),
        col("start_token"), col("chunk_tokens"), col("chunk_text"))
  }

  /** Content-defined chunking (CDC): cut points chosen by the CONTENT
    * of a small trailing token window rather than by fixed offsets —
    * the storage-dedup primitive (LBFS/rsync lineage). The property
    * that earns the extra window hash over [[chunkWithOverlap]]: an
    * edit early in a document shifts every fixed-offset boundary
    * after it, but CDC boundaries re-synchronize as soon as the
    * window clears the edit, so the unchanged tail re-produces
    * IDENTICAL chunk fingerprints and cross-version/cross-document
    * dedup keeps working under insertions (PipelineSpec pins exactly
    * this resynchronization).
    *
    * A boundary falls AFTER token `i` when the md5 of the trailing
    * `window`-token context starts with hex '0' (p = 1/16 ⇒ mean
    * chunk ≈ 16 tokens — the same engine-portable hex-prefix
    * thresholding as the q32 Bernoulli sample); the document tail is
    * always a chunk. The windowed hash and the boundary cumsum keep
    * per-row state bounded by `window`, and both ride ONE doc-keyed
    * window shuffle (chunking is doc-local, so at 100 TB this is
    * embarrassingly parallel — and a mapPartitions segmenter over
    * doc-grouped input could drop even that single shuffle).
    *
    * Output `(key, chunk_id, start_pos, n_tokens, fingerprint)` with
    * fingerprint = md5 of the space-joined chunk tokens — the
    * identity downstream chunk-level dedup joins on. All columns
    * integral or hex strings: no float caveats. */
  def chunkContentDefined(df: DataFrame, textCol: String,
      keyCol: String, window: Int = 4): DataFrame = {
    require(window > 0, "chunkContentDefined: window must be positive")
    val byPos = Window.partitionBy(col(keyCol)).orderBy(col("pos"))
    // The doc-keyed spread replaces (not adds to) the window's own
    // exchange — hashpartitioning(key, cores) satisfies the window's
    // required distribution and Generate preserves it — while moving
    // tokenize+explode+per-token md5 off the scan task AND pinning the
    // partition count: AQE coalesces this exchange by BYTES (~9 MB of
    // tokens at sf0.1 → 9 tasks) but the per-row window-hash work is
    // CPU-bound (profiled 3.5 s executor CPU on 9 of 32 cores).
    // No-op whenever the scan already has >= cores splits.
    val toks = TextAnalysis.spreadByKey(df, keyCol)
      .select(col(keyCol),
        posexplode(TextAnalysis.tokens(col(textCol)))
          .as(Seq("pos", "tok")))
    val marked = toks
      .withColumn("wh", md5(concat_ws(" ",
        collect_list(col("tok")).over(
          byPos.rowsBetween(-(window - 1).toLong, 0L)))))
      .withColumn("boundary",
        when(substring(col("wh"), 1, 1) === "0", 1L).otherwise(0L))
      // a boundary ENDS its chunk: token i's chunk = boundaries
      // strictly before i (frame to 1 PRECEDING; first token → 0)
      .withColumn("chunk_id", coalesce(
        sum(col("boundary")).over(
          byPos.rowsBetween(Window.unboundedPreceding, -1L)),
        lit(0L)))
    marked
      .groupBy(col(keyCol), col("chunk_id"))
      .agg(
        min(col("pos")).as("start_pos"),
        count(lit(1)).as("n_tokens"),
        // positions are contiguous within a chunk, so sorting the
        // (pos, tok) structs replays token order without a second
        // window pass
        md5(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          _.getField("tok")))).as("fingerprint"))
  }

  /** Leakage-safe train/eval split: every id in a near-duplicate
    * cluster goes to the SAME side, so a train document can never be
    * a near-copy of an eval document — the contamination failure mode
    * of naive per-document hash splits (near-dup pairs straddle the
    * split ~2·p·(1−p) of the time). Input is a `(id, component)`
    * cluster relation (e.g. [[Dedup.componentClusters]] over MinHash
    * LSH candidates); the side is decided by the md5 of the CLUSTER
    * label, compared against a hex-prefix ceiling (`"2"` ⇒ 2/16 of
    * clusters → eval), the same engine-portable thresholding as the
    * q32 Bernoulli sample. Deterministic across runs, partitionings,
    * and engines; scan-local over the cluster relation (the expensive
    * part — clustering — is the upstream dedup pass a pipeline has
    * already paid for). */
  def leakageSafeSplit(clusters: DataFrame, componentCol: String,
      evalHexCeil: String = "2"): DataFrame =
    clusters.withColumn("split",
      when(md5(col(componentCol).cast("string")) < evalHexCeil, "eval")
        .otherwise("train"))

  /** Temperature-scaled mixture weights over a grouping column — the
    * UniMax/multilingual-sampling recipe: flatten the group-size
    * distribution by renormalizing share^(1/T), upweighting
    * low-resource groups. T is pinned at 2 (share^(1/2) = sqrt):
    * IEEE sqrt is correctly rounded, so both engines produce
    * identical bits where a libm `pow` could drift an ulp — other
    * temperatures plug into the same shape when bit-replay isn't
    * required.
    *
    * Scale shape: the only corpus-sized work is one
    * map-side-combinable (count, token-sum) aggregate; everything
    * after runs on the group-cardinality relation (languages/
    * sources — tens of rows at any corpus size), so the unpartitioned
    * normalization windows are trivial by construction. The sqrt
    * masses route through DECIMAL(28,15) before summing, making the
    * normalizer order-independent and engine-exact ([[graft.queries
    * .StarQueries.sumd]]'s trick). Output per group: n_docs,
    * n_tokens, share, weight (share and weight rounded to 3). */
  def temperatureWeights(df: DataFrame, textCol: String,
      groupCol: String): DataFrame = {
    val all = Window.partitionBy()
    val perGroup = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.whitespaceTokenCount(col(textCol)))
          .as("n_tokens"))
    perGroup
      .withColumn("share_raw", col("n_tokens").cast("double") /
        sum(col("n_tokens")).over(all))
      .withColumn("wr", sqrt(col("share_raw")))
      .select(col(groupCol), col("n_docs"), col("n_tokens"),
        Similarity.r3(col("share_raw")).as("share"),
        Similarity.r3(col("wr") /
          sum(col("wr").cast(
            org.apache.spark.sql.types.DecimalType(28, 15))).over(all)
            .cast("double")).as("weight"))
  }

  /** Curriculum staging: assign every document to one of `nStages`
    * difficulty stages by token-length quartile (length is the
    * classic zero-model difficulty proxy — short docs first). The
    * thresholds are exact interpolated percentiles computed in ONE
    * tiny aggregate row that broadcasts back onto the scan, so stage
    * assignment is scan-local — no global sort, no ntile window over
    * the corpus (the trap a naive curriculum shard falls into: a
    * total order of 100 TB for what is really an n-way CASE). A
    * stage-then-shard materialization downstream writes
    * `stage=N/` partitioned output exactly like the other at-rest
    * layouts. Boundary rule: stage i+1 starts strictly ABOVE the
    * i-th threshold, so ties at a percentile land in the lower
    * stage. */
  def curriculumStages(df: DataFrame, textCol: String, keyCol: String,
      nStages: Int = 4): DataFrame = {
    require(nStages >= 2 && nStages <= 100,
      "curriculumStages: 2..100 stages")
    val nt = TextAnalysis.whitespaceTokenCount(col(textCol))
    val base = df.select(col(keyCol), nt.cast("long").as("n_tokens"))
    val qs = (1 until nStages).map(i => i.toDouble / nStages)
    val thresholds = base.agg(
      expr(s"percentile(n_tokens, ${qs.head})").as("t1"),
      qs.tail.zipWithIndex.map { case (q, i) =>
        expr(s"percentile(n_tokens, $q)").as(s"t${i + 2}")
      }: _*)
    base.crossJoin(broadcast(thresholds))
      .select(col(keyCol), col("n_tokens"),
        (1 until nStages).map(i =>
          (col("n_tokens") > col(s"t$i")).cast("int"))
          .reduce(_ + _).+(lit(1)).as("stage"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): rank raw-corpus
    * documents by how target-like their n-gram distribution is, using
    * two MLE occurrence models over the SAME gram space —
    * `p_t(g) = c_t(g)/N_t` on the `targetPred` subset and
    * `p_r(g) = c_r(g)/N_r` on the full corpus, both rounded to 9
    * decimals IN DECIMAL (the house bit-replay contract,
    * [[TextAnalysis.bigramModel]]). A document's weight is the
    * occurrence-weighted mean of the per-gram ratio `p_t/p_r`: > 1
    * means its grams are over-represented in the target. The
    * canonical multiplicative weight `exp Σ log(p_t/p_r)` needs `ln`,
    * which is not correctly rounded across engines; the ratio mean
    * keeps the whole gate on IEEE-exact division + exact decimal
    * sums while preserving the ordering the resampling step consumes
    * (take the top-N by weight, or threshold — both downstream of
    * this relation). Grams unseen in the target contribute ratio 0 —
    * evidence against target-likeness. Every scored gram has
    * `p_r > 0` pre-rounding (the raw model is trained on the same
    * corpus), but the 9-decimal model rounding can zero a rare gram's
    * `p_r` once total occurrences exceed ~2×10^9 — those grams score
    * ratio 0, like unseen ones, instead of Infinity/NaN (guarded in
    * both the engine and the oracle).
    * Documents with no gram (< n tokens) drop out, like every gram
    * operator here.
    *
    * 100 TB shape: gram construction is the codegen'd `word_ngrams`
    * scan; both models are GRAM-VOCABULARY-sized aggregates — at
    * 100 TB that is strictly more rows than the word vocabulary
    * CLAUDE.md's sizing rule puts at 10⁸-10⁹, so the scoring join is
    * size-gated ([[TextAnalysis.gateBySize]]) with the gram-type
    * count measured once at model derivation, never force-broadcast;
    * the per-doc combine is the same gram-keyed map-side-partial
    * pattern as [[TextAnalysis.scoreWithBigramModel]]. The two
    * global totals are each one scalar aggregate. */
  /** The per-gram importance ratio `p_t / p_r` over rounded model
    * columns `p9_t` (nullable — unseen in the target) and `p9_r`.
    * p_r > 0 holds for every scored gram PRE-rounding only: past
    * ~2×10^9 total occurrences a rare gram's p9_r rounds to exactly
    * 0 and the ratio would go Infinity (or NaN when p9_t is also 0),
    * poisoning the document's weight. A zero-ROUNDED p_r is treated
    * like an unseen gram — ratio 0 — which is also the limit of the
    * true ratio's contribution at that precision. (PipelineSpec pins
    * this guard on a literal p9_r = 0 row.) */
  private[graft] def importanceRatio9: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types.DecimalType
    when(col("p9_r") > 0, round(
      (coalesce(col("p9_t"), lit(0).cast(DecimalType(18, 9)))
        .cast("double") / col("p9_r").cast("double"))
        .cast(DecimalType(28, 10)), 9).cast(DecimalType(18, 9)))
      .otherwise(lit(0).cast(DecimalType(18, 9)))
  }

  /** The combined DSIR model from `(gram, c_t, c_r)` sufficient
    * statistics: one gram-keyed table `(gram, p9_t nullable, p9_r)` —
    * `p9_t` NULL exactly when the gram never occurs in the target
    * subset (the old separate-table form's left-outer semantics),
    * both probabilities 9-decimal-rounded in DECIMAL. */
  private def dsirModelFrom(byGram: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val totals = byGram.agg(
      sum(col("c_t")).cast("double").as("n_t"),
      sum(col("c_r")).cast("double").as("n_r"))
    byGram.crossJoin(broadcast(totals))
      .select(col("gram"),
        when(col("c_t") > 0,
          round((col("c_t").cast("double") / col("n_t"))
            .cast(DecimalType(28, 10)), 9).cast(DecimalType(18, 9)))
          .as("p9_t"),
        round((col("c_r").cast("double") / col("n_r"))
          .cast(DecimalType(28, 10)), 9).cast(DecimalType(18, 9))
          .as("p9_r"))
  }

  /** The scoring join: occurrence stream × size-gated model →
    * per-document occurrence-weighted ratio mean. Inner join on the
    * model (every corpus gram is in the raw model when the model was
    * trained on this corpus; genuinely-new grams under an at-rest
    * model carry no evidence and drop, the OOV discipline). */
  private def scoreDsir(occ: DataFrame, model: DataFrame,
      gramHint: Long, keyCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    occ.join(TextAnalysis.gateBySize(model, gramHint), Seq("gram"))
      .groupBy(col(keyCol))
      .agg(sum(col("occ")).as("n_grams"),
        sum(importanceRatio9 * col("occ").cast(DecimalType(10, 0)))
          .as("r_sum"))
      .select(col(keyCol), col("n_grams"),
        Similarity.r3(col("r_sum").cast("double") / col("n_grams"))
          .as("dsir_weight"))
  }

  /** Per-(doc, gram) occurrence counts — the one corpus-sized gram
    * shuffle every DSIR form pays exactly once per apply. */
  private def dsirOcc(docs: DataFrame, textCol: String,
      keyCol: String, n: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col(keyCol), explode(
        graft.functions.GraftFunctions.word_ngrams(col(textCol), n))
        .as("gram"))
      .groupBy(col(keyCol), col("gram"))
      .agg(count(lit(1)).as("occ"))
  }

  /** Retrain-per-call DSIR (the measured inline baseline —
    * [[writeDsirModel]] + [[dsirWeightsFromStore]] is the
    * recommended production path). Trains both models in one
    * gram-keyed aggregation job, eagerly checkpointed (gram-vocab-
    * sized — the round-10 small-shared-relation rule) so its row
    * count is the derivation-time size hint for the scoring join's
    * broadcast gate; the old form's forced `broadcast(model)` fails
    * outright at a 100 TB gram vocabulary instead of degrading to
    * the shuffle join this one takes. Costs one extra corpus gram
    * scan vs the old single-action ReusedExchange share — the price
    * of retraining per call, which the at-rest twin doesn't pay. */
  def dsirWeights(docs: DataFrame, textCol: String, keyCol: String,
      targetPred: org.apache.spark.sql.Column, n: Int = 2): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val byGram = docs
      .select(targetPred.as("is_t"), explode(
        graft.functions.GraftFunctions.word_ngrams(col(textCol), n))
        .as("gram"))
      .groupBy(col("gram"))
      .agg(sum(when(col("is_t"), 1L).otherwise(0L)).as("c_t"),
        count(lit(1)).as("c_r"))
      .localCheckpoint()
    val nGrams = byGram.count()
    scoreDsir(dsirOcc(docs, textCol, keyCol, n),
      dsirModelFrom(byGram), nGrams, keyCol)
  }

  /** Persist a trained DSIR model at rest: the combined
    * `(gram, p9_t, p9_r)` table plus a params row stamping `n` (the
    * gram order — a mismatched apply would score garbage, so reads
    * carry it into gram construction) and `n_grams` (the model row
    * count, captured via `observe` during the write itself — zero
    * extra jobs — which [[dsirWeightsFromStore]] uses as the
    * broadcast-gate hint). Training is a batch job by design (both
    * models are global MLE distributions); the store is what makes
    * APPLY pay training once instead of per call. */
  def writeDsirModel(docs: DataFrame, textCol: String,
      targetPred: org.apache.spark.sql.Column, n: Int,
      outDir: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    graft.streaming.IvfStream.requireNoPendingSwap(outDir,
      "Sampling.writeDsirModel")
    // params deleted FIRST, written LAST (the NbStream discipline):
    // an overwrite-in-place retrain (say n=2 → n=3) that crashes
    // between the model and params writes would otherwise leave a
    // NEW model beside STALE params — apply would build the wrong
    // gram order and silently score a near-total join miss. A crash
    // now leaves a loud missing-params store instead.
    graft.streaming.IvfStream.rmRec(new java.io.File(
      graft.streaming.IvfStream.localPath(s"$outDir/params")))
    // the ROOT sentinel goes with them: a retrain-in-place that
    // crashes mid-write would otherwise leave sentinel-present/
    // params-missing — loud on every apply, but never self-healing
    // (ensureLayout-guarded callers trust the sentinel and skip the
    // rebuild forever). With the sentinel gone the next guarded call
    // wipes and retrains automatically.
    new java.io.File(graft.streaming.IvfStream.localPath(outDir),
      "_SUCCESS").delete(): Unit
    val byGram = docs
      .select(targetPred.as("is_t"), explode(
        graft.functions.GraftFunctions.word_ngrams(col(textCol), n))
        .as("gram"))
      .groupBy(col("gram"))
      .agg(sum(when(col("is_t"), 1L).otherwise(0L)).as("c_t"),
        count(lit(1)).as("c_r"))
    val obs = org.apache.spark.sql.Observation()
    dsirModelFrom(byGram)
      .observe(obs, count(lit(1)).as("n_grams"))
      .write.mode("overwrite").parquet(s"$outDir/model")
    Seq((n, obs.get("n_grams").asInstanceOf[Long]))
      .toDF("n", "n_grams").coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/params")
    // the ROOT sentinel ensureLayout-style gate caches check (the
    // per-parquet _SUCCESS files live inside model/ and params/) —
    // without it a sentinel-guarded caller rebuilds the store on
    // every call, silently voiding the train-once contract
    new java.io.File(graft.streaming.IvfStream.localPath(outDir),
      "_SUCCESS").createNewFile(): Unit
  }

  /** Deterministic importance RESAMPLING — the selection step DSIR
    * exists for: keep the top-`n` documents of a [[dsirWeights]] /
    * [[dsirWeightsFromStore]] relation by weight, ties broken on the
    * key (weights are 3-dp-rounded doubles, so cross-engine ties are
    * exact, and the tie-break makes the selected set reproducible —
    * the [[mixtureSample]] discipline applied to importance
    * selection). Global top-n plans as TakeOrderedAndProject (heap
    * per partition + driver merge, no full sort at 100 TB); the
    * rank column is a window over the already-selected n rows —
    * driver-bounded, one tiny single-partition pass. */
  def dsirSelect(weights: DataFrame, keyCol: String,
      n: Int): DataFrame = {
    require(n >= 1, "dsirSelect: n must be >= 1")
    val ord = Seq(col("dsir_weight").desc, col(keyCol))
    weights.orderBy(ord: _*).limit(n)
      .select(row_number().over(Window.orderBy(ord: _*))
        .as("rank"),
        col(keyCol), col("dsir_weight"))
      // contractual total order (the SparkEntry determinism rule):
      // rank-ascending already falls out of the window's physical
      // single-partition sort today, but a later plan change (an
      // exchange or project landing after the window) could silently
      // reorder the dump; the explicit sort is over n driver-bounded
      // rows — free
      .orderBy(col("rank"))
  }

  /** Score a relation against a persisted [[writeDsirModel]] store:
    * one corpus gram scan, model joined under the store-stamped
    * size gate — no retraining, no measuring, no forced broadcast. */
  def dsirWeightsFromStore(docs: DataFrame, textCol: String,
      keyCol: String, dir: String): DataFrame = {
    val spark = docs.sparkSession
    val p = spark.read.parquet(s"$dir/params").collect()(0)
    val n = p.getAs[Int]("n")
    val hint = p.getAs[Long]("n_grams")
    scoreDsir(dsirOcc(docs, textCol, keyCol, n),
      spark.read.parquet(s"$dir/model"), hint, keyCol)
  }
}
