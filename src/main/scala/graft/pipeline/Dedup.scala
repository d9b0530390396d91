package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed
  * around its shuffle profile at corpus scale:
  *
  *  - exact / fingerprint dedup: one hash-partitioned `row_number`
  *    window — a single shuffle on the hash key;
  *  - MinHash + LSH banding: signatures are one groupBy over shingles
  *    (map-side combinable `min` aggregates); candidate pairs come from
  *    an equi-join on (band, value) buckets — never an all-pairs cross
  *    join, so cost scales with bucket occupancy, not n²;
  *  - SimHash: bit-vote aggregation, again map-side combinable;
  *  - n-gram Jaccard: inverted-index self-join on token (the classic
  *    "join on the rare thing" — a stopword cap would bound skew at
  *    real scale; AQE's skew-join handles the midsize case);
  *  - embedding cosine: see [[Similarity]].
  *
  * Every hash is md5 (deterministic, engine-portable), so each operator
  * is reproducible across runs, partitionings, and the DuckDB oracle.
  */
object Dedup {

  /** Exact-duplicate resolution: keep the lowest-key row per hash of
    * `textCol` (deterministic "first wins"). Output adds `text_hash`
    * and `dup_rank` (1 = keeper). */
  def exactRank(df: DataFrame, textCol: String, keyCol: String): DataFrame = {
    val h = md5(col(textCol))
    df.withColumn("text_hash", h)
      .withColumn("dup_rank", row_number().over(
        Window.partitionBy(col("text_hash")).orderBy(col(keyCol))))
  }

  /** Canonical-form (fingerprint) duplicate groups with group size and
    * keeper key. */
  def fingerprintGroups(df: DataFrame, textCol: String,
      keyCol: String): DataFrame =
    df.withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("group_size"), min(col(keyCol)).as("keeper"))

  /** [[fingerprintGroups]] over the Unicode-normalized fingerprint
    * ([[TextAnalysis.fingerprintNfc]]): canonically-equivalent texts
    * (composed vs decomposed accents) land in one group. Same keyed
    * aggregation — scan-local normalization, one shuffle. */
  def fingerprintGroupsNfc(df: DataFrame, textCol: String,
      keyCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn("fp", TextAnalysis.fingerprintNfc(col(textCol)))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("group_size"), min(col(keyCol)).as("keeper"))
  }

  /** Corpus snapshot diff — the incremental-crawl primitive: given
    * two snapshots of a keyed text corpus, classify every key as
    * `added` (new only), `removed` (old only), `changed` (both, text
    * fingerprint differs) or `unchanged`. This is what decides how
    * much downstream work a re-crawl actually triggers (only
    * added/changed re-enter dedup/indexing; the streaming maintainers
    * in graft.streaming consume exactly that delta).
    *
    * Comparison is by md5 of the text, computed scan-side on EACH
    * leg, so the join moves two hex strings per key — never the
    * documents themselves — and the full-outer join is a plain
    * key-keyed shuffle (or co-partitioned/bucketed at rest, no
    * movement at all). Scale-safe at 100 TB by construction. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keyCol: String, textCol: String): DataFrame = {
    val o = oldSnap.select(col(keyCol).as("k_old"),
      md5(col(textCol)).as("old_fp"))
    val n = newSnap.select(col(keyCol).as("k_new"),
      md5(col(textCol)).as("new_fp"))
    o.join(n, col("k_old") === col("k_new"), "full_outer")
      .select(
        coalesce(col("k_old"), col("k_new")).as(keyCol),
        when(col("old_fp").isNull, "added")
          .when(col("new_fp").isNull, "removed")
          .when(col("old_fp") === col("new_fp"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Word 3-shingles with document-order positions. */
  def shingles(df: DataFrame, textCol: String, keyCol: String): DataFrame = {
    val toks = df.select(col(keyCol),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("pos"))
    toks
      .withColumn("t1", lead(col("tok"), 1).over(w))
      .withColumn("t2", lead(col("tok"), 2).over(w))
      .filter(col("t2").isNotNull)
      .select(col(keyCol),
        concat_ws(" ", col("tok"), col("t1"), col("t2")).as("shingle"))
  }

  /** MinHash signatures: `numHashes` permutations simulated as
    * min(md5(seed || shingle)), computed SCAN-LOCALLY by the
    * [[graft.functions.MinHashSigs]] codegen kernel — no shingle
    * explode, no lead() window, no per-key groupBy shuffle; the
    * signature never leaves the scan (round 19 — the kernel was
    * already proven bit-equivalent to the relational
    * explode+window+groupBy form by dd_minhash_scalar, which gates it
    * against dd_minhash's oracle verbatim; rows match too: a document
    * with < 3 tokens yields a null signature here and no groupBy row
    * there). Same (key, h0..h{k-1}) output schema, so every consumer
    * — candidates, the split-decontam val index, LshStream's
    * persisted band store — reads identical values. */
  def minHashSignatures(df: DataFrame, textCol: String, keyCol: String,
      numHashes: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val sig = graft.functions.GraftFunctions
      .minhash_sigs(col(textCol), numHashes)
    // The kernel concentrates the per-shingle md5×k work INTO the
    // scan tasks, so its parallelism is the INPUT SPLIT count — a
    // single-row-group parquet file yields ONE task no matter the
    // core count (measured at sf1: pp_filter_e2e 3.7 → 8.5 s vs the
    // relational form, whose shuffle spread the hashing). Restore
    // parallelism with a keyed repartition ONLY when the scan has
    // fewer splits than cores: the (key, text) shuffle is strictly
    // fewer bytes than the token shuffle the relational form paid,
    // and on a properly-sharded corpus (files ≥ cores — any real
    // 100 TB layout) this is a no-op.
    // explicit partition count: AQE's coalescing would shrink a
    // small-byte keyed repartition right back to one partition (the
    // advisory size is byte-based, but the point here is CPU spread)
    val spread =
      if (df.rdd.getNumPartitions <
          df.sparkSession.sparkContext.defaultParallelism)
        df.repartition(
          df.sparkSession.sparkContext.defaultParallelism, col(keyCol))
      else df
    // Null-signature rows (< 3 tokens) are dropped by a cheap
    // predicate, not `sig.isNotNull`: Catalyst pushes a deterministic
    // filter below the projection and re-inlines the expression, so
    // the isNotNull form ran the FULL kernel (per-shingle md5 × k)
    // twice per row — once in the Filter, once in the Project (there
    // is no cross-operator subexpression elimination). The predicate
    // replays the kernel's exact null rule ([[MinHashSigsKernel]]:
    // null text or < 3 non-empty `\W+` tokens of the lowercased text)
    // as an EARLY-EXIT regex — "≥ 3 non-empty \W+-separated segments
    // of lower(text)" ⟺ lower(text) contains three \w+ runs — because
    // the pushed-down filter lands scan-side BELOW the repartition,
    // where a full tokenize would run on the unspread splits (the
    // regex find bails after the first three runs; the lower() is
    // load-bearing — lowercasing can create word chars, e.g. İ → i +
    // U+0307, so raw-text token counts can differ).
    spread.filter(lower(col(textCol)).rlike("\\w+(\\W+\\w+){2}"))
      .select(col(keyCol), sig.as("sig"))
      .select(col(keyCol) +: (0 until numHashes).map(i =>
        element_at(col("sig"), i + 1).as(s"h$i")): _*)
  }

  /** LSH banding over a signature frame: `bands` bands of
    * `numHashes/bands` rows each, band value = md5 of its hashes.
    * Output: (key, band, band_hash). */
  def lshBands(signatures: DataFrame, keyCol: String, numHashes: Int = 8,
      bands: Int = 4): DataFrame = {
    require(bands > 0 && numHashes % bands == 0,
      s"bands ($bands) must evenly divide numHashes ($numHashes) — " +
        "otherwise trailing hashes are dropped or bands degenerate")
    val rowsPerBand = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      val hs = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat(hs: _*)).as("band_hash"))
    }
    signatures.select(col(keyCol),
      explode(array(bandCols: _*)).as("bh"))
      .select(col(keyCol), col("bh.band"), col("bh.band_hash"))
  }

  /** Near-duplicate candidate pairs: keys sharing any LSH band bucket.
    * The join is on (band, band_hash) — bucket-local, so no cross
    * join; dedups to distinct ordered pairs. */
  def minHashCandidates(df: DataFrame, textCol: String, keyCol: String,
      numHashes: Int = 8, bands: Int = 4): DataFrame = {
    val bandsDf = lshBands(
      minHashSignatures(df, textCol, keyCol, numHashes), keyCol,
      numHashes, bands)
    val a = bandsDf.select(col(keyCol).as("key_a"), col("band"),
      col("band_hash"))
    val b = bandsDf.select(col(keyCol).as("key_b"), col("band"),
      col("band_hash"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"))
      .distinct()
  }

  /** Leakage-safe train/validation split — the step every training
    * pipeline runs before the val set means anything: after a
    * deterministic hash split (`key % valMod == 0` → validation), a
    * training document is DROPPED if it could leak its validation
    * twin — exact leakage when its normalized [[TextAnalysis
    * .fingerprint]] matches any validation document's, near leakage
    * when it shares any MinHash LSH band bucket with one (the
    * recall-first decontamination contract: banding candidates drop
    * without a verify pass, because a false drop costs one training
    * document while a false keep costs the benchmark).
    *
    * Output: one row per input key with `split` ∈ `val` / `train` /
    * `dropped_exact` / `dropped_near` (exact takes precedence), so
    * the caller both filters and audits from the same frame.
    *
    * Scale shape: two semi-joins, both keyed — fingerprints meet on
    * `fp` (the validation side is a `1/valMod` fraction of corpus
    * DISTINCT fingerprints), bands meet on `(band, band_hash)`
    * exactly like [[minHashCandidates]] — bucket-local, never n².
    * Documents shorter than a shingle produce no bands and cannot
    * near-leak, matching the signature definition. */
  def leakageSafeSplit(df: DataFrame, textCol: String, keyCol: String,
      valMod: Int = 10, numHashes: Int = 8, bands: Int = 4)
      : DataFrame = {
    val isVal = pmod(col(keyCol), lit(valMod)) === 0
    val fp = splitFps(df, textCol, keyCol)
    val bandsDf = lshBands(
      minHashSignatures(df, textCol, keyCol, numHashes), keyCol,
      numHashes, bands)
    leakageSplitCore(df, keyCol, isVal, fp, bandsDf,
      fp.filter(isVal).select(col("fp")).distinct(),
      bandsDf.filter(isVal)
        .select(col("band"), col("band_hash")).distinct())
  }

  // NULL text fingerprints as the empty string, not NULL: two
  // NULL-text docs are byte-identical, and a NULL fp would never
  // equi-join — an exact leak the recall-first contract must catch
  private def splitFps(df: DataFrame, textCol: String,
      keyCol: String): DataFrame =
    df.select(col(keyCol),
      TextAnalysis.fingerprint(coalesce(col(textCol), lit("")))
        .as("fp"))

  /** The shared decontamination tail: two keyed LEFT SEMI joins
    * (fingerprints on `fp`, bands on `(band, band_hash)` — bucket-
    * local, never n²) against whichever val-side index the caller
    * supplies (computed inline or read from a persisted layout),
    * then the exact-precedence CASE. */
  private def leakageSplitCore(df: DataFrame, keyCol: String,
      isVal: Column, fp: DataFrame, bandsDf: DataFrame,
      valFps: DataFrame, valBands: DataFrame): DataFrame = {
    val exactLeak = fp.filter(!isVal)
      .join(valFps, Seq("fp"), "left_semi")
      .select(col(keyCol)).distinct()
      .withColumn("leak_exact", lit(true))
    val nearLeak = bandsDf.filter(!isVal)
      .join(valBands, Seq("band", "band_hash"), "left_semi")
      .select(col(keyCol)).distinct()
      .withColumn("leak_near", lit(true))
    df.select(col(keyCol))
      .join(exactLeak, Seq(keyCol), "left")
      .join(nearLeak, Seq(keyCol), "left")
      .select(col(keyCol),
        when(isVal, lit("val"))
          .when(col("leak_exact"), lit("dropped_exact"))
          .when(col("leak_near"), lit("dropped_near"))
          .otherwise(lit("train")).as("split"))
  }

  /** Persist the VAL/benchmark-side decontamination index: the
    * distinct normalized fingerprints and distinct LSH band buckets
    * of the validation (or benchmark) slice — the production shape,
    * where the benchmark suite is indexed ONCE and every training
    * crawl decontaminates against the stored index instead of
    * re-fingerprinting the val side per run (the
    * dd_contamination_at_rest precedent applied to the split). Both
    * relations are val-slice-sized, tiny next to the corpus. */
  def writeSplitValIndex(valDocs: DataFrame, textCol: String,
      keyCol: String, outDir: String, numHashes: Int = 8,
      bands: Int = 4): Unit = {
    splitFps(valDocs, textCol, keyCol)
      .select(col("fp")).distinct()
      .write.mode("overwrite").parquet(s"$outDir/fps")
    lshBands(minHashSignatures(valDocs, textCol, keyCol, numHashes),
        keyCol, numHashes, bands)
      .select(col("band"), col("band_hash")).distinct()
      .write.mode("overwrite").parquet(s"$outDir/bands")
  }

  /** [[leakageSafeSplit]] against a persisted
    * [[writeSplitValIndex]] layout: identical output (the driver
    * gate shares the inline oracle verbatim — MinHash/fingerprint
    * are pure functions of the text, so the stored val index is
    * bit-identical to the inline recomputation), but the val side
    * costs a layout read instead of a fingerprint+signature pass
    * per decontamination run. */
  def leakageSafeSplitAgainst(df: DataFrame, textCol: String,
      keyCol: String, indexDir: String, valMod: Int = 10,
      numHashes: Int = 8, bands: Int = 4): DataFrame = {
    val s = df.sparkSession
    val isVal = pmod(col(keyCol), lit(valMod)) === 0
    // the val side comes from the index; the core's !isVal filters
    // push below the hashing projections (keyCol-only predicates),
    // so only the train side is fingerprinted/banded per run
    val fp = splitFps(df, textCol, keyCol)
    val bandsDf = lshBands(
      minHashSignatures(df, textCol, keyCol, numHashes), keyCol,
      numHashes, bands)
    leakageSplitCore(df, keyCol, isVal, fp, bandsDf,
      s.read.parquet(s"$indexDir/fps"),
      s.read.parquet(s"$indexDir/bands"))
  }

  /** 64-bit SimHash, emitted as 4×16-bit signature parts
    * (key, part 0-3, sig) so the output stays engine-portable without
    * unsigned-64 headaches. Distinct tokens vote ±1 per bit; bit b of
    * md5-nibble n covers signature position (n-1)*4+b. */
  def simHashParts(df: DataFrame, textCol: String, keyCol: String): DataFrame = {
    // Scan-local via the SimHash64 codegen kernel (round 19): the
    // relational vote chain — distinct (key, token) shuffle, 16-nibble
    // × 4-bit explode (64 rows per distinct token), two grouped
    // aggregations — collapses to one expression call per document
    // plus the 4-part slice. dd_simhash_native_expr already proves
    // the kernel bit-identical against dd_simhash's oracle verbatim.
    // Row semantics preserved: token-less or null documents produced
    // no distinct-token rows (hence no parts) relationally, so filter
    // them before the kernel.
    graft.functions.GraftFunctions.register(df.sparkSession)
    // same scan-parallelism guard as [[minHashSignatures]]: the
    // kernel's per-token md5 voting runs in the scan tasks, so a
    // few-split input serializes it; no-op on a sharded corpus
    val spread =
      if (df.rdd.getNumPartitions <
          df.sparkSession.sparkContext.defaultParallelism)
        df.repartition(
          df.sparkSession.sparkContext.defaultParallelism, col(keyCol))
      else df
    // early-exit regex for "≥ 1 token of lower(text)" (see
    // minHashSignatures — lower() is load-bearing)
    spread.filter(lower(col(textCol)).rlike("\\w"))
      .select(col(keyCol),
        graft.functions.GraftFunctions.simhash64(col(textCol)).as("sh"))
      .select(col(keyCol), posexplode(array((0 until 4).map(i =>
        expr(s"shiftrightunsigned(sh, ${16 * i}) & 65535")): _*))
        .as(Seq("part", "sig")))
  }

  /** SimHash near-dup candidate pairs, Manku-style: two 64-bit
    * signatures within Hamming distance 3 must agree exactly on at
    * least one of the 4 16-bit parts (pigeonhole), so candidates are
    * keys sharing any (part, sig) bucket — an equi-join on the part
    * tables, never a pairwise signature scan. Exactly the LSH-banding
    * shape [[minHashCandidates]] uses, so the same 100 TB profile:
    * cost scales with bucket occupancy, not n². (Verification —
    * computing the true Hamming distance on the survivors — is a
    * cheap post-filter the caller applies when distance ≤ 3 must be
    * exact rather than a recall bound.) */
  def simHashCandidates(df: DataFrame, textCol: String,
      keyCol: String): DataFrame = {
    val parts = simHashParts(df, textCol, keyCol)
    val a = parts.select(col(keyCol).as("key_a"), col("part"), col("sig"))
    val b = parts.select(col(keyCol).as("key_b"), col("part"), col("sig"))
    a.join(b, Seq("part", "sig"))
      .filter(col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"))
      .distinct()
  }

  /** Exact n-gram (token-set) Jaccard pairs via an inverted-index
    * self-join: |A∩B| from the token join, sizes from a per-key count,
    * similarity = inter / (|A|+|B|-inter). */
  def jaccardPairs(df: DataFrame, textCol: String, keyCol: String,
      threshold: Double): DataFrame = {
    // uncached by design: the token frame is reused by two consumers,
    // but a cache here could never be unpersisted by the caller
    val toks = df.select(col(keyCol),
      explode(array_distinct(TextAnalysis.tokens(col(textCol))))
        .as("tok"))
    val sizes = toks.groupBy(col(keyCol)).agg(count(lit(1)).as("sz"))
    val inter = toks.select(col(keyCol).as("key_a"), col("tok"))
      .join(toks.select(col(keyCol).as("key_b"), col("tok")), Seq("tok"))
      .filter(col("key_a") < col("key_b"))
      .groupBy(col("key_a"), col("key_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(keyCol).as("key_a"), col("sz").as("sz_a")),
        Seq("key_a"))
      .join(sizes.select(col(keyCol).as("key_b"), col("sz").as("sz_b")),
        Seq("key_b"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("key_a"), col("key_b"),
        round(col("jaccard").cast(
          org.apache.spark.sql.types.DecimalType(28, 10)), 3)
          .cast("double").as("jaccard"))
  }

  /** Sketch-then-verify Jaccard: exact token-set Jaccard computed ONLY
    * for MinHash+LSH candidate pairs — the scale form of
    * [[jaccardPairs]], whose inverted-index join must intersect every
    * co-occurring pair. Here the expensive intersection count touches
    * just the candidate set (join candidates → explode each side's
    * distinct tokens → count matches), so cost follows LSH bucket
    * occupancy while every SURVIVING pair still carries its exact
    * similarity. Recall is the banding curve (a true near-dup pair
    * missed by all bands is never verified); precision is exact.
    * Output schema matches [[jaccardPairs]]. */
  def sketchVerifiedJaccard(df: DataFrame, textCol: String, keyCol: String,
      threshold: Double, numHashes: Int = 8, bands: Int = 4): DataFrame = {
    val cands = minHashCandidates(df, textCol, keyCol, numHashes, bands)
    val toks = df.select(col(keyCol),
      explode(array_distinct(TextAnalysis.tokens(col(textCol))))
        .as("tok"))
    val sizes = toks.groupBy(col(keyCol)).agg(count(lit(1)).as("sz"))
    val inter = cands
      .join(toks.select(col(keyCol).as("key_a"), col("tok")), Seq("key_a"))
      .join(toks.select(col(keyCol).as("key_b"), col("tok")),
        Seq("key_b", "tok"))
      .groupBy(col("key_a"), col("key_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(keyCol).as("key_a"), col("sz").as("sz_a")),
        Seq("key_a"))
      .join(sizes.select(col(keyCol).as("key_b"), col("sz").as("sz_b")),
        Seq("key_b"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("key_a"), col("key_b"),
        round(col("jaccard").cast(
          org.apache.spark.sql.types.DecimalType(28, 10)), 3)
          .cast("double").as("jaccard"))
  }

  /** Benchmark-decontamination scan: flag corpus documents sharing any
    * word n-gram with a held-out (test) subset — the standard
    * contamination check run before training on scraped data. One
    * inverted-index equi-join on the gram: the test gram set is
    * typically tiny relative to the corpus (broadcastable), and corpus
    * grams stream map-side; no pairwise document comparison happens.
    * Returns (key, n_shared) per contaminated non-test document. */
  def contaminationHits(docs: DataFrame, textCol: String, keyCol: String,
      isTest: Column, n: Int,
      broadcastTestSide: Boolean = true): DataFrame = {
    require(n >= 1, "contaminationHits: n-gram size must be >= 1")
    // normalized tokens (lowercase, non-word splits dropped) like the
    // rest of the dd_* family: decontamination must catch case/
    // punctuation variants of a held-out passage. Grams come from the
    // NATIVE word_ngrams kernel (as contaminationHitsFrames does) —
    // the old lambda-built tk array was consumed by BOTH the
    // size(tk) >= n filter and the transform gram builder, the exact
    // fresh-lambda-id re-tokenization pattern the round-16 rule bans
    // (each consumer re-ran the whole split chain per row, over the
    // corpus side). word_ngrams returns an empty array below n
    // tokens, so the explode drops those docs — the same contract.
    val fns = graft.functions.GraftFunctions
    fns.register(docs.sparkSession)
    val grams = docs.select(col(keyCol), isTest.as("is_test"),
      explode(fns.word_ngrams(col(textCol), n)).as("gram"))
    // a held-out benchmark suite is usually small next to the corpus:
    // broadcasting its gram set means corpus grams never shuffle. For
    // a LARGE held-out side (broadcast would overflow the driver),
    // pass broadcastTestSide=false to fall back to the shuffle join.
    val distinctTest = grams.filter(col("is_test"))
      .select(col("gram")).distinct()
    val testGrams =
      if (broadcastTestSide) broadcast(distinctTest) else distinctTest
    grams.filter(!col("is_test"))
      .join(testGrams, Seq("gram"))
      .groupBy(col(keyCol))
      .agg(countDistinct(col("gram")).as("n_shared"))
  }

  /** [[contaminationHits]] behind a Bloom prefilter — the 100 TB
    * decontamination shape: the held-out suite's gram set is sketched
    * once into a Bloom filter (`bloom_agg` over xxhash64 — a few MB
    * for millions of grams, broadcastable even when the exact distinct
    * gram set is not), corpus grams that miss the sketch drop
    * SCAN-SIDE, and only the tiny surviving fraction reaches the exact
    * semi-join. The exact join removes every Bloom false positive and
    * Bloom filters have no false negatives, so the output is
    * IDENTICAL to [[contaminationHits]] — the gate runs both against
    * the same oracle. `expectedItems`/`numBits` size the sketch
    * (defaults give 8 bits/item ≈ 2% fpp at 1M grams — ~1% would need
    * ~9.6 bits/item; fpp only affects how much work the prefilter
    * saves, never correctness). Spark caps the
    * aggregate at `spark.sql.optimizer.runtime.bloomFilter.maxNumItems`
    * (4M) / `.maxNumBits` (2^26) — raise both confs when sizing for a
    * larger suite, or the aggregate fails analysis. For a test side
    * too large even for the exact-verify broadcast, pass
    * `broadcastTestSide = false` (the [[contaminationHits]] escape
    * hatch — the bloom prefilter still shrinks the shuffle's probe
    * side to the surviving grams). */
  def contaminationBloomHits(docs: DataFrame, textCol: String,
      keyCol: String, isTest: Column, n: Int,
      expectedItems: Long = 1000000L,
      numBits: Long = 8L * 1000000L,
      broadcastTestSide: Boolean = true): DataFrame = {
    require(n >= 1, "contaminationBloomHits: n-gram size must be >= 1")
    val fns = graft.functions.GraftFunctions
    fns.register(docs.sparkSession)
    val grams = docs.select(col(keyCol), isTest.as("is_test"),
      explode(fns.word_ngrams(col(textCol), n)).as("gram"))
    // the test gram set feeds BOTH the sketch and the exact verify —
    // materialize the fork once (crossDocDupStats' DAG-fork trick)
    val distinctTest = grams.filter(col("is_test"))
      .select(col("gram")).distinct().localCheckpoint(false)
    // might_contain requires a CONSTANT sketch: collect the bounded
    // binary (numBits/8 bytes by construction — MBs, not data-scale)
    // and embed it as a literal, the same driver-bounded move the
    // partitioned-ANN probe sets make. The filter is then scan-side
    // with no join at all.
    val bf = distinctTest
      .agg(fns.bloom_agg(xxhash64(col("gram")), expectedItems, numBits)
        .as("bf"))
      .collect().head.getAs[Array[Byte]]("bf")
    val candidates = grams.filter(!col("is_test"))
      .filter(fns.bloom_contains(lit(bf), xxhash64(col("gram"))))
    val verifySide =
      if (broadcastTestSide) broadcast(distinctTest) else distinctTest
    candidates.join(verifySide, Seq("gram"))
      .groupBy(col(keyCol))
      .agg(countDistinct(col("gram")).as("n_shared"))
  }

  /** Write the corpus n-gram inverted index **at rest** — the
    * decontamination twin of [[graft.pipeline.Retrieval.writeBm25Index]]:
    * distinct `(doc_id, gram)` rows partitioned by `gram_bucket`
    * (same xxhash64-mod bucketing as the BM25 term index), so a
    * decontamination run stops paying the corpus gram explode —
    * measured as the heaviest non-ANN gate at sf10 (43 s, the corpus
    * scan+explode dominating) — and instead reads only the buckets
    * the benchmark's grams hash into. The gram derivation is
    * `word_ngrams`, identical to [[contaminationBloomHits]]' stream
    * (which shares [[contaminationHits]]' oracle), so the probe is
    * provably the same relation.
    *
    * The index stores ALL documents (no is_test baked in): which
    * held-out suite to decontaminate against is a QUERY-time choice —
    * benchmarks rotate, the corpus index doesn't. Rows are distinct
    * per (doc, gram); `n_shared` is a countDistinct so dedup at
    * write time only shrinks the files. */
  def writeGramIndex(docs: DataFrame, textCol: String, keyCol: String,
      outDir: String, n: Int, buckets: Int = 64): Unit = {
    require(n >= 1 && buckets >= 1 && buckets <= 4096,
      s"writeGramIndex: n >= 1, 1..4096 buckets; got n=$n buckets=$buckets")
    LayoutWrite.salted(gramIndexRows(docs, textCol, keyCol, n, buckets),
        "gram_bucket", col("doc_id"))
      .write.mode("overwrite").partitionBy("gram_bucket")
      .parquet(s"$outDir/grams")
    new java.io.File(outDir, "_SUCCESS").createNewFile(): Unit
  }

  /** One generation's index rows `(doc_id, gram, gram_bucket)` — the
    * single derivation shared by the base writer and every streamed
    * delta ([[graft.streaming.GramStream]]), so a delta batch's rows
    * are bit-identical to a full rebuild's for those documents (a
    * document's gram set is a function of that document alone). */
  private[graft] def gramIndexRows(docs: DataFrame, textCol: String,
      keyCol: String, n: Int, buckets: Int): DataFrame = {
    val fns = graft.functions.GraftFunctions
    fns.register(docs.sparkSession)
    docs.select(col(keyCol).as("doc_id"),
        explode(fns.word_ngrams(col(textCol), n)).as("gram"))
      .distinct()
      .withColumn("gram_bucket",
        graft.pipeline.Retrieval.termBucket(col("gram"), buckets))
  }

  /** [[contaminationHits]] against a [[writeGramIndex]] layout: the
    * held-out suite is still tokenized inline (it is the small side
    * by the same contract that lets the inline path broadcast it),
    * its grams' buckets become a literal `gram_bucket IN (…)`
    * partition filter on the index scan, suite documents are dropped
    * from the hit side via a broadcast anti-join on doc_id, and the
    * exact gram join + per-doc countDistinct are unchanged — so the
    * gate shares dd_contamination's oracle SQL verbatim (lossless-
    * layout proof). Steady-state decontamination cost tracks the
    * BENCHMARK's gram vocabulary, not the corpus. */
  def contaminationHitsAtRest(spark: SparkSession, indexDir: String,
      testDocs: DataFrame, textCol: String, keyCol: String, n: Int,
      buckets: Int = 64): DataFrame =
    contaminationHitsFrames(spark.read.parquet(s"$indexDir/grams"),
      testDocs, textCol, keyCol, n, buckets)

  /** The probe body over an EXPLICIT gram-index frame — shared by
    * [[contaminationHitsAtRest]] (single base) and
    * [[graft.streaming.GramStream]] (base ∪ streamed deltas): the
    * benchmark grams' buckets filter is applied to the frame as
    * given, so when it is a union the literal `gram_bucket IN (…)`
    * pushes into EVERY underlying scan. */
  def contaminationHitsFrames(index: DataFrame, testDocs: DataFrame,
      textCol: String, keyCol: String, n: Int,
      buckets: Int = 64): DataFrame = {
    val spark = testDocs.sparkSession
    val fns = graft.functions.GraftFunctions
    fns.register(spark)
    val testGrams = testDocs
      .select(col(keyCol).as("t_doc"),
        explode(fns.word_ngrams(col(textCol), n)).as("gram"))
      .localCheckpoint() // probe set, doc exclusion, gram join
    val probed = testGrams
      .select(graft.pipeline.Retrieval.termBucket(col("gram"), buckets)
        .as("gb"))
      .distinct().collect().map(_.getInt(0)).sorted
    val testKeys = testGrams.select(col("t_doc").as("doc_id")).distinct()
    val distinctTest = testGrams.select(col("gram")).distinct()
    index
      .filter(col("gram_bucket").isin(probed.toIndexedSeq: _*))
      .join(broadcast(testKeys), Seq("doc_id"), "left_anti")
      .join(broadcast(distinctTest), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("n_shared"))
  }

  /** Dedup resolution: cluster near-duplicate pairs into connected
    * components and label every id with its component representative
    * (the smallest id in the component — singletons represent
    * themselves). This is the step after candidate generation in every
    * large-scale dedup pipeline: pairs → clusters → keep one per
    * cluster. Runs GraphX `connectedComponents` (Pregel min-label
    * propagation over vertex-partitioned state) — iterations scale
    * with component diameter, state with vertex count, never with the
    * quadratic pair-path count a join-based closure would enumerate.
    * Ids must be integral (they become GraphX VertexIds). */
  def componentClusters(ids: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String): DataFrame = {
    import org.apache.spark.graphx.{Edge, Graph, VertexId}
    val spark = ids.sparkSession
    import spark.implicits._
    // null ids can't be VertexIds; GraphX would also materialize any
    // edge endpoint absent from `ids` as a phantom vertex (and it
    // could even become a keeper) — restrict edges to the universe the
    // caller declared, so unknown/null endpoints are ignored rather
    // than silently invented
    val universe = ids.select(col(idCol).cast("long").as("__uid"))
      .filter(col("__uid").isNotNull)
    val cleanPairs = pairs
      .select(col(aCol).cast("long").as("__a"),
        col(bCol).cast("long").as("__b"))
      .join(universe, col("__a") === col("__uid"), "left_semi")
      .join(universe, col("__b") === col("__uid"), "left_semi")
    val vertices = universe.as[Long].rdd.map(id => (id: VertexId, ()))
    val edgeRdd = cleanPairs
      .as[(Long, Long)].rdd.map { case (a, b) => Edge(a, b, ()) }
    // GraphX caches the graph's vertex/edge RDDs internally and the
    // result graph stays cached too; in a long-lived session (a bench
    // loop, a service) those blocks accumulate across calls and the
    // growing memory pressure taxes every LATER query (observed as
    // 3-14× inflation of unrelated queries late in the round-10 sf10
    // bench). Materialize the one-row-per-id result eagerly, then
    // release every graph block before returning.
    val graph = Graph(vertices, edgeRdd)
    val cc = graph.connectedComponents()
    val out = cc.vertices.map { case (id, comp) => (id, comp) }
      .toDF(idCol, "component").localCheckpoint(true)
    cc.unpersist(blocking = false)
    graph.unpersist(blocking = false)
    out
  }

  /** Survivor selection by QUALITY rather than arrival order: cluster
    * near-duplicate pairs ([[componentClusters]]) and keep, per
    * cluster, the member with the highest score (ties → smallest id —
    * a total order, so the keeper set is deterministic). This is the
    * policy production dedup actually wants — the canonical copy of a
    * near-dup cluster is its best-scoring member (longest, highest
    * quality, most central), not whichever id happens to be minimal.
    * `scores` is any (id, score) relation: document length, a quality
    * score, a PageRank centrality ([[graft.pipeline.GraphRank]]).
    *
    * Scale shape: components are the Pregel pass; the scoring join is
    * id-keyed; the keeper pick is one row_number window partitioned
    * by component — state O(cluster count), never pairwise. */
  def keepBest(ids: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String, scores: DataFrame,
      scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val comp = componentClusters(ids, idCol, pairs, aCol, bCol)
    val w = Window.partitionBy(col("component"))
      .orderBy(col(scoreCol).desc_nulls_last, col(idCol))
    // LEFT join: an id missing from `scores` must stay IN the report
    // (ranked last, null score) — an inner join would silently drop
    // it, and if the true best member lacked a score a different one
    // would be crowned with no error anywhere
    comp.join(scores.select(col(idCol), col(scoreCol)), Seq(idCol),
        "left_outer")
      .withColumn("__rk", org.apache.spark.sql.functions.row_number()
        .over(w))
      .select(col(idCol), col("component"), col(scoreCol),
        (col("__rk") === 1).as("is_keeper"))
  }
}
