package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Lexical ranked retrieval over a document corpus — the search-side
  * complement to the embedding ANN tier ([[Similarity]]): BM25, the
  * standard quality-retrieval primitive a curation pipeline uses to
  * mine targeted subsets ("find the docs most about X") before any
  * embedding model exists.
  *
  * Scale shape: token occurrences are filtered to the query
  * vocabulary SCAN-SIDE (broadcast join against the distinct query
  * terms, applied to the exploded token stream before any shuffle),
  * so the only corpus-sized shuffles carry matching occurrences only:
  * the (doc, term) tf count, the tiny per-term document-frequency
  * aggregate, and the final (query, doc) score combine — all
  * map-side combinable, all rows of a few bytes. Document lengths and
  * corpus stats are scan-local over the tokenized frame. The query
  * batch and its derived tables (terms, dfs, corpus stats) are all
  * broadcast; nothing about the corpus is ever collected.
  *
  * (An earlier form computed per-doc tf scan-locally with
  * `array_distinct` + a nested `filter` count — O(len·distinct) per
  * document, measured 3× slower than the filtered explode at 500 k
  * docs. The shuffle this form pays is bounded by the query
  * vocabulary's corpus frequency, not the corpus.)
  */
object Retrieval {

  /** Okapi BM25 top-k: for each query, the `k` highest-scoring
    * documents under
    * `score(q,d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`
    * with the Lucene idf `ln(1 + (N−df+0.5)/(df+0.5))` (always
    * positive), summing over the query's DISTINCT terms. Tokenization
    * is [[TextAnalysis.tokens]] — the same `\w+` runs every text
    * operator here shares, so the oracle replays it verbatim.
    *
    * Determinism: per-term weights are fixed-order double arithmetic
    * (engine-portable bit-for-bit); the cross-term sum routes through
    * DECIMAL(28,15) so partial-aggregation order cannot perturb the
    * last bits; ties rank by ascending doc key. `avgdl` divides an
    * exact integral token-count sum — no floating accumulation.
    *
    * Output `(q_id, rank, doc_id, score)`, score rounded to 3 decimals
    * AFTER ranking. */
  def bm25TopK(docs: DataFrame, textCol: String, keyCol: String,
      queries: DataFrame, qKeyCol: String, qTextCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // tokenize ONCE: every downstream relation (postings, dfs, corpus
    // stats) derives from this frame, so the regex split — the
    // dominant scan cost — is paid a single time
    val tk = docs
      .select(col(keyCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("tk"))
      .localCheckpoint()
    val qterms = queries
      .select(col(qKeyCol).as("q_id"),
        explode(array_distinct(TextAnalysis.tokens(col(qTextCol))))
          .as("term"))
      .localCheckpoint() // consumed by the df restriction AND scoring
    val vocab = broadcast(qterms.select(col("term")).distinct())
    // query-vocabulary postings: explode the token stream, drop
    // non-query terms scan-side (broadcast join — nothing has
    // shuffled yet), then one keyed count. dl rides along so scoring
    // never rejoins the corpus.
    val postings = tk
      .select(col("doc_id"), size(col("tk")).cast("double").as("dl"),
        explode(col("tk")).as("term"))
      .join(vocab, Seq("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .localCheckpoint() // df aggregate AND scoring
    // df per query term over the full corpus: one row per (doc, term)
    // in postings by construction
    val dfs = postings
      .groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    // corpus-level constants: one row, exact integral sums — over the
    // tokenized frame so zero-token docs still count (oracle parity)
    val stats = tk.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(size(col("tk"))).as("avgdl"))
    scoreTail(postings, qterms, dfs, stats, k, k1, b)
  }

  /** The shared BM25 scoring tail — one body for the inline and
    * at-rest paths, so their arithmetic is identical by construction
    * (which is what lets [[bm25TopKAtRest]] share [[bm25TopK]]'s
    * oracle verbatim): per-(term, doc) weight in fixed-order double
    * arithmetic, cross-term sum routed through DECIMAL(28,15),
    * per-query rank with ascending-doc tie-break, r3-rounded score. */
  private def scoreTail(postings: DataFrame, qterms: DataFrame,
      dfs: DataFrame, stats: DataFrame, k: Int, k1: Double,
      b: Double): DataFrame = {
    val dec = DecimalType(28, 15)
    def d(x: Double): Column = lit(x).cast("double")
    val matched = postings
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfs), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(d(1.0) +
        (col("n_docs") - col("df") + d(0.5)) / (col("df") + d(0.5))))
      .withColumn("w",
        col("idf") * col("tf") * (d(k1) + d(1.0)) /
          (col("tf") +
            d(k1) * (d(1.0) - d(b) + d(b) * col("dl") / col("avgdl"))))
    matched
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("w").cast(dec)).cast("double").as("score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("doc_id"),
        Similarity.r3(col("score")).as("score"))
  }

  /** DPR-style hard-negative mining — the retrieval-training data op:
    * for each (query, positive) pair, the top BM25 hits that are NOT
    * the positive become the hard negatives (lexically confusable,
    * semantically wrong — the negatives that actually teach a
    * retriever). Runs [[bm25TopK]] once (its scale shape — vocabulary-
    * bounded shuffles — carries over unchanged); the positive-removal
    * join and the re-rank are per-query-sized. `queries` carries
    * (`qKeyCol`, `qTextCol`, `posCol`); output
    * `(q_id, pos_id, neg_id, neg_rank, score)` with `nNeg` negatives
    * per query, ordered by the underlying BM25 rank. */
  def hardNegatives(docs: DataFrame, textCol: String, keyCol: String,
      queries: DataFrame, qKeyCol: String, qTextCol: String,
      posCol: String, k: Int, nNeg: Int): DataFrame = {
    require(nNeg >= 1 && k > nNeg,
      s"hardNegatives: need k=$k > nNeg=$nNeg >= 1")
    negativesTail(
      bm25TopK(docs, textCol, keyCol,
        queries.select(col(qKeyCol), col(qTextCol)), qKeyCol, qTextCol,
        k),
      queries, qKeyCol, posCol, nNeg)
  }

  /** [[hardNegatives]] over a [[writeBm25Index]] at-rest layout — the
    * mining run stops paying the postings build per batch; the probe
    * reads only the pseudo-queries' term buckets. Identical output to
    * the inline form by construction (one shared negatives tail over
    * [[bm25TopKAtRest]], whose equality to [[bm25TopK]] its own gate
    * already proves). */
  def hardNegativesAtRest(spark: SparkSession, indexDir: String,
      queries: DataFrame, qKeyCol: String, qTextCol: String,
      posCol: String, k: Int, nNeg: Int,
      buckets: Int = 64): DataFrame = {
    require(nNeg >= 1 && k > nNeg,
      s"hardNegativesAtRest: need k=$k > nNeg=$nNeg >= 1")
    negativesTail(
      bm25TopKAtRest(spark, indexDir,
        queries.select(col(qKeyCol), col(qTextCol)), qKeyCol, qTextCol,
        k, buckets = buckets),
      queries, qKeyCol, posCol, nNeg)
  }

  /** The shared positive-removal + re-rank tail of the two mining
    * paths. `hits` is a `(q_id, rank, doc_id, score)` top-k list. */
  private def negativesTail(hits: DataFrame, queries: DataFrame,
      qKeyCol: String, posCol: String, nNeg: Int): DataFrame =
    hits
      .join(broadcast(queries.select(col(qKeyCol).as("q_id"),
        col(posCol).as("pos_id"))), Seq("q_id"))
      .filter(col("doc_id") =!= col("pos_id"))
      .withColumn("neg_rank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("rank"))))
      .filter(col("neg_rank") <= nNeg)
      .select(col("q_id"), col("pos_id"), col("doc_id").as("neg_id"),
        col("neg_rank"), col("score"))
      .orderBy(col("q_id"), col("neg_rank"))

  /** The term→partition bucket shared by [[writeBm25Index]],
    * [[bm25TopKAtRest]], and the streamed delta writer
    * ([[graft.streaming.Bm25Stream]]): xxhash64 (fixed seed, stable
    * across sessions and releases) mod the bucket count, as INT so
    * the read-back partition column type-infers cast-free. */
  private[graft] def termBucket(term: Column, buckets: Int): Column =
    pmod(xxhash64(term), lit(buckets.toLong)).cast("int")

  /** The tokenized `(doc_id, tk)` frame every index writer derives
    * from — one definition so base and delta generations tokenize
    * identically. */
  private[graft] def tokenized(docs: DataFrame, textCol: String,
      keyCol: String): DataFrame =
    docs.select(col(keyCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("tk"))

  /** One generation's postings rows `(doc_id, dl, term, tf,
    * term_bucket)` from a [[tokenized]] frame — the shared derivation
    * for the base writer and every streamed delta, so a delta batch's
    * rows are bit-identical to what a full rebuild would produce for
    * those documents (tf and dl are per-document quantities; a
    * document lives entirely inside its generation). */
  private[graft] def postingsFromTok(tok: DataFrame,
      buckets: Int): DataFrame =
    tok
      .select(col("doc_id"), size(col("tk")).cast("double").as("dl"),
        explode(col("tk")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .withColumn("term_bucket", termBucket(col("term"), buckets))

  /** One generation's integral stats `(n, sdl)` = (docs INCLUDING
    * zero-token ones, Σ document length) from a [[tokenized]] frame —
    * exactly combinable across generations. */
  private[graft] def genStatsFromTok(tok: DataFrame): DataFrame =
    tok.agg(count(lit(1)).as("n"),
      coalesce(sum(size(col("tk")).cast("long")), lit(0L)).as("sdl"))

  /** Build the BM25 inverted index **at rest** — the "write once,
    * probe cheap" twin every ANN family already has
    * ([[PartitionedAnn]]), closing the one pipeline family that paid
    * its postings build per query batch (measured as the highest
    * decade-2 scaling exponent in SCALE.md: the per-batch build is
    * corpus-sized regardless of the query).
    *
    * Layout:
    * {{{
    *   outDir/postings/term_bucket=N/…  (term, doc_id, dl, tf)
    *   outDir/stats/…                   (n_docs, avgdl) — one row
    *   outDir/_SUCCESS                  completeness marker
    * }}}
    * Postings carry the document length so scoring never rejoins the
    * corpus; per-term document frequency is NOT materialized because
    * a term's postings live in exactly one bucket — a probe recounts
    * df from the rows it already read, by construction the same
    * number the full corpus would give. `stats` is computed over the
    * tokenized corpus INCLUDING zero-token documents (n_docs/avgdl
    * parity with the inline path).
    *
    * 100 TB shape: one tokenize scan (eager-checkpointed — the
    * postings and stats writes are separate ACTIONS, so exchange
    * reuse cannot dedupe them), one term_bucket-keyed shuffle
    * clustering the write so each bucket lands as one file run. A
    * probe then reads `|query-term buckets| / buckets` of the index
    * bytes at file-listing time. */
  def writeBm25Index(docs: DataFrame, textCol: String, keyCol: String,
      outDir: String, buckets: Int = 64): Unit = {
    require(buckets >= 1 && buckets <= 4096,
      s"writeBm25Index: 1..4096 term buckets, got $buckets")
    val tk = tokenized(docs, textCol, keyCol).localCheckpoint()
    LayoutWrite.salted(postingsFromTok(tk, buckets), "term_bucket",
        col("doc_id"))
      .write.mode("overwrite").partitionBy("term_bucket")
      .parquet(s"$outDir/postings")
    // n/sdl are the INTEGRAL generation stats the incremental tier
    // ([[graft.streaming.Bm25Stream]]) combines exactly across
    // base + deltas: n_docs = Σn and avgdl = Σsdl/Σn reproduce the
    // inline avg() bit-for-bit (integer-valued double sums < 2^53
    // are exact, so accumulation order cannot perturb them)
    genStatsFromTok(tk)
      .select(col("n").cast("double").as("n_docs"),
        // n = 0 (empty corpus) would make avgdl 0/0 = NaN; probes
        // over an empty index return no rows regardless, so pin 0.0
        // rather than letting NaN sit in the stats file
        when(col("n") > 0, col("sdl").cast("double") / col("n"))
          .otherwise(lit(0.0)).as("avgdl"),
        col("n"), col("sdl"))
      .write.mode("overwrite").parquet(s"$outDir/stats")
    // (doc_id, dl) registry — the tiny per-generation document list
    // the incremental tier's supersede bookkeeping scans to detect
    // re-crawled doc_ids ([[graft.streaming.Bm25Stream]])
    tk.select(col("doc_id"), size(col("tk")).cast("long").as("dl"))
      .write.mode("overwrite").parquet(s"$outDir/docs")
    new java.io.File(outDir, "_SUCCESS").createNewFile(): Unit
  }

  /** [[bm25TopK]] against a [[writeBm25Index]] layout: the query
    * batch's distinct term buckets become a literal
    * `term_bucket IN (…)` partition filter (pruned at file-listing
    * time, before a task launches — PlanSpec pins the
    * PartitionFilters shape), non-query terms sharing those buckets
    * drop via the broadcast vocabulary join, df is recounted from the
    * probed rows, and the [[scoreTail]] arithmetic is shared code —
    * so the result is bit-identical to the inline path and the gate
    * replays the SAME oracle SQL (the dd_semantic_at_rest
    * lossless-layout proof pattern).
    *
    * The only `.collect()` is the probe set — bounded by the query
    * batch's distinct terms, the same small-query-side contract every
    * partitioned ANN probe relies on. */
  def bm25TopKAtRest(spark: SparkSession, indexDir: String,
      queries: DataFrame, qKeyCol: String, qTextCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75, buckets: Int = 64): DataFrame =
    bm25TopKFrames(spark.read.parquet(s"$indexDir/postings"),
      spark.read.parquet(s"$indexDir/stats")
        .select(col("n_docs"), col("avgdl")),
      queries, qKeyCol, qTextCol, k, k1, b, buckets)

  /** The probe body over EXPLICIT layout frames — shared by
    * [[bm25TopKAtRest]] (single base) and
    * [[graft.streaming.Bm25Stream]] (base ∪ streamed deltas): the
    * probe-set filter is applied to the `postings` frame as given, so
    * when it is a union the literal `term_bucket IN (…)` pushes into
    * EVERY underlying scan (base and each delta prune independently —
    * the same both-sides pruning ann_ivf_incremental pins).
    * `stats` must be one `(n_docs, avgdl)` row. */
  def bm25TopKFrames(postings: DataFrame, stats: DataFrame,
      queries: DataFrame, qKeyCol: String, qTextCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75, buckets: Int = 64): DataFrame = {
    val qterms = queries
      .select(col(qKeyCol).as("q_id"),
        explode(array_distinct(TextAnalysis.tokens(col(qTextCol))))
          .as("term"))
      .localCheckpoint() // probe set, vocab restriction, scoring
    val probed = qterms
      .select(termBucket(col("term"), buckets).as("tb"))
      .distinct().collect().map(_.getInt(0)).sorted
    val vocab = broadcast(qterms.select(col("term")).distinct())
    // deliberately NOT checkpointed: both consumers (df recount and
    // scoring) re-read the PRUNED scan — query-vocabulary buckets
    // only, tiny by construction — which keeps the whole probe plan
    // declarative (PlanSpec pins the PartitionFilters on this very
    // frame's lineage; a checkpoint would hide them behind blocks)
    val post = postings
      .filter(col("term_bucket").isin(probed.toIndexedSeq: _*))
      .join(vocab, Seq("term"))
    val dfs = post.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    scoreTail(post, qterms, dfs, stats, k, k1, b)
  }

  private def r6(c: Column): Column = Similarity.r6(c)

  /** Reciprocal-rank fusion (Cormack et al. 2009) of two ranked lists
    * `(q_id, rank, doc_id)`: `rrf(d) = Σ_lists 1/(kk + rank_l(d))`,
    * the standard score-free way to combine lexical ([[bm25TopK]]) and
    * embedding ([[Similarity]] ANN) retrieval into one hybrid list —
    * rank positions only, so the two scorers' incomparable score
    * scales never meet.
    *
    * Each doc appears at most once per list, so the fusion is a full
    * outer join + one fixed-order two-term sum — no aggregation, hence
    * nothing order-sensitive. Inputs are per-query top-N lists (tiny
    * by construction); the fusion costs nothing next to producing
    * them, and at scale inherits the input operators' plans. */
  def rrfFuse(a: DataFrame, b: DataFrame, kk: Int, k: Int): DataFrame = {
    def d(x: Double): Column = lit(x).cast("double")
    val left = a.select(col("q_id"), col("doc_id"),
      col("rank").as("rank_a"))
    val right = b.select(col("q_id"), col("doc_id"),
      col("rank").as("rank_b"))
    left.join(right, Seq("q_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(d(1.0) / (lit(kk) + col("rank_a")), d(0.0)) +
          coalesce(d(1.0) / (lit(kk) + col("rank_b")), d(0.0)))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("rrf").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("doc_id"),
        r6(col("rrf")).as("rrf"))
  }
}
