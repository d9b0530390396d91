package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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
    val dec = DecimalType(28, 15)
    def d(x: Double): Column = lit(x).cast("double")
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
