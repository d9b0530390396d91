package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Multinomial Naive Bayes text classification — the fastText-shaped
  * quality/domain classifier every large curation pipeline trains on
  * weak labels and applies corpus-wide (the CCNet pattern: score each
  * document against per-class token distributions, route or filter on
  * the result).
  *
  * Scale shape: training is ONE grouped count over the exploded train
  * tokens (model-sized output: vocab × classes); applying is a
  * map-side join of the token stream against the broadcast model grid
  * plus one doc-keyed partial-sum aggregation — no shuffle grows with
  * the corpus beyond the token count.
  *
  * Determinism (oracle-replay contract): every log value is
  * quantized to a 6-dp decimal at birth (see [[Classify.dlog]]), so
  * per-document score sums are exact decimal arithmetic —
  * partition-order-invariant — and the argmax tie-breaks on the
  * class label. */
object Classify {

  /** Quantize a log value for cross-engine exactness: cast the bare
    * double to DECIMAL(20,10), then ROUND to 6 dp — the exact
    * contract the model-grid gate verifies hash-identical across
    * engines. Apply-time sums therefore run exact decimal arithmetic
    * over inputs both engines provably share; the engines' ln() may
    * still disagree in the last ulp, but any disagreement that
    * survives this quantization shows up in the MODEL gate, never as
    * an apply-only divergence. (History: a raw scale-10 cast here let
    * a 1e-10 ln() delta propagate through the apply-time sum onto a
    * 6-dp rounding midpoint — one row in 100 at sf0.01 flipped; a
    * scale-12 cast and a 10→8 double-round were earlier failures,
    * both caught by the sf1 gate.) */
  private[graft] def dlog(c: Column): Column =
    round(c.cast(DecimalType(20, 10)), 6).cast(DecimalType(20, 6))

  /** The model's ADDITIVE sufficient statistics: per-(class, token)
    * occurrence counts, `(label, token, cnt)`. Two batches' counts
    * sum cell-wise into the union's counts — which is what lets
    * [[graft.streaming.NbStream]] maintain the classifier
    * incrementally with the grid derived, not stored. */
  def tokenCounts(train: DataFrame, textCol: String,
      labelCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(train.sparkSession)
    // per-doc counts from the scan-local kernel, summed per class:
    // identical cell values to the old explode-every-instance →
    // count(*) form (doc-local counts are a partition of the class's
    // instances), but the Generate emits each doc's DISTINCT tokens
    // and the exchange carries pre-counted rows (guide §2.3). No
    // spread here (unlike [[charGramCounts]]): the word kernel's
    // per-byte work is on the order of the text hash a keyed
    // repartition would itself pay, so the exchange never pays for
    // itself (measured: pp_nb_model 0.55 -> ~1.0 s with the spread)
    train.select(col(labelCol).as("label"),
        explode(graft.functions.GraftFunctions.word_gram_counts(
          col(textCol), 1)).as(Seq("token", "cnt")))
      .groupBy(col("label"), col("token"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** The priors' additive sufficient statistics:
    * `(label, n_docs)`. */
  def docCounts(train: DataFrame, labelCol: String): DataFrame =
    train.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"))

  /** Laplace-smoothed log-likelihood grid from `(label, token, cnt)`
    * sufficient statistics: one row for EVERY (class, vocab token)
    * pair — including tokens unseen in a class, whose smoothed mass
    * `ln(1/(n_tok_c + V))` is exactly what an absent join row must
    * contribute at apply time (a sparse model would silently drop
    * it). Class token totals and the vocab both derive from the
    * counts themselves, so a model built from folded streamed counts
    * is bit-identical to retraining on the union. Output:
    * (label, token, loglik DECIMAL(20,6)).
    *
    * The grid comes back already SIZE-GATED
    * ([[TextAnalysis.gateBySize]]): it is |vocab| × |labels| rows,
    * and the vocabulary grows with the corpus — on 100 TB web text
    * (typos, URLs, numbers) that is 10⁸-10⁹ distinct tokens, far
    * past any broadcast ceiling, where a forced `broadcast()` hint
    * fails the job instead of degrading to a shuffle join. The hint
    * is measured ONCE here, at derivation, on the checkpointed
    * counts (one combined agg job): |grid| = |vocab|·|labels| ≤
    * |counts|·|labels| — an upper bound, which can only decline a
    * broadcast that would have fit, never force one that doesn't.
    * The checkpoint also stops the four grid inputs (totals, vocab,
    * v_size, join) from each replaying the counts lineage — for the
    * [[graft.streaming.NbStream]] path that lineage is the full
    * partials fold. */
  def nbModelFromCounts(counts: DataFrame): DataFrame = {
    // the MEASURING form, for counts built inline from a corpus scan:
    // the checkpoint stops the four grid inputs from each replaying
    // the corpus tokenization, and the hint is one combined agg job
    // on the checkpointed (model-sized) table. Stores skip all of
    // this via [[nbModelFromCountsHinted]] with their stamped hint.
    val cc = counts.localCheckpoint()
    val m = cc.agg(count(lit(1)), countDistinct(col("label"))).head()
    nbModelFromCountsHinted(cc,
      m.getLong(0) * math.max(m.getLong(1), 1L))
  }

  /** [[nbModelFromCounts]] with the grid-size hint supplied by the
    * caller (a store's stamped params — see
    * [[graft.streaming.NbStream]]): no checkpoint, no driver jobs —
    * the at-rest read path derives the grid with exactly the
    * pre-hint plan plus the broadcast gate. */
  def nbModelFromCountsHinted(counts: DataFrame,
      gridHint: Long): DataFrame = {
    val classTotals = counts.groupBy(col("label"))
      .agg(sum(col("cnt")).as("n_tok"))
    val vocab = counts.select(col("token")).distinct()
    val vSize = vocab.agg(count(lit(1)).as("v_size"))
    val grid = vocab.crossJoin(broadcast(classTotals))
      .crossJoin(broadcast(vSize))
      .join(counts, Seq("label", "token"), "left_outer")
      .select(col("label"), col("token"),
        dlog(log((coalesce(col("cnt"), lit(0L)) + lit(1L))
          .cast("double") /
          (col("n_tok") + col("v_size")).cast("double"))).as("loglik"))
    TextAnalysis.gateBySize(grid, gridHint)
  }

  /** Log class priors from `(label, n_docs)` sufficient statistics:
    * (label, logprior DECIMAL(20,6)). */
  def nbPriorsFromCounts(perClass: DataFrame): DataFrame =
    perClass.crossJoin(broadcast(
      perClass.agg(sum(col("n_docs")).as("n_total"))))
      .select(col("label"),
        dlog(log(col("n_docs").cast("double") /
          col("n_total").cast("double"))).as("logprior"))

  /** One-shot training: [[tokenCounts]] → [[nbModelFromCounts]]. */
  def nbModel(train: DataFrame, textCol: String,
      labelCol: String): DataFrame =
    nbModelFromCounts(tokenCounts(train, textCol, labelCol))

  /** One-shot priors: [[docCounts]] → [[nbPriorsFromCounts]]. */
  def nbPriors(train: DataFrame, labelCol: String): DataFrame =
    nbPriorsFromCounts(docCounts(train, labelCol))

  /** Classify `test` documents against a trained (model, priors)
    * pair: `score(c) = logprior(c) + Σ_tok cnt(tok)·loglik(tok, c)`,
    * out-of-vocabulary tokens dropped (they carry no evidence about
    * any class), prediction = argmax with ties broken on the label.
    * Documents whose tokens are ALL OOV still score (priors only) —
    * the report never silently loses a row. Output:
    * (key, label_pred, score) with the 6-dp rounded winning score. */
  def nbApply(test: DataFrame, model: DataFrame, priors: DataFrame,
      textCol: String, keyCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(test.sparkSession)
    nbApplyCounts(test, model, priors,
      c => graft.functions.GraftFunctions.word_gram_counts(c, 1),
      textCol, keyCol)
  }

  /** fastText-style character n-gram features of lowercased text —
    * the language-ID feature family (character statistics separate
    * scripts and orthographies where word features fragment). Raw
    * sliding grams including spaces; text shorter than `n` has no
    * feature (scores on priors alone, the OOV discipline). */
  def charGrams(c: Column, n: Int): Column = {
    val lc = lower(c)
    when(length(lc) >= n,
      transform(sequence(lit(1), length(lc) - lit(n - 1)),
        i => lc.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))
  }

  /** [[tokenCounts]] over char n-gram features: the additive
    * sufficient statistics of the trained language-ID router. */
  def charGramCounts(train: DataFrame, textCol: String,
      labelCol: String, n: Int): DataFrame = {
    graft.functions.GraftFunctions.register(train.sparkSession)
    // same kernel move as [[tokenCounts]]: identical cell values, the
    // Generate shrunk to distinct-grams-per-doc, pre-counted rows into
    // the class-grouping exchange
    // char grams are ~len(text) map operations per doc — heavy
    // enough that spreading few-split inputs over the cores pays for
    // the text shuffle (no doc key in scope; the text itself is the
    // high-cardinality key). No-op on any real sharded corpus.
    TextAnalysis.spreadByKey(train, col(textCol))
      .select(col(labelCol).as("label"),
        explode(graft.functions.GraftFunctions.char_gram_counts(
          col(textCol), n)).as(Seq("token", "cnt")))
      .groupBy(col("label"), col("token"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** [[nbApply]] over an arbitrary PER-DOC COUNTS extractor
    * (`map<token, cnt>` per document — [[CharGramCounts]] /
    * [[WordGramCounts]] kernels): the per-doc occurrence counting
    * happens inside the scan, so the `(key, token)` aggregation
    * exchange of the old array-explode form disappears from the apply
    * plan entirely. Scoring, argmax, and determinism contract
    * unchanged — the occ rows carry identical values. */
  def nbApplyCounts(test: DataFrame, model: DataFrame,
      priors: DataFrame, counts: Column => Column,
      textCol: String, keyCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(test.sparkSession)
    val occ = TextAnalysis.spreadByKey(test, col(keyCol))
      .select(col(keyCol).as("key"),
        explode(counts(col(textCol))).as(Seq("token", "cnt")))
    nbScoreOcc(test, occ, model, priors, keyCol)
  }

  /** [[nbApply]] over an arbitrary feature extractor (word tokens,
    * char n-grams, …) — same scoring, argmax, and determinism
    * contract. Kept as the relational reference form the kernel-based
    * [[nbApplyCounts]] is spec-pinned against. */
  def nbApplyFeatures(test: DataFrame, model: DataFrame,
      priors: DataFrame, features: Column => Column,
      textCol: String, keyCol: String): DataFrame = {
    val occ = test.select(col(keyCol).as("key"),
      explode(features(col(textCol))).as("token"))
      .groupBy(col("key"), col("token"))
      .agg(count(lit(1)).as("cnt"))
    nbScoreOcc(test, occ, model, priors, keyCol)
  }

  /** Shared scoring tail: evidence join + per-doc per-class decimal
    * sums + priors + argmax over `(key, token, cnt)` occurrence
    * rows. */
  private def nbScoreOcc(test: DataFrame, occ: DataFrame,
      model: DataFrame, priors: DataFrame,
      keyCol: String): DataFrame = {
    // cnt cast to DECIMAL(10,0) keeps the product inside both
    // engines' 38-digit decimal cap — a BIGINT operand would
    // silently overflow DuckDB's multiply to DOUBLE and make the
    // score sums inexact (caught by the sf1 gate).
    // The model grid arrives PRE-GATED by [[nbModelFromCounts]]
    // (vocab × labels rows — corpus-vocabulary-sized, the round-16
    // verdict's forced-broadcast scale-killer class): no forced
    // hint here, so an over-ceiling vocabulary degrades to a
    // shuffle join instead of failing the job
    val evidence = occ.join(model, Seq("token"))
      .groupBy(col("key"), col("label"))
      .agg(sum(col("loglik") *
        col("cnt").cast(DecimalType(10, 0))).as("ev"))
    // priors stay a forced broadcast: per-LABEL rows, bounded by the
    // classifier's fixed label set — a genuine model-sized constant,
    // not a corpus-growing relation
    val scored = test.select(col(keyCol).as("key"))
      .crossJoin(broadcast(priors))
      .join(evidence, Seq("key", "label"), "left_outer")
      .select(col("key"), col("label"),
        (col("logprior") + coalesce(col("ev"),
          lit(0).cast(DecimalType(20, 6)))).as("score"))
    // argmax as max(struct(score, label)): exact-score ties resolve
    // to the alphabetically LAST label — a fixed total order, no
    // window pass needed
    val best = scored.groupBy(col("key"))
      .agg(max(struct(col("score"), col("label"))).as("b"))
    best.select(col("key"), col("b.label").as("label_pred"),
      round(col("b.score").cast(DecimalType(28, 10)), 6)
        .cast("double").as("score"))
  }
}
