package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `Array[Float]` column.
  *
  * The dot product is a sequential `aggregate` fold over
  * `zip_with` — a pure Catalyst higher-order function (no UDF, no
  * explode), deterministic in accumulation order, which keeps results
  * bit-identical across partitionings and engines.
  *
  * Two search paths:
  *  - [[bruteForceTopK]]: exact — corpus × queries join. Right when the
  *    query set is small (broadcast queries, stream the corpus: one
  *    pass, no shuffle of the corpus side).
  *  - [[lshTopK]]: sign-random-projection LSH — corpus is bucketed by
  *    the sign pattern of `planes` fixed pseudo-random hyperplanes and
  *    only same-bucket candidates are scored. The bucket id is a
  *    deterministic function of the vector, so the bucketing is a plain
  *    repartitionable column: at 100 TB the corpus is written
  *    partitioned by bucket once and every query probes one partition
  *    (multi-probe = enumerate neighbor buckets).
  */
object Similarity {

  /** Cast float array to double (element-exact). */
  private def dbl(c: Column): Column = transform(c, _.cast("double"))

  /** Higher-order-function formulation — kept as the dependency-free
    * reference implementation; the operators below use the codegen'd
    * [[graft.functions.VecDot]]/[[graft.functions.VecNorm]] kernels,
    * which compute the identical left-to-right double accumulation
    * (FunctionsSpec pins the equivalence) without per-element lambda
    * interpretation. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(dbl(a), dbl(b), _ * _), lit(0.0), _ + _)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(dbl(a), x => x * x), lit(0.0), _ + _))

  private def nativeDot(df: DataFrame)(a: Column, b: Column): Column = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    graft.functions.GraftFunctions.vec_dot(a, b)
  }

  /** Decimal-routed rounding (see StarQueries.roundd). */
  private[pipeline] def r3(c: Column): Column =
    round(c.cast(org.apache.spark.sql.types.DecimalType(28, 10)), 3)
      .cast("double")

  /** 6-decimal variant for scores that live near zero (RRF terms,
    * PageRank mass) — three decimals would flatten them. */
  private[pipeline] def r6(c: Column): Column =
    round(c.cast(org.apache.spark.sql.types.DecimalType(28, 10)), 6)
      .cast("double")

  private def nativeNorm(df: DataFrame)(a: Column): Column = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    graft.functions.GraftFunctions.vec_norm(a)
  }

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Deterministic pseudo-random hyperplanes: `planes` × `dim`
    * coefficients from a fixed-seed generator. */
  def hyperplanes(planes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(planes, dim)(rnd.nextGaussian())
  }

  /** Sign-pattern LSH bucket id of an embedding column: bit i = sign of
    * dot(v, plane_i). */
  def srpBucket(v: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.toIndexedSeq.map(lit): _*)
      when(aggregate(zip_with(dbl(v), planeCol, _ * _), lit(0.0), _ + _)
        >= 0, 1L << i).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Exact top-k cosine neighbors per query. Queries broadcast; corpus
    * streamed once. Ties break on corpus key for determinism. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, vecCol: String,
      keyCol: String, k: Int): DataFrame = {
    val nd = nativeDot(corpus) _
    val nn = nativeNorm(corpus) _
    val q = broadcast(queries.select(col(keyCol).as("q_id"),
      col(vecCol).as("q_vec"), nn(col(vecCol)).as("q_norm")))
    val c = corpus.select(col(keyCol).as("c_id"), col(vecCol).as("c_vec"),
      nn(col(vecCol)).as("c_norm"))
    val scored = q.crossJoin(c)
      .withColumn("cos",
        nd(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("c_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id"),
        r3(col("cos")).as("cos"))
  }

  /** Contrastive triplet mining — the training-data op for embedding
    * models: per anchor, one POSITIVE (its most-similar same-cluster
    * neighbor at or above `posT` — a near-dup) and one HARD NEGATIVE
    * (its most-similar same-cluster neighbor strictly below `negT` —
    * same region of space, provably not a duplicate: the negatives
    * that actually teach a margin, unlike random ones). Anchors with
    * no qualifying positive or negative drop out.
    *
    * Candidate generation is the SemDeDup shape: one broadcast
    * [[ivfAssign]] pass, then pairing strictly WITHIN clusters — at
    * scale the anchor relation is a shard of the corpus and each
    * shard mines against its own clusters, so nothing all-pairs ever
    * materializes. Ranking ties break on ascending candidate id;
    * output cosines are r3-rounded AFTER ranking. */
  def contrastiveTriplets(anchors: DataFrame, corpus: DataFrame,
      vecCol: String, keyCol: String, centroids: DataFrame,
      posT: Double, negT: Double): DataFrame = {
    val nd = nativeDot(corpus) _
    val a = ivfAssign(anchors, vecCol, keyCol, centroids)
      .select(col("cent_id"), col("c_id").as("a_id"),
        col("c_vec").as("a_vec"), col("c_norm").as("a_norm"))
    val c = ivfAssign(corpus, vecCol, keyCol, centroids)
      .select(col("cent_id"), col("c_id").as("b_id"),
        col("c_vec").as("b_vec"), col("c_norm").as("b_norm"))
    tripletPick(broadcast(a).join(c, Seq("cent_id"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("cos",
        nd(col("a_vec"), col("b_vec")) / (col("a_norm") * col("b_norm")))
      .select(col("a_id"), col("b_id"), col("cos")), posT, negT)
  }

  /** [[contrastiveTriplets]] against a [[PartitionedAnn
    * .writeIvfPartitioned]] layout — the at-rest twin: corpus
    * assignment is already materialized in the `cent_id=` directories
    * with norms precomputed, so mining reads ONLY the anchors' probed
    * partitions instead of re-assigning the whole corpus (the inline
    * form's O(n·√n) rebuild — measured 68 s vs 5 s at sf10). Same
    * semantics, same oracle. */
  def contrastiveTripletsAtRest(spark: org.apache.spark.sql.SparkSession,
      corpusDir: String, anchors: DataFrame, vecCol: String,
      keyCol: String, centroids: DataFrame, posT: Double,
      negT: Double): DataFrame = {
    val nd = nativeDot(anchors) _
    val a = ivfAssign(anchors, vecCol, keyCol, centroids)
      .withColumn("cent_id", col("cent_id").cast("int"))
      .select(col("cent_id"), col("c_id").as("a_id"),
        col("c_vec").as("a_vec"), col("c_norm").as("a_norm"))
      .localCheckpoint() // probe-set collect AND the join
    val probed = a.select(col("cent_id")).distinct()
      .collect().map(_.getInt(0)).sorted
    val c = spark.read.parquet(corpusDir)
      .filter(col("cent_id").isin(probed.toIndexedSeq: _*))
      .select(col("cent_id"), col("c_id").as("b_id"),
        col("c_vec").as("b_vec"), col("c_norm").as("b_norm"))
    tripletPick(broadcast(a).join(c, Seq("cent_id"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("cos",
        nd(col("a_vec"), col("b_vec")) / (col("a_norm") * col("b_norm")))
      .select(col("a_id"), col("b_id"), col("cos")), posT, negT)
  }

  /** Shared pick tail: hardest positive (≥ posT) and hardest negative
    * (< negT) per anchor over a scored pair relation. */
  private def tripletPick(scored: DataFrame, posT: Double,
      negT: Double): DataFrame = {
    val pairs = scored.localCheckpoint() // both ranks consume it
    def top1(cands: DataFrame): DataFrame = cands
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("a_id"))
          .orderBy(col("cos").desc, col("b_id"))))
      .filter(col("rk") === 1).drop("rk")
    val pos = top1(pairs.filter(col("cos") >= posT))
      .select(col("a_id"), col("b_id").as("positive"),
        col("cos").as("pos_cos"))
    val neg = top1(pairs.filter(col("cos") < negT))
      .select(col("a_id"), col("b_id").as("negative"),
        col("cos").as("neg_cos"))
    pos.join(neg, Seq("a_id"))
      .select(col("a_id").as("anchor"), col("positive"),
        r3(col("pos_cos")).as("pos_cos"), col("negative"),
        r3(col("neg_cos")).as("neg_cos"))
  }

  /** 1-bit (sign) binarization + Hamming top-k — the far end of the
    * quantization spectrum (float32 → int8 → PQ → binary): each
    * 32-dim block packs into one little-endian word (bit i = sign of
    * component i), a 64-dim vector becomes 8 BYTES at rest, and
    * scoring is `Σ_w bit_count(xor(q_w, c_w))` — pure integer
    * codegen, no float read anywhere. Smallest Hamming first, ties
    * on ascending corpus key.
    *
    * The oracle deliberately replays the SEMANTICS from the raw
    * vectors — per-pair count of sign disagreements — rather than
    * the packed arithmetic, so the hash match proves the packing +
    * popcount path computes exactly the definition. Plan shape is
    * the [[bruteForceTopK]] template: packing scan-local on both
    * sides, query batch broadcast, corpus streamed once. */
  def binaryTopK(queries: DataFrame, corpus: DataFrame, vecCol: String,
      keyCol: String, k: Int, dim: Int): DataFrame = {
    require(dim > 0 && dim % 32 == 0,
      s"binaryTopK: dim=$dim must be a positive multiple of 32")
    val nWords = dim / 32
    val q = broadcast(queries.select(col(keyCol).as("q_id"),
      packWords(col(vecCol), dim).as("q_bits")))
    val c = corpus.select(col(keyCol).as("c_id"),
      packWords(col(vecCol), dim).as("c_bits"))
    q.crossJoin(c)
      .withColumn("hamming",
        hammingCol(col("q_bits"), col("c_bits"), nWords))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("hamming"), col("c_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id"), col("hamming"))
  }

  /** The sign-bit word packing shared by [[binaryTopK]] and the
    * partitioned-at-rest form
    * ([[PartitionedAnn.writeBinaryPartitioned]]): little-endian,
    * bit i of word w = sign of component w·32+i. */
  private[pipeline] def packWords(v: Column, dim: Int): Column =
    array((0 until dim / 32).map { w =>
      (0 until 32).map(i =>
        when(element_at(v, w * 32 + i + 1) >= 0f, lit(1L << i))
          .otherwise(lit(0L))).reduce(_ + _)
    }: _*)

  /** Hamming distance over two packed-word arrays (xor-popcount). */
  private[pipeline] def hammingCol(qBits: Column, cBits: Column,
      nWords: Int): Column =
    (0 until nWords).map(i =>
      bit_count(element_at(qBits, i + 1)
        .bitwiseXOR(element_at(cBits, i + 1))).cast("long"))
      .reduce(_ + _)

  /** Matryoshka truncation evaluation (Kusupati et al. 2022) — the
    * embedding-ops eval behind the "how many dims do we store?"
    * decision: recall@k of PREFIX-dimension search against the
    * full-dimension ranking, per candidate width. Each truncated
    * search is a [[bruteForceTopK]] over `slice(vec, 1, d)` (the
    * query batch broadcast, corpus streamed — the eval inherits the
    * ANN tier's plan); the recall join is per-query-k-sized. At
    * scale this is the experiment a team runs ONCE before writing
    * the at-rest layout at the chosen width — 2× fewer dims is 2×
    * less page IO for every probe forever after.
    *
    * Output `(dim, n_hits, n_total, recall)`: exact integer overlap
    * counts and their ratio (one double division — engine-portable),
    * ordered by dim. */
  def truncationRecall(queries: DataFrame, corpus: DataFrame,
      vecCol: String, keyCol: String, k: Int,
      dims: Seq[Int]): DataFrame = {
    require(dims.nonEmpty, "truncationRecall: no dims to evaluate")
    val full = bruteForceTopK(queries, corpus, vecCol, keyCol, k)
      .select(col("q_id"), col("c_id"))
    val truncated = dims.map { d =>
      bruteForceTopK(
        queries.withColumn(vecCol, slice(col(vecCol), 1, d)),
        corpus.withColumn(vecCol, slice(col(vecCol), 1, d)),
        vecCol, keyCol, k)
        .select(lit(d).as("dim"), col("q_id"), col("c_id"))
    }.reduce(_.unionByName(_))
    truncated
      .join(full.withColumn("hit", lit(1L)), Seq("q_id", "c_id"),
        "left_outer")
      .groupBy(col("dim"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"),
        count(lit(1)).as("n_total"))
      .withColumn("recall",
        r3(col("n_hits").cast("double") / col("n_total")))
      .orderBy(col("dim"))
  }

  /** kNN-classifier evaluation — the standard embedding-quality
    * harness: classify each labeled query vector by majority vote
    * over its k nearest labeled corpus vectors and report the
    * confusion matrix. A falling kNN accuracy is the canonical canary
    * for a degraded embedding model or a corrupted index.
    *
    * `topk` is any `(q_id, rank, c_id, …)` neighbor list — plug in
    * [[bruteForceTopK]] for the exact eval or any ANN variant to
    * measure THE INDEX's end-to-end quality (index error then shows
    * up as accuracy loss, which is the number a deployment actually
    * cares about). Votes tie-break on (count desc, best rank asc,
    * label asc) — fully deterministic. Output one row per observed
    * `(true_label, pred_label)` pair with its count; accuracy is the
    * diagonal mass over the total, computable downstream.
    *
    * Scale shape: the neighbor list is queries×k rows; everything
    * after it is keyed on q_id — broadcast-scale joins against the
    * label side of the corpus (labels project out of the same at-rest
    * relation the index reads). */
  def knnConfusion(topk: DataFrame, queryLabels: DataFrame,
      corpusLabels: DataFrame, labelCol: String,
      keyCol: String): DataFrame = {
    val cl = corpusLabels.select(col(keyCol).as("c_id"),
      col(labelCol).as("vote"))
    val ql = queryLabels.select(col(keyCol).as("q_id"),
      col(labelCol).as("true_label"))
    val votes = topk.join(cl, Seq("c_id"))
      .groupBy(col("q_id"), col("vote"))
      .agg(count(lit(1)).as("n_votes"), min(col("rank")).as("best"))
    val pred = votes
      .withColumn("vrank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("n_votes").desc, col("best"), col("vote"))))
      .filter(col("vrank") === 1)
      .select(col("q_id"), col("vote").as("pred_label"))
    pred.join(ql, Seq("q_id"))
      .groupBy(col("true_label"), col("pred_label"))
      .agg(count(lit(1)).as("n"))
  }

  /** Approximate top-k: score only corpus vectors sharing the query's
    * SRP bucket. Recall is tunable via plane count (fewer planes →
    * bigger buckets → higher recall, more compute). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, vecCol: String,
      keyCol: String, k: Int, planes: Int = 4, dim: Int = 64): DataFrame = {
    // a dim mismatch would null the plane dot products and collapse
    // every vector into one bucket (a silent full cross join) — fail
    // fast instead; one tiny job against the corpus head
    val probe = corpus.filter(col(vecCol).isNotNull)
      .select(size(col(vecCol)).as("sz")).limit(1).collect()
    require(probe.nonEmpty,
      s"lshTopK: corpus has no non-null '$vecCol' vectors to probe")
    val actualDim = probe(0).getInt(0)
    require(actualDim == dim,
      s"lshTopK dim=$dim but corpus vectors have length $actualDim")
    val hp = hyperplanes(planes, dim)
    val nd = nativeDot(corpus) _
    val nn = nativeNorm(corpus) _
    val q = broadcast(queries.select(col(keyCol).as("q_id"),
      col(vecCol).as("q_vec"), nn(col(vecCol)).as("q_norm"),
      srpBucket(col(vecCol), hp).as("bucket")))
    val c = corpus.select(col(keyCol).as("c_id"), col(vecCol).as("c_vec"),
      nn(col(vecCol)).as("c_norm"),
      srpBucket(col(vecCol), hp).as("bucket"))
    q.join(c, Seq("bucket"))
      .withColumn("cos",
        nd(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("c_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id"),
        r3(col("cos")).as("cos"))
  }

  /** Multi-probe LSH top-k: like [[lshTopK]], but each query also
    * probes every bucket at Hamming distance 1 from its own (one sign
    * flip per hyperplane) — the standard recall knob that avoids
    * shrinking the plane count (and so avoids growing every bucket)
    * when near-boundary vectors land one bit apart. The query side
    * explodes into `planes + 1` probe rows (queries are the small
    * side — the corpus is still touched once per matching bucket via
    * the same equi-join, so the scale shape is unchanged); ranking
    * dedups nothing because probe buckets are distinct by
    * construction. Output schema matches [[bruteForceTopK]]. */
  def lshTopKMultiProbe(queries: DataFrame, corpus: DataFrame,
      vecCol: String, keyCol: String, k: Int, planes: Int = 2,
      dim: Int = 64): DataFrame = {
    val probe = corpus.filter(col(vecCol).isNotNull)
      .select(size(col(vecCol)).as("sz")).limit(1).collect()
    require(probe.nonEmpty,
      s"lshTopKMultiProbe: corpus has no non-null '$vecCol' vectors")
    require(probe(0).getInt(0) == dim,
      s"lshTopKMultiProbe dim=$dim but corpus vectors have length " +
        s"${probe(0).getInt(0)}")
    val hp = hyperplanes(planes, dim)
    val nd = nativeDot(corpus) _
    val nn = nativeNorm(corpus) _
    val probeBuckets = array((col("bucket") +:
      (0 until planes).map(i =>
        col("bucket").bitwiseXOR(lit(1L << i)))).toIndexedSeq: _*)
    val q = broadcast(queries.select(col(keyCol).as("q_id"),
      col(vecCol).as("q_vec"), nn(col(vecCol)).as("q_norm"),
      srpBucket(col(vecCol), hp).as("bucket"))
      .withColumn("bucket", explode(probeBuckets)))
    val c = corpus.select(col(keyCol).as("c_id"), col(vecCol).as("c_vec"),
      nn(col(vecCol)).as("c_norm"),
      srpBucket(col(vecCol), hp).as("bucket"))
    q.join(c, Seq("bucket"))
      .withColumn("cos",
        nd(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("c_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id"),
        r3(col("cos")).as("cos"))
  }

  /** IVF (inverted-file) approximate nearest neighbor: the corpus is
    * partitioned into clusters by nearest centroid, and each query
    * scores only the `nprobe` clusters whose centroids it is closest
    * to. Centroids here are a deterministic corpus subset selected by
    * `centroidPred` (at real scale they'd come from k-means; the index
    * structure — broadcast centroid table, one assignment pass over
    * the corpus, per-query cluster pruning — is identical). The
    * assignment is a single broadcast join + windowed argmax: one scan
    * of the corpus, no corpus shuffle beyond the top-k window. At
    * 100 TB the corpus is written partitioned by `cent_id` once and
    * each query reads only its probed partitions.
    *
    * Ties (equal cosine) break on ascending id everywhere, so output
    * is deterministic. Output schema matches [[bruteForceTopK]]. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, vecCol: String,
      keyCol: String, k: Int, centroidPred: Column,
      nprobe: Int): DataFrame = {
    // an empty centroid set would silently produce zero results (every
    // cluster join is empty) — fail fast instead; probe only the key
    // column so the check job scans one column and computes no norms
    require(corpus.filter(centroidPred).select(col(keyCol))
      .limit(1).collect().nonEmpty,
      "ivfTopK: centroidPred selects no corpus vectors")
    ivfTopK(queries, corpus, vecCol, keyCol, k,
      corpus.filter(centroidPred).select(col(keyCol).as("cent_id"),
        col(vecCol).as("cent_vec")), nprobe)
  }

  def ivfTopK(queries: DataFrame, corpus: DataFrame, vecCol: String,
      keyCol: String, k: Int, centroidPred: Column): DataFrame =
    ivfTopK(queries, corpus, vecCol, keyCol, k, centroidPred, nprobe = 2)

  /** Broadcast-prepared centroid table with precomputed norms. */
  private def centPrep(df: DataFrame, centroids: DataFrame): DataFrame = {
    val nn = nativeNorm(df) _
    broadcast(centroids.select(col("cent_id"), col("cent_vec"),
      nn(col("cent_vec")).as("cent_norm")))
  }

  private def centScored(df: DataFrame, cent: DataFrame, vec: String,
      nrm: String): DataFrame = {
    val nd = nativeDot(df) _
    df.crossJoin(cent)
      .withColumn("ccos",
        nd(col(vec), col("cent_vec")) / (col(nrm) * col("cent_norm")))
      // a null or NaN cosine (null embedding, or 0/0 from a
      // zero-norm vector) can rank neither here nor meaningfully
      // downstream — and NaN would sort OPPOSITE ways in the min_by
      // and row_number branches below — so drop both uniformly
      .filter(col("ccos").isNotNull && !isnan(col("ccos")))
      .drop("cent_vec", "cent_norm")
  }

  // argmax (keep=1) as a min_by aggregate: partially combines
  // map-side, so the corpus-sized assignment never shuffles the full
  // (vector × centroid) score relation the window form would sort.
  // min over (-ccos, cent_id) == row_number(ccos desc, cent_id asc)
  // for any key type (the key itself is never negated).
  private def nearestCent(df: DataFrame, cent: DataFrame, id: String,
      vec: String, nrm: String, keep: Int): DataFrame =
    if (keep == 1) {
      val payload = df.columns.filterNot(_ == id) :+ "cent_id"
      centScored(df, cent, vec, nrm)
        .groupBy(col(id))
        .agg(min_by(struct(payload.map(col).toIndexedSeq: _*),
          struct(-col("ccos"), col("cent_id"))).as("w"))
        .select((col(id) +: payload.map(c => col(s"w.$c"))).toIndexedSeq: _*)
    } else
      centScored(df, cent, vec, nrm)
        .withColumn("crk", row_number().over(
          Window.partitionBy(col(id))
            .orderBy(col("ccos").desc, col("cent_id"))))
        .filter(col("crk") <= keep)
        .drop("ccos", "crk")

  /** Corpus-wide index builds must take their parallelism from the
    * cluster, not from however few splits the source file happens to
    * offer: a single-row-group parquet export (common from
    * single-writer tools) scans as ONE task, and a 1024-dim centroid
    * assignment on one core is the difference between minutes and
    * days at scale — found live when the sf10 embeddings file (one
    * 800 MB row group) pinned the IVF build to a single core for
    * half an hour. One explicit round-robin shuffle; the bytes it
    * moves are noise against the O(n·√n) scoring it parallelizes.
    * Guarded: a source that already scans at cluster parallelism (a
    * many-split corpus — the common case at real scale) passes
    * through untouched, so the per-query rebuild paths that share
    * [[ivfAssign]] don't pay a pointless corpus shuffle. */
  private[pipeline] def buildParallel(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /** The IVF index build, exposed for partitioned-at-rest layouts
    * ([[PartitionedAnn]]): tag each corpus vector with its nearest
    * centroid. One broadcast join + map-side `min_by` argmax — the
    * corpus's score relation never shuffles (only the pre-scoring
    * [[buildParallel]] spread of the raw vectors). Returns
    * `(c_id, c_vec, c_norm, cent_id)` with the norm precomputed, so a
    * layout written from this output never recomputes norms at query
    * time. */
  def ivfAssign(corpus: DataFrame, vecCol: String, keyCol: String,
      centroids: DataFrame): DataFrame = {
    val nn = nativeNorm(corpus) _
    nearestCent(
      buildParallel(
        corpus.select(col(keyCol).as("c_id"), col(vecCol).as("c_vec"),
          nn(col(vecCol)).as("c_norm"))),
      centPrep(corpus, centroids), "c_id", "c_vec", "c_norm", keep = 1)
  }

  /** The IVF probe pass: per-query `nprobe` nearest centroids (the
    * query side is the small side — a window rank is fine here).
    * Returns `(q_id, q_vec, q_norm, cent_id)`, one row per probed
    * cluster. */
  def ivfProbe(queries: DataFrame, vecCol: String, keyCol: String,
      centroids: DataFrame, nprobe: Int): DataFrame = {
    val nn = nativeNorm(queries) _
    nearestCent(
      queries.select(col(keyCol).as("q_id"), col(vecCol).as("q_vec"),
        nn(col(vecCol)).as("q_norm")),
      centPrep(queries, centroids), "q_id", "q_vec", "q_norm",
      keep = nprobe)
  }

  /** IVF over an explicit centroid table `(cent_id, cent_vec)` — e.g.
    * the output of [[kmeansCentroids]], or any externally-built
    * codebook. The predicate overload above delegates here. Probe and
    * assignment are [[ivfProbe]]/[[ivfAssign]]; at rest the assignment
    * is written once partitioned by `cent_id` (see [[PartitionedAnn]])
    * and each query batch reads only its probed partitions. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, vecCol: String,
      keyCol: String, k: Int, centroids: DataFrame,
      nprobe: Int): DataFrame = {
    val nd = nativeDot(corpus) _
    val assigned = ivfAssign(corpus, vecCol, keyCol, centroids)
    val probed = ivfProbe(queries, vecCol, keyCol, centroids, nprobe)
    probed.join(assigned, Seq("cent_id"))
      .withColumn("cos",
        nd(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("c_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id"),
        r3(col("cos")).as("cos"))
  }

  /** Spherical-k-means centroid builder for [[ivfTopK]]: Lloyd
    * iterations with cosine assignment, so the codebook optimizes the
    * same metric the index probes with.
    *
    *  - Seeding is deterministic: the k corpus vectors with the
    *    smallest `xxhash64(key)` (a seeded hash-order sample — no RNG,
    *    reproducible across runs and partitionings).
    *  - Each iteration is one broadcast-join assignment pass (the same
    *    map-side-combinable `min_by` argmax ivfTopK uses — the corpus
    *    never shuffles its score relation) followed by an element-wise
    *    mean via `posexplode` → per-(cluster, position) partial avg:
    *    shuffle volume is O(clusters × dim) per map task, independent
    *    of corpus size.
    *  - Empty clusters drop out (the codebook may end smaller than k);
    *    degenerate zero-norm corpus vectors are excluded from
    *    assignment, mirroring ivfTopK's NaN policy.
    *  - Centroid means are computed in double and cast back to float so
    *    the resulting `(cent_id, cent_vec)` table plugs into the same
    *    `vec_dot`/`vec_norm` kernels; the quantization is harmless for
    *    an index structure (assignment, not scoring).
    *
    * Iteration count is fixed (no convergence collect): at scale each
    * pass is one corpus scan, and 5-10 Lloyd rounds are the standard
    * IVF-codebook budget. Per-iteration `localCheckpoint` truncates the
    * growing plan lineage (the iterative-loop Catalyst trap). */
  def kmeansCentroids(corpus: DataFrame, vecCol: String, keyCol: String,
      k: Int, iters: Int = 5): DataFrame = {
    require(k > 0 && iters >= 0, "kmeansCentroids: k > 0, iters >= 0")
    val nd = nativeDot(corpus) _
    val nn = nativeNorm(corpus) _
    val v = corpus
      .select(col(keyCol).as("v_id"), col(vecCol).as("v_vec"),
        nn(col(vecCol)).as("v_norm"))
      .filter(col("v_norm").isNotNull && col("v_norm") > 0)
    var cent = v
      .withColumn("h", xxhash64(col("v_id")))
      .orderBy(col("h"), col("v_id")).limit(k)
      .withColumn("cent_id", row_number().over(
        Window.orderBy(col("h"), col("v_id"))) .cast("long"))
      .select(col("cent_id"), col("v_vec").as("cent_vec"))
      .localCheckpoint()
    (1 to iters).foreach { _ =>
      val assigned = v
        .crossJoin(broadcast(cent
          .withColumn("cent_norm", nn(col("cent_vec")))))
        .withColumn("ccos", nd(col("v_vec"), col("cent_vec")) /
          (col("v_norm") * col("cent_norm")))
        .filter(col("ccos").isNotNull && !isnan(col("ccos")))
        .groupBy(col("v_id"))
        .agg(min_by(struct(col("cent_id"), col("v_vec")),
          struct(-col("ccos"), col("cent_id"))).as("w"))
        .select(col("w.cent_id").as("cent_id"), col("w.v_vec").as("v_vec"))
      cent = assigned
        .select(col("cent_id"), posexplode(col("v_vec")))
        .groupBy(col("cent_id"), col("pos"))
        .agg(avg(col("col").cast("double")).as("m"))
        .groupBy(col("cent_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
          .as("pm"))
        .select(col("cent_id"),
          transform(col("pm"), x => x("m").cast("float")).as("cent_vec"))
        .localCheckpoint()
    }
    cent
  }

  /** All near-duplicate pairs by cosine ≥ threshold within `df`
    * (bounded input — pair enumeration is quadratic by definition; at
    * scale gate through [[Dedup.minHashCandidates]]-style bucketing
    * first). */
  def cosinePairs(df: DataFrame, vecCol: String, keyCol: String,
      threshold: Double): DataFrame = {
    val nd = nativeDot(df) _
    val nn = nativeNorm(df) _
    val v = df.select(col(keyCol), col(vecCol),
      nn(col(vecCol)).as("nrm"))
    val a = v.select(col(keyCol).as("key_a"), col(vecCol).as("vec_a"),
      col("nrm").as("norm_a"))
    val b = v.select(col(keyCol).as("key_b"), col(vecCol).as("vec_b"),
      col("nrm").as("norm_b"))
    a.crossJoin(b).filter(col("key_a") < col("key_b"))
      .withColumn("cos",
        nd(col("vec_a"), col("vec_b")) / (col("norm_a") * col("norm_b")))
      .filter(col("cos") >= threshold)
      .select(col("key_a"), col("key_b"), r3(col("cos")).as("cos"))
  }

  /** The scale path for [[cosinePairs]]: SRP-bucket the corpus with
    * `planes` fixed hyperplanes and enumerate pairs only within a
    * bucket — the cross join becomes an equi-join on `bucket`, so the
    * shuffle is hash-partitioned and per-bucket quadratic instead of
    * globally quadratic. Approximate by construction (a pair whose
    * vectors land in different buckets is never scored — for SRP the
    * miss probability per plane is angle/π, so high-cosine pairs are
    * overwhelmingly retained); fewer planes → bigger buckets → higher
    * recall, more compute. Output schema matches [[cosinePairs]], and
    * every emitted pair carries its exact cosine. */
  def cosinePairsBucketed(df: DataFrame, vecCol: String, keyCol: String,
      threshold: Double, planes: Int = 1, dim: Int = 64): DataFrame = {
    val nd = nativeDot(df) _
    val nn = nativeNorm(df) _
    val hp = hyperplanes(planes, dim)
    val v = df.select(col(keyCol), col(vecCol), nn(col(vecCol)).as("nrm"),
      srpBucket(col(vecCol), hp).as("bucket"))
    val a = v.select(col("bucket"), col(keyCol).as("key_a"),
      col(vecCol).as("vec_a"), col("nrm").as("norm_a"))
    val b = v.select(col("bucket"), col(keyCol).as("key_b"),
      col(vecCol).as("vec_b"), col("nrm").as("norm_b"))
    a.join(b, Seq("bucket")).filter(col("key_a") < col("key_b"))
      .withColumn("cos",
        nd(col("vec_a"), col("vec_b")) / (col("norm_a") * col("norm_b")))
      .filter(col("cos") >= threshold)
      .select(col("key_a"), col("key_b"), r3(col("cos")).as("cos"))
  }

  /** Per-vector symmetric int8 quantization: scale = max|x|/127,
    * q_i = floor(x_i/scale + 0.5) ∈ [-127, 127]. The at-rest form for
    * a 100 TB embedding corpus — 4× smaller scans, and cosine needs
    * NO dequantization (the per-vector scales cancel), so candidate
    * scoring runs entirely in exact integer arithmetic. floor(x+0.5)
    * instead of round() because floor is IEEE-exact and
    * engine-portable, where round's half-case policy differs between
    * Java (HALF_UP on the decimal rendering) and RE2-era SQL engines.
    * Zero vectors (max|x| = 0) are dropped — they have no direction
    * to quantize, matching the NaN policy of the float paths.
    * Output: (`keyCol`, `keep`*, q — array<tinyint> weights, qn — the
    * integer L2 norm² as long); `keep` lets layout writers carry a
    * partition column through without a re-join. Runs as the one-pass
    * codegen'd [[graft.functions.VecQuantizeInt8]] kernel; the
    * relational `floor(x·127/max|x| + 0.5)` formulation it computes
    * is pinned equivalent in FunctionsSpec and replayed verbatim by
    * the ann_int8 oracles. */
  def quantizeInt8(df: DataFrame, vecCol: String, keyCol: String,
      keep: Seq[String] = Nil): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val head = col(keyCol) +: keep.map(col)
    df.select(head :+ graft.functions.GraftFunctions
        .vec_quantize_int8(col(vecCol)).as("q"): _*)
      .filter(col("q").isNotNull)
      .withColumn("qn",
        graft.functions.GraftFunctions.vec_dot_int8(col("q"), col("q")))
  }

  /** Exact-integer brute-force top-k over int8-quantized vectors:
    * cosine(q_a, q_b) = dot(q_a, q_b) / (√qn_a · √qn_b) — every
    * intermediate is an exact integer (|dot| ≤ 127²·dim), so the
    * result is bit-identical across engines and partitionings with no
    * float-accumulation caveats at all. Same join shape as
    * [[bruteForceTopK]] (broadcast queries, corpus streamed once);
    * at rest the corpus stores only (key, q, qn) — 4× fewer raw bytes
    * per vector, measured 3.5× as parquet ([[graft.tools
    * .QuantSizeProbe]]), which at 100 TB is the difference between a
    * memory-resident index shard and a spilling one. Approximation
    * error vs float cosine is the quantization error only (~1e-2 at
    * dim 64), bounded and measured in PipelineSpec. */
  def int8TopK(queries: DataFrame, corpus: DataFrame, vecCol: String,
      keyCol: String, k: Int): DataFrame = {
    val q = broadcast(quantizeInt8(queries, vecCol, keyCol)
      .select(col(keyCol).as("q_id"), col("q").as("q_q"),
        col("qn").as("q_qn")))
    val c = quantizeInt8(corpus, vecCol, keyCol)
      .select(col(keyCol).as("c_id"), col("q").as("c_q"),
        col("qn").as("c_qn"))
    q.crossJoin(c)
      .withColumn("icos", int8Cos(col("q_q"), col("q_qn"),
        col("c_q"), col("c_qn")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("icos").desc, col("c_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id"),
        r3(col("icos")).as("icos"))
  }

  /** The one exact-integer cosine formula every int8 path scores with
    * (brute, SRP-partitioned, IVF-partitioned) — a single definition
    * so the bit-exactness contract cannot silently diverge between
    * them. */
  private[pipeline] def int8Cos(qq: Column, qqn: Column, cq: Column,
      cqn: Column): Column =
    graft.functions.GraftFunctions.vec_dot_int8(qq, cq).cast("double") /
      (sqrt(qqn.cast("double")) * sqrt(cqn.cast("double")))

  /** Product-quantization codeword table: each codebook vector is cut
    * into `numSub` contiguous `subDim`-dim subvectors, giving per
    * subspace `m` the codeword set the encoder quantizes against.
    * Output `(m, code_id, w, cwn2)` — the subvector slice and its
    * exact squared norm (double, [[graft.functions.VecDot]]). The
    * table is O(codebook × numSub) rows — broadcast-sized by
    * construction (the codebook is the √n-capped subset the IVF tier
    * already uses; at real scale it comes from per-subspace k-means
    * and the structure is identical). */
  def pqCodewords(codebook: DataFrame, vecCol: String, keyCol: String,
      numSub: Int, subDim: Int): DataFrame = {
    val nd = nativeDot(codebook) _
    codebook
      .select(col(keyCol).as("code_id"), col(vecCol).as("cb_vec"))
      .withColumn("m", explode(array((0 until numSub).map(lit): _*)))
      .withColumn("w", slice(col("cb_vec"),
        (col("m") * subDim + 1).cast("int"), lit(subDim)))
      .withColumn("cwn2", nd(col("w"), col("w")))
      .select(col("m"), col("code_id"), col("w"), col("cwn2"))
  }

  /** PQ encoding: per corpus vector and subspace, the L2-nearest
    * codeword — the lossy compression step that turns a
    * `numSub·subDim`-float vector into `numSub` small integer codes
    * (the at-rest form: 8 codes replace 64 floats — 32× smaller than
    * float32 pages, 8× smaller than the int8 tier, which is what lets
    * a 100 TB embedding corpus keep its search structure
    * memory-resident). Distance uses the expanded form
    * `(‖s‖² − 2·s·w) + ‖w‖²` so every term is one codegen'd
    * [[graft.functions.VecDot]] call and the oracle can replay the
    * identical operation sequence bit-for-bit.
    *
    * Plan shape: one corpus scan exploded ×numSub (scan-local slice),
    * broadcast join against the codeword table, then a map-side
    * combinable `min_by` argmin per (vector, subspace) — the same
    * shuffle discipline as [[ivfAssign]]; the score relation itself
    * never shuffles. Ties break on ascending code_id. Output
    * `(c_id, m, code_id, cwn2)` carries the chosen codeword's squared
    * norm so scoring never rejoins the codebook. */
  def pqEncode(corpus: DataFrame, vecCol: String, keyCol: String,
      codewords: DataFrame, numSub: Int, subDim: Int): DataFrame = {
    val nd = nativeDot(corpus) _
    val sub = buildParallel(
      corpus.select(col(keyCol).as("c_id"), col(vecCol).as("c_vec")))
      .withColumn("m", explode(array((0 until numSub).map(lit): _*)))
      .withColumn("s", slice(col("c_vec"),
        (col("m") * subDim + 1).cast("int"), lit(subDim)))
      .withColumn("csub2", nd(col("s"), col("s")))
    sub.join(broadcast(codewords), Seq("m"))
      .withColumn("d",
        (col("csub2") - lit(2) * nd(col("s"), col("w"))) + col("cwn2"))
      .groupBy(col("c_id"), col("m"))
      .agg(min_by(struct(col("code_id"), col("cwn2")),
        struct(col("d"), col("code_id"))).as("pick"))
      .select(col("c_id"), col("m"), col("pick.code_id").as("code_id"),
        col("pick.cwn2").as("cwn2"))
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: each query builds
    * a `numSub × |codebook|` lookup table of partial dots against the
    * UNquantized query subvectors (the asymmetric trick — only the
    * corpus side pays quantization error), and every corpus vector is
    * scored as the sum of `numSub` table lookups — no float vector is
    * ever read at query time. Approximate cosine:
    * `Σₘ q_subₘ·w[codeₘ] / (‖q‖ · √Σₘ‖w[codeₘ]‖²)` — the corpus norm
    * is reconstructed from the codes too, so scoring touches ONLY the
    * code relation.
    *
    * Determinism: the cross-subspace sums route through
    * DECIMAL(28,15) (exact, order-independent addition — the
    * temperature-weights normalizer trick), because a double `sum`
    * across `numSub` rows would be partition-order-sensitive; the
    * per-subspace dots are the codegen'd left-to-right kernels the
    * oracles replay. Plan shape: the LUT is queries × codewords —
    * broadcast; the code relation streams through one equi-join +
    * one aggregation; the only corpus-sized shuffle is the
    * (q_id, c_id) partial-sum combine, on rows of a few bytes. */
  def pqTopKAdc(queries: DataFrame, codes: DataFrame,
      codewords: DataFrame, vecCol: String, keyCol: String,
      k: Int, subDim: Int): DataFrame =
    pqRankAdc(
      codes.join(pqLut(queries, codewords, vecCol, keyCol, subDim),
        Seq("m", "code_id")), k)

  /** The per-query ADC lookup table: one row per (query, subspace,
    * codeword) holding the UNquantized query subvector's dot with that
    * codeword — queries × codewords rows, broadcast by the same
    * small-query-batch contract every search path relies on. Shared by
    * [[pqTopKAdc]] and the IVF-partitioned composition
    * ([[PartitionedAnn.ivfPqTopKPartitioned]]). */
  private[pipeline] def pqLut(queries: DataFrame, codewords: DataFrame,
      vecCol: String, keyCol: String, subDim: Int): DataFrame = {
    val nd = nativeDot(queries) _
    val nn = nativeNorm(queries) _
    broadcast(
      queries.select(col(keyCol).as("q_id"), col(vecCol).as("q_vec"),
          nn(col(vecCol)).as("q_norm"))
        .crossJoin(codewords.select(col("m"), col("code_id"), col("w")))
        .withColumn("qs", slice(col("q_vec"),
          (col("m") * subDim + 1).cast("int"), lit(subDim)))
        .withColumn("pdot", nd(col("qs"), col("w")))
        .select(col("q_id"), col("q_norm"), col("m"), col("code_id"),
          col("pdot")))
  }

  /** The ADC scoring tail over candidate rows
    * `(q_id, q_norm, c_id, pdot, cwn2)` — one row per (query, corpus
    * vector, subspace): decimal-routed partial-sum combine (the only
    * corpus-sized shuffle, on rows of a few bytes), reconstructed-norm
    * cosine, per-query rank. */
  private[pipeline] def pqRankAdc(cand: DataFrame, k: Int): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 15)
    cand
      .groupBy(col("q_id"), col("q_norm"), col("c_id"))
      .agg(sum(col("pdot").cast(dec)).as("adc_d"),
        sum(col("cwn2").cast(dec)).as("cn2_d"))
      .withColumn("cos", col("adc_d").cast("double") /
        (col("q_norm") * sqrt(col("cn2_d").cast("double"))))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("c_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id"),
        r3(col("cos")).as("cos"))
  }

  /** PQ end-to-end: codeword table → corpus encoding → ADC top-k.
    * `codebook` is any `(key, vec)` relation (here the deterministic
    * √n-capped subset; per-subspace [[kmeansCentroids]] at real
    * scale). The encoding is what a 100 TB deployment writes at rest
    * once ([[pqEncode]]'s output is the index); this composition
    * rebuilds it inline the way the non-partitioned IVF/LSH queries
    * do. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, vecCol: String,
      keyCol: String, k: Int, codebook: DataFrame, numSub: Int,
      subDim: Int): DataFrame = {
    // EAGER checkpoint: the codeword table feeds both the encode join
    // and the ADC lookup table inside one action — a lazy checkpoint
    // would leave two live copies of its lineage in the same plan
    val cw = pqCodewords(codebook, vecCol, keyCol, numSub, subDim)
      .localCheckpoint()
    val codes = pqEncode(corpus, vecCol, keyCol, cw, numSub, subDim)
    pqTopKAdc(queries, codes, cw, vecCol, keyCol, k, subDim)
  }

  /** Exact re-ranking of a coarse candidate list (the FAISS "refine"
    * stage): `cand` is a tiny `(q_id, c_id)` relation (queries ×
    * refine-depth rows — broadcast by construction), and ONLY those
    * corpus vectors are read back at float precision and scored with
    * the exact cosine. This is the standard two-stage recipe that
    * makes lossy compression (PQ/int8) safe at 100 TB: the compressed
    * index does the corpus-sized work, the float read is k·|Q| keyed
    * lookups — against a `cent_id=`-partitioned float layout the scan
    * prunes to the probed clusters, and the broadcast candidate join
    * prunes rows within them. Output `(q_id, rank, c_id, cos)` with
    * the exact cosine, not the ADC approximation. */
  private[pipeline] def refineExact(queries: DataFrame, corpus: DataFrame,
      vecCol: String, keyCol: String, cand: DataFrame, k: Int): DataFrame = {
    val nd = nativeDot(corpus) _
    val nn = nativeNorm(corpus) _
    val q = broadcast(queries.select(col(keyCol).as("q_id"),
      col(vecCol).as("q_vec"), nn(col(vecCol)).as("q_norm")))
    corpus.select(col(keyCol).as("c_id"), col(vecCol).as("c_vec"),
        nn(col(vecCol)).as("c_norm"))
      .join(broadcast(cand), Seq("c_id"))
      .join(q, Seq("q_id"))
      .withColumn("cos",
        nd(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("c_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id"),
        r3(col("cos")).as("cos"))
  }

  /** Two-stage PQ search with exact re-ranking — ADC scores every
    * code row cheaply ([[pqTopKAdc]], codes-only read), keeps the top
    * `refine` candidates per query, then [[refineExact]] re-scores
    * ONLY those with the true float cosine. Recall approaches
    * brute-force while the corpus-sized stage still never touches a
    * float vector; the refine stage's float read is `refine·|Q|`
    * keyed lookups. `refine` ≥ `k`; ties in the coarse stage break on
    * ascending `c_id`, so the candidate set is deterministic and the
    * oracle can replay both stages. */
  def pqTopKRefined(queries: DataFrame, corpus: DataFrame, vecCol: String,
      keyCol: String, k: Int, refine: Int, codebook: DataFrame,
      numSub: Int, subDim: Int): DataFrame = {
    require(refine >= k, s"refine depth $refine must be >= k=$k")
    val cw = pqCodewords(codebook, vecCol, keyCol, numSub, subDim)
      .localCheckpoint()
    val codes = pqEncode(corpus, vecCol, keyCol, cw, numSub, subDim)
    val coarse = pqTopKAdc(queries, codes, cw, vecCol, keyCol, refine,
      subDim).select(col("q_id"), col("c_id"))
    refineExact(queries, corpus, vecCol, keyCol, coarse, k)
  }

  /** SemDeDup-style semantic deduplication (cluster first, dedup
    * within clusters — Abbas et al. 2023): assign every corpus vector
    * to its nearest centroid via [[ivfAssign]] (broadcast codebook,
    * map-side `min_by` argmax — the corpus never shuffles its score
    * relation), then mark any vector with a lower-keyed SAME-cluster
    * neighbor at cosine ≥ `tau` as a duplicate of its smallest such
    * neighbor. Clustering first is the entire scale story: pair
    * enumeration becomes an equi-join on `cent_id` — per-cluster
    * quadratic (AQE-splittable on an oversized cluster), never the
    * global cross join a 100 TB corpus cannot afford.
    *
    * Output: one row per assigned vector — (`keyCol`, cent_id,
    * dup_of), `dup_of` NULL for keepers. The smallest-lower-keyed-
    * neighbor policy is deterministic and deliberately non-transitive
    * (pairwise, like SemDeDup's per-cluster pruning); when transitive
    * groups are wanted, feed the implied (dup_of, key) edges through
    * the [[Dedup.componentClusters]]-style pass the e2e pipeline
    * demonstrates. Zero-norm vectors are dropped by assignment
    * (ivfAssign's NaN policy) and never reach the output. */
  def semanticDedup(corpus: DataFrame, vecCol: String, keyCol: String,
      centroids: DataFrame, tau: Double): DataFrame = {
    // localCheckpoint: the assignment feeds the pair join twice (a/b
    // sides) plus the final keeper join — without it Catalyst plans
    // three full corpus×codebook assignment trees (the crossDocDupStats
    // DAG-fork trick)
    val assigned = ivfAssign(corpus, vecCol, keyCol, centroids)
      .localCheckpoint(false)
    semanticDedupAssigned(assigned, keyCol, tau)
  }

  /** The SemDeDup pairing + keeper stages over an EXISTING assignment
    * relation `(c_id, c_vec, c_norm, cent_id)` — e.g. an
    * [[graft.pipeline.PartitionedAnn.writeIvfPartitioned]] layout read
    * back from parquet, which IS an [[ivfAssign]] output at rest. The
    * assignment pass is the n^1.5 part of semantic dedup (measured:
    * it dominates dd_semantic's sf0.1→sf1 scaling, exponent ~1.06);
    * building it once and deduping from the files turns repeated
    * passes — re-tuned tau, refreshed held-out sets — into pure
    * within-cluster work, the same amortization the partitioned ANN
    * probes get. Output contract identical to [[semanticDedup]]. */
  def semanticDedupAssigned(assigned: DataFrame, keyCol: String,
      tau: Double): DataFrame = {
    val dupOf = pairsWithinCluster(assigned, tau)
      .groupBy(col("key_b")).agg(min(col("key_a")).as("dup_of"))
    assigned.select(col("c_id"), col("cent_id"))
      .join(dupOf, col("c_id") === col("key_b"), "left_outer")
      .select(col("c_id").as(keyCol), col("cent_id"), col("dup_of"))
  }

  /** The SemDeDup pairing stage on its own: within-cluster candidate
    * pairs at cosine ≥ `tau` over an [[ivfAssign]] output — exposed so
    * transitive resolution can feed the pairs through
    * [[Dedup.componentClusters]] (the pp_semdedup_e2e composition).
    * Output: (cent_id, key_a, key_b) with key_a < key_b. */
  def semanticPairs(corpus: DataFrame, vecCol: String, keyCol: String,
      centroids: DataFrame, tau: Double): DataFrame =
    pairsWithinCluster(
      ivfAssign(corpus, vecCol, keyCol, centroids).localCheckpoint(false),
      tau)

  /** [[semanticPairs]] over an EXISTING assignment relation
    * `(c_id, c_vec, c_norm, cent_id)` — the at-rest twin, same
    * relationship [[semanticDedupAssigned]] has to [[semanticDedup]]:
    * reading a [[graft.pipeline.PartitionedAnn.writeIvfPartitioned]]
    * layout back skips the n^1.5 assignment rebuild and pays only the
    * within-cluster pairing, and because the layout is partitioned by
    * `cent_id` the equi-join key is already co-located on disk. */
  def semanticPairsAssigned(assigned: DataFrame,
      tau: Double): DataFrame =
    pairsWithinCluster(assigned, tau)

  private def pairsWithinCluster(assigned: DataFrame,
      tau: Double): DataFrame = {
    val nd = nativeDot(assigned) _
    val a = assigned.select(col("cent_id"), col("c_id").as("key_a"),
      col("c_vec").as("a_vec"), col("c_norm").as("a_norm"))
    val b = assigned.select(col("cent_id"), col("c_id").as("key_b"),
      col("c_vec").as("b_vec"), col("c_norm").as("b_norm"))
    a.join(b, Seq("cent_id"))
      .filter(col("key_a") < col("key_b"))
      .withColumn("cos",
        nd(col("a_vec"), col("b_vec")) / (col("a_norm") * col("b_norm")))
      .filter(col("cos") >= tau)
      .select(col("cent_id"), col("key_a"), col("key_b"))
  }
}
