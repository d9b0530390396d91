package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ANN over a corpus partitioned **at rest** by its index key — the
  * concrete form of the 100 TB story the [[Similarity]] scaladocs
  * describe ("write the corpus partitioned by bucket once and every
  * query probes one partition").
  *
  * Write once: [[writeSrpBucketed]] lays the corpus out as
  * `bucket=<srp sign pattern>/part-*.parquet`; [[writeIvfPartitioned]]
  * as `cent_id=<nearest centroid>/part-*.parquet` (with norms
  * precomputed, so query time never re-norms the corpus).
  *
  * Query: the probe set is derived from the query batch — which is the
  * small, broadcastable side by the same contract every Similarity
  * search path already relies on — and pushed as a **literal partition
  * filter**. That makes pruning happen at file-listing time, before a
  * single task launches: the scan's `PartitionFilters` carries
  * `bucket IN (…)`, and on a 1000-executor cluster a k-NN batch reads
  * `probed/total` of the corpus bytes instead of all of them. PlanSpec
  * pins the PartitionFilters shape; SCALE.md records measured
  * files-read counts.
  *
  * Results are bit-identical to the in-memory [[Similarity.lshTopK]] /
  * [[Similarity.ivfTopK]] at the same parameters (floats round-trip
  * parquet exactly; both variants are driver-oracle-verified).
  */
object PartitionedAnn {

  /** Partition values are written as INT directory names so the
    * read-back partition column type-infers to IntegerType and the
    * probe filter stays a cast-free `IN` the file index can apply.
    * 2^20 directories is already far past a sane layout. */
  private def requirePlanes(planes: Int): Unit =
    require(planes >= 1 && planes <= 20,
      s"partitioned SRP layout wants 1..20 planes (2^planes dirs), got $planes")

  /** The same dim fail-fast every in-memory LSH path runs: a mismatch
    * nulls the plane dot products and collapses every vector into
    * bucket 0 — at write time that silently destroys pruning, at query
    * time it probes the wrong buckets. min/max of size(vec) in one
    * tiny aggregate job, so a RAGGED corpus (where a head-probe's
    * arbitrary first row might happen to match `dim`) also fails fast
    * at write time instead of silently collapsing the mismatched tail
    * into bucket 0. On the write paths it runs once per index build —
    * the full-scan cost is the build's own scan. The query paths
    * (lshTopKPartitioned / lshTopKPartitionedInt8) call it on the
    * QUERIES relation too: that is a full scan of the query batch per
    * call, acceptable because query batches are small by contract
    * (they are collected to the driver for the probe set anyway). */
  private def requireDim(df: DataFrame, vecCol: String, dim: Int,
      who: String): Unit = {
    val probe = df.filter(col(vecCol).isNotNull)
      .agg(min(size(col(vecCol))).as("lo"), max(size(col(vecCol))).as("hi"))
      .collect()(0)
    require(!probe.isNullAt(0),
      s"$who: no non-null '$vecCol' vectors to probe")
    val (lo, hi) = (probe.getInt(0), probe.getInt(1))
    require(lo == dim && hi == dim,
      s"$who: dim=$dim but vector lengths span [$lo, $hi]")
  }

  /** Shared tail of every partitioned query path: per-query rank by
    * score desc (corpus key tie-break), top-k, r3-rounded output. */
  private def rankTopK(scored: DataFrame, scoreCol: String,
      k: Int): DataFrame =
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col(scoreCol).desc, col("c_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id"),
        Similarity.r3(col(scoreCol)).as(scoreCol))

  /** Write `corpus` partitioned by its `planes`-bit SRP sign bucket. */
  def writeSrpBucketed(corpus: DataFrame, vecCol: String, keyCol: String,
      outDir: String, planes: Int, dim: Int): Unit = {
    requirePlanes(planes)
    requireDim(corpus, vecCol, dim, "writeSrpBucketed")
    val hp = Similarity.hyperplanes(planes, dim)
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    // buildParallel: see Similarity — a one-row-group source file
    // must not serialize the whole bucket-hash pass onto one task
    // cluster the write on (bucket, salt): per-bucket dirs with a few
    // files each, write parallelism buckets × salts (LayoutWrite)
    LayoutWrite.salted(
      Similarity.buildParallel(corpus)
        .select(col(keyCol).as("c_id"), col(vecCol).as("c_vec"),
          graft.functions.GraftFunctions.vec_norm(col(vecCol))
            .as("c_norm"),
          Similarity.srpBucket(col(vecCol), hp).cast("int")
            .as("bucket")),
      "bucket", col("c_id"))
      .write.mode("overwrite").partitionBy("bucket").parquet(outDir)
  }

  /** [[Similarity.lshTopK]] against a [[writeSrpBucketed]] layout.
    * The query batch's distinct buckets (≤ query count, tiny) become a
    * literal `bucket IN (…)` partition filter on the corpus scan. */
  def lshTopKPartitioned(spark: SparkSession, corpusDir: String,
      queries: DataFrame, vecCol: String, keyCol: String, k: Int,
      planes: Int, dim: Int): DataFrame = {
    requirePlanes(planes)
    requireDim(queries, vecCol, dim, "lshTopKPartitioned")
    val hp = Similarity.hyperplanes(planes, dim)
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.{vec_dot, vec_norm}
    // localCheckpoint: the tiny query relation is consumed twice
    // (probe-set collect, then the broadcast join) — materialize once
    val q = queries.select(col(keyCol).as("q_id"), col(vecCol).as("q_vec"),
      vec_norm(col(vecCol)).as("q_norm"),
      Similarity.srpBucket(col(vecCol), hp).cast("int").as("bucket"))
      .localCheckpoint()
    // driver-bounded by the same small-query-side contract that lets
    // bruteForceTopK broadcast the batch outright; collecting here is
    // what turns pruning into a literal filter the file index applies
    // during listing instead of a runtime subquery
    val probed = q.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).sorted
    val c = spark.read.parquet(corpusDir)
      .filter(col("bucket").isin(probed.toIndexedSeq: _*))
    rankTopK(broadcast(q).join(c, Seq("bucket"))
      .withColumn("cos",
        vec_dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm"))),
      "cos", k)
  }

  /** [[writeSrpBucketed]] with int8-quantized weights — the
    * composition of the two at-rest wins: partition pruning AND the
    * measured 3.5× smaller pages ([[graft.tools.QuantSizeProbe]]).
    * The SRP bucket is computed on the ORIGINAL float vector before
    * quantization (the hash boundary must not move), then the files
    * store only (c_id, q as tinyint, qn, bucket=). */
  def writeSrpBucketedInt8(corpus: DataFrame, vecCol: String,
      keyCol: String, outDir: String, planes: Int, dim: Int): Unit = {
    requirePlanes(planes)
    requireDim(corpus, vecCol, dim, "writeSrpBucketedInt8")
    val hp = Similarity.hyperplanes(planes, dim)
    LayoutWrite.salted(
      Similarity.quantizeInt8(
        Similarity.buildParallel(corpus)
          .select(col(keyCol).as("c_id"), col(vecCol),
            Similarity.srpBucket(col(vecCol), hp).cast("int")
              .as("bucket")),
        vecCol, "c_id", keep = Seq("bucket"))
        .select(col("c_id"), col("q"), col("qn"), col("bucket")),
      "bucket", col("c_id"))
      .write.mode("overwrite").partitionBy("bucket").parquet(outDir)
  }

  /** Int8 LSH top-k against a [[writeSrpBucketedInt8]] layout: the
    * probe set prunes partitions exactly like [[lshTopKPartitioned]],
    * and scoring is [[Similarity.int8TopK]]'s exact integer cosine —
    * the tinyint pages feed the codegen'd `vec_dot_int8` kernel
    * directly, no widening pass. */
  def lshTopKPartitionedInt8(spark: SparkSession, corpusDir: String,
      queries: DataFrame, vecCol: String, keyCol: String, k: Int,
      planes: Int, dim: Int): DataFrame = {
    requirePlanes(planes)
    requireDim(queries, vecCol, dim, "lshTopKPartitionedInt8")
    val hp = Similarity.hyperplanes(planes, dim)
    val q = Similarity.quantizeInt8(
      queries.select(col(keyCol).as("q_id"), col(vecCol),
        Similarity.srpBucket(col(vecCol), hp).cast("int").as("bucket")),
      vecCol, "q_id", keep = Seq("bucket"))
      .select(col("q_id"), col("bucket"), col("q").as("q_q"),
        col("qn").as("q_qn"))
      .localCheckpoint()
    val probed = q.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).sorted
    val c = spark.read.parquet(corpusDir)
      .filter(col("bucket").isin(probed.toIndexedSeq: _*))
      .select(col("c_id"), col("bucket"), col("q").as("c_q"),
        col("qn").as("c_qn"))
    rankTopK(broadcast(q).join(c, Seq("bucket"))
      .withColumn("icos", Similarity.int8Cos(col("q_q"), col("q_qn"),
        col("c_q"), col("c_qn"))),
      "icos", k)
  }

  /** Partition directories are INT-typed ([[requirePlanes]] note), so
    * a long centroid id beyond Int range would WRAP under the cast —
    * distinct centroids colliding into one directory and silently
    * merging clusters. Fail fast; the centroid table is tiny. */
  private def requireIntCentIds(centroids: DataFrame): Unit = {
    val bad = centroids
      .filter(col("cent_id") > Int.MaxValue.toLong ||
        col("cent_id") < Int.MinValue.toLong)
      .select(col("cent_id")).limit(1).collect()
    require(bad.isEmpty,
      s"IVF partitioned layout stores cent_id as an INT directory " +
        s"name; centroid id ${bad.headOption.map(_.get(0)).orNull} " +
        "exceeds Int range and would wrap")
  }

  /** Write `corpus` partitioned by nearest centroid (the IVF index at
    * rest): one [[Similarity.ivfAssign]] pass, `cent_id=` directories,
    * norms precomputed in the files. */
  def writeIvfPartitioned(corpus: DataFrame, vecCol: String,
      keyCol: String, centroids: DataFrame, outDir: String): Unit = {
    requireIntCentIds(centroids)
    LayoutWrite.salted(
      Similarity.ivfAssign(corpus, vecCol, keyCol, centroids)
        .withColumn("cent_id", col("cent_id").cast("int")),
      "cent_id", col("c_id"))
      .write.mode("overwrite").partitionBy("cent_id").parquet(outDir)
  }

  /** [[writeIvfPartitioned]] with int8 pages — the IVF half of the
    * compounded at-rest form ([[writeSrpBucketedInt8]] being the SRP
    * half): assignment runs on the float vectors (the codebook is
    * float — the cluster boundary must not move), then the files
    * store (c_id, tinyint weights, integer norm², cent_id=). */
  def writeIvfPartitionedInt8(corpus: DataFrame, vecCol: String,
      keyCol: String, centroids: DataFrame, outDir: String): Unit = {
    requireIntCentIds(centroids)
    val assigned = Similarity.ivfAssign(corpus, vecCol, keyCol, centroids)
      .withColumn("cent_id", col("cent_id").cast("int"))
    LayoutWrite.salted(
      Similarity.quantizeInt8(
        assigned.select(col("c_id"), col("c_vec"), col("cent_id")),
        "c_vec", "c_id", keep = Seq("cent_id"))
        .select(col("c_id"), col("q"), col("qn"), col("cent_id")),
      "cent_id", col("c_id"))
      .write.mode("overwrite").partitionBy("cent_id").parquet(outDir)
  }

  /** Int8 IVF top-k against a [[writeIvfPartitionedInt8]] layout:
    * centroid probing stays float (the codebook is float), the probed
    * centroids prune partitions, and candidate scoring is the exact
    * integer cosine straight off the tinyint pages. */
  def ivfTopKPartitionedInt8(spark: SparkSession, corpusDir: String,
      queries: DataFrame, vecCol: String, keyCol: String, k: Int,
      centroids: DataFrame, nprobe: Int): DataFrame =
    ivfTopKFramesInt8(spark, spark.read.parquet(corpusDir), queries,
      vecCol, keyCol, k, centroids, nprobe)

  /** [[ivfTopKPartitionedInt8]] over an explicit corpus frame carrying
    * `(c_id, q, qn, cent_id)` — e.g. base ∪ streamed deltas
    * ([[graft.streaming.IvfStream.layoutInt8]]); each underlying
    * parquet relation prunes its own `cent_id=` partitions. */
  def ivfTopKFramesInt8(spark: SparkSession, corpus: DataFrame,
      queries: DataFrame, vecCol: String, keyCol: String, k: Int,
      centroids: DataFrame, nprobe: Int): DataFrame = {
    requireIntCentIds(centroids)
    graft.functions.GraftFunctions.register(spark)
    // quantize each query ONCE (ivfProbe emits one row per probed
    // centroid — quantizing those rows would redo the work nprobe
    // times), then attach the probe set; materialize the tiny result
    // for the probe-set collect and the join
    val qz = Similarity.quantizeInt8(
      queries.select(col(keyCol).as("q_id"), col(vecCol)),
      vecCol, "q_id")
      .select(col("q_id"), col("q").as("q_q"), col("qn").as("q_qn"))
    val qq = Similarity.ivfProbe(queries, vecCol, keyCol,
      centroids, nprobe)
      .select(col("q_id"), col("cent_id").cast("int").as("cent_id"))
      .join(qz, Seq("q_id"))
      .localCheckpoint()
    val probed = qq.select(col("cent_id")).distinct()
      .collect().map(_.getInt(0)).sorted
    val c = corpus
      .filter(col("cent_id").isin(probed.toIndexedSeq: _*))
      .select(col("c_id"), col("cent_id"), col("q").as("c_q"),
        col("qn").as("c_qn"))
    rankTopK(broadcast(qq).join(c, Seq("cent_id"))
      .withColumn("icos", Similarity.int8Cos(col("q_q"), col("q_qn"),
        col("c_q"), col("c_qn"))),
      "icos", k)
  }

  /** Same INT-directory wrap hazard as [[requireIntCentIds]], for the
    * PQ codeword ids a [[writeIvfPqPartitioned]] layout stores in its
    * code arrays. The codeword table is broadcast-sized; the check is
    * one tiny job. */
  private def requireIntCodeIds(codewords: DataFrame): Unit = {
    val bad = codewords
      .filter(col("code_id") > Int.MaxValue.toLong ||
        col("code_id") < Int.MinValue.toLong)
      .select(col("code_id")).limit(1).collect()
    require(bad.isEmpty,
      s"IVF+PQ layout stores codes as INT; codeword id " +
        s"${bad.headOption.map(_.get(0)).orNull} exceeds Int range " +
        "and would wrap")
  }

  /** Write the IVF+PQ index at rest — the canonical web-scale ANN
    * layout (the FAISS IVFADC shape): every corpus vector is assigned
    * to its nearest IVF centroid AND compressed to `numSub` PQ
    * codeword ids ([[Similarity.pqEncode]]); the files store ONLY
    * `(c_id, codes: array<int>)` under `cent_id=` directories. At
    * 64-dim float32 that is 8 ints standing in for 256 vector bytes —
    * the form that keeps a 100 TB embedding corpus's entire search
    * structure small enough to stay hot while the raw vectors are
    * never re-read at query time. Code position = subspace `m`. */
  def writeIvfPqPartitioned(corpus: DataFrame, vecCol: String,
      keyCol: String, centroids: DataFrame, codewords: DataFrame,
      outDir: String, numSub: Int, subDim: Int): Unit =
    LayoutWrite.salted(
      ivfPqRows(corpus, vecCol, keyCol, centroids, codewords, numSub,
        subDim),
      "cent_id", col("c_id"))
      .write.mode("overwrite").partitionBy("cent_id").parquet(outDir)

  /** The IVF+PQ index relation `(c_id, codes, cent_id)` for any
    * corpus slice — shared by the base writer above and the streaming
    * delta appender ([[graft.streaming.IvfStream.appendBatchPq]]).
    * Both assignment and encoding are per-vector deterministic under
    * fixed centroids/codewords, so a streamed delta holds
    * row-for-row what a full rebuild would write. */
  private[graft] def ivfPqRows(corpus: DataFrame, vecCol: String,
      keyCol: String, centroids: DataFrame, codewords: DataFrame,
      numSub: Int, subDim: Int): DataFrame = {
    requireIntCentIds(centroids)
    requireIntCodeIds(codewords)
    val assigned = Similarity.ivfAssign(corpus, vecCol, keyCol, centroids)
      .withColumn("cent_id", col("cent_id").cast("int"))
      .select(col("c_id"), col("c_vec"), col("cent_id"))
      // consumed twice below (encode scan + cent_id join) — eager,
      // or both consumers re-derive the assignment in the same action
      .localCheckpoint()
    val codes = Similarity
      .pqEncode(assigned, "c_vec", "c_id", codewords, numSub, subDim)
      .groupBy(col("c_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("m"), col("code_id")))),
        x => x.getField("code_id").cast("int")).as("codes"))
    assigned.select(col("c_id"), col("cent_id"))
      .join(codes, Seq("c_id"))
      .select(col("c_id"), col("codes"), col("cent_id"))
  }

  /** IVF+PQ query against a [[writeIvfPqPartitioned]] layout: float
    * centroids drive probing (literal `cent_id IN (…)` partition
    * pruning, like every IVF path here), then candidates are scored
    * by asymmetric-distance lookup ([[Similarity.pqRankAdc]]) — the
    * corpus scan reads ONLY the code arrays; no float corpus vector
    * is touched anywhere in the plan (PlanSpec pins both the pruning
    * and the codes-only read schema). Results are bit-identical to
    * running [[Similarity.pqTopKAdc]] restricted to each query's
    * probed clusters (the driver oracle replays exactly that). */
  def ivfPqTopKPartitioned(spark: SparkSession, corpusDir: String,
      queries: DataFrame, vecCol: String, keyCol: String, k: Int,
      centroids: DataFrame, codewords: DataFrame, nprobe: Int,
      subDim: Int): DataFrame =
    ivfPqTopKFrames(spark, spark.read.parquet(corpusDir), queries,
      vecCol, keyCol, k, centroids, codewords, nprobe, subDim)

  /** [[ivfPqTopKPartitioned]] over an explicit `(c_id, codes,
    * cent_id)` frame — e.g. base ∪ streamed deltas
    * ([[graft.streaming.IvfStream.layoutPq]]); each underlying
    * parquet relation prunes its own `cent_id=` partitions. */
  def ivfPqTopKFrames(spark: SparkSession, corpus: DataFrame,
      queries: DataFrame, vecCol: String, keyCol: String, k: Int,
      centroids: DataFrame, codewords: DataFrame, nprobe: Int,
      subDim: Int): DataFrame = {
    requireIntCentIds(centroids)
    // localCheckpoint: consumed by the probe-set collect AND the join
    val probedQ = Similarity
      .ivfProbe(queries, vecCol, keyCol, centroids, nprobe)
      .select(col("q_id"), col("cent_id").cast("int").as("cent_id"))
      .localCheckpoint()
    val probed = probedQ.select(col("cent_id")).distinct()
      .collect().map(_.getInt(0)).sorted
    ivfPqTopKProbed(spark, corpus, queries, vecCol, keyCol, k,
      codewords, subDim, probedQ, probed)
  }

  /** The ADC scoring tail of [[ivfPqTopKFrames]] over an ALREADY
    * computed probe pass — lets [[ivfPqTopKRefined]] share one probe
    * between its coarse and refine stages. */
  private def ivfPqTopKProbed(spark: SparkSession, corpus: DataFrame,
      queries: DataFrame, vecCol: String, keyCol: String, k: Int,
      codewords: DataFrame, subDim: Int, probedQ: DataFrame,
      probed: Array[Int]): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val lut = Similarity.pqLut(queries, codewords, vecCol, keyCol, subDim)
    val cwn = broadcast(
      codewords.select(col("m"), col("code_id"), col("cwn2")))
    val c = corpus
      .filter(col("cent_id").isin(probed.toIndexedSeq: _*))
      .select(col("c_id"), col("cent_id"),
        posexplode(col("codes")).as(Seq("m", "code_id")))
      .withColumn("code_id", col("code_id").cast("long"))
    Similarity.pqRankAdc(
      c.join(broadcast(probedQ), Seq("cent_id"))
        .join(lut, Seq("q_id", "m", "code_id"))
        .join(cwn, Seq("m", "code_id")), k)
  }

  /** Two-stage IVF+PQ query with exact re-ranking — the full FAISS
    * IVFADC+refine shape over TWO at-rest layouts: the coarse stage is
    * [[ivfPqTopKFrames]] over the codes-only layout (probed `cent_id=`
    * partitions, ADC lookup — no float read) kept to depth `refine`;
    * the refine stage reads the candidates' float vectors back from
    * the [[writeIvfPartitioned]] float layout, pruned BOTH ways — the
    * probed-centroid partition filter (candidates live in probed
    * clusters by construction) and the broadcast candidate-key join —
    * and re-scores them with the exact cosine
    * ([[Similarity.refineExact]]). At 100 TB the codes layout is the
    * memory-resident search structure and the float layout is only
    * ever touched at `refine·|Q|` keyed rows per query batch. */
  def ivfPqTopKRefined(spark: SparkSession, codesDir: String,
      floatDir: String, queries: DataFrame, vecCol: String,
      keyCol: String, k: Int, refine: Int, centroids: DataFrame,
      codewords: DataFrame, nprobe: Int, subDim: Int): DataFrame = {
    require(refine >= k, s"refine depth $refine must be >= k=$k")
    requireIntCentIds(centroids)
    // ONE probe pass drives both stages: the coarse ADC read and the
    // refine stage's float-layout partition filter
    val probedQ = Similarity
      .ivfProbe(queries, vecCol, keyCol, centroids, nprobe)
      .select(col("q_id"), col("cent_id").cast("int").as("cent_id"))
      .localCheckpoint()
    val probed = probedQ.select(col("cent_id")).distinct()
      .collect().map(_.getInt(0)).sorted
    val coarse = ivfPqTopKProbed(spark, spark.read.parquet(codesDir),
      queries, vecCol, keyCol, refine, codewords, subDim, probedQ,
      probed).select(col("q_id"), col("c_id"))
    val floats = spark.read.parquet(floatDir)
      .filter(col("cent_id").isin(probed.toIndexedSeq: _*))
      .select(col("c_id").as(keyCol), col("c_vec").as(vecCol))
    Similarity.refineExact(queries, floats, vecCol, keyCol, coarse, k)
  }

  /** Binary (sign-bit) corpus written at rest: packed words only —
    * 8 bytes stand in for 256 vector bytes at dim 64 — partitioned by
    * the low `bucketBits` bits of word 0 (the signs of the first
    * components, i.e. a coordinate-plane SRP bucket that costs
    * nothing extra because it IS part of the code). A probe reads
    * only its own-bucket partition: the 2^bucketBits-way pruning on
    * top of the 32× compression. */
  def writeBinaryPartitioned(corpus: DataFrame, vecCol: String,
      keyCol: String, outDir: String, dim: Int,
      bucketBits: Int = 4): Unit = {
    require(bucketBits >= 1 && bucketBits <= 16,
      s"writeBinaryPartitioned: bucketBits=$bucketBits out of range")
    // the probe requires it too — a dim=48 writer would silently pack
    // one word and drop the last 16 dimensions from the stored codes
    require(dim > 0 && dim % 32 == 0,
      s"writeBinaryPartitioned: dim=$dim must be a multiple of 32")
    LayoutWrite.salted(
      corpus
        .select(col(keyCol).as("c_id"),
          Similarity.packWords(col(vecCol), dim).as("c_bits"))
        .withColumn("bucket",
          (element_at(col("c_bits"), 1)
            .bitwiseAND(lit((1L << bucketBits) - 1))).cast("int")),
      "bucket", col("c_id"))
      .write.mode("overwrite").partitionBy("bucket").parquet(outDir)
  }

  /** Hamming top-k against a [[writeBinaryPartitioned]] layout: the
    * query batch packs scan-local, its distinct buckets become the
    * literal partition filter, and scoring is xor-popcount over the
    * stored words — the float corpus is never touched. Same-bucket
    * probing only (the [[lshTopKPartitioned]] contract): candidates
    * share the query's first `bucketBits` signs by construction. */
  def binaryTopKPartitioned(spark: SparkSession, corpusDir: String,
      queries: DataFrame, vecCol: String, keyCol: String, k: Int,
      dim: Int, bucketBits: Int = 4): DataFrame = {
    require(dim > 0 && dim % 32 == 0,
      s"binaryTopKPartitioned: dim=$dim must be a multiple of 32")
    // localCheckpoint: consumed by the probe-set collect AND the join;
    // the broadcast hint goes on the JOIN input (hinting before the
    // checkpoint strands it outside the join relation)
    val q = queries
      .select(col(keyCol).as("q_id"),
        Similarity.packWords(col(vecCol), dim).as("q_bits"))
      .withColumn("bucket",
        (element_at(col("q_bits"), 1)
          .bitwiseAND(lit((1L << bucketBits) - 1))).cast("int"))
      .localCheckpoint()
    val probed = q.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).sorted
    val c = spark.read.parquet(corpusDir)
      .filter(col("bucket").isin(probed.toIndexedSeq: _*))
    broadcast(q).join(c, Seq("bucket"))
      .withColumn("hamming", Similarity.hammingCol(col("q_bits"),
        col("c_bits"), dim / 32))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("hamming"), col("c_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id"), col("hamming"))
  }

  /** [[Similarity.ivfTopK]] against a [[writeIvfPartitioned]] layout.
    * The probe pass runs on the query batch only; its distinct probed
    * centroids become the literal `cent_id IN (…)` partition filter. */
  def ivfTopKPartitioned(spark: SparkSession, corpusDir: String,
      queries: DataFrame, vecCol: String, keyCol: String, k: Int,
      centroids: DataFrame, nprobe: Int): DataFrame =
    ivfTopKFrames(spark, spark.read.parquet(corpusDir), queries,
      vecCol, keyCol, k, centroids, nprobe)

  /** [[ivfTopKPartitioned]] over an explicit corpus frame carrying
    * `(c_id, c_vec, c_norm, cent_id)` — e.g. the union of a base
    * layout and its streamed deltas ([[graft.streaming.IvfStream]]).
    * The probed-centroid filter is applied to the frame, so each
    * underlying parquet relation still prunes its own `cent_id=`
    * partitions. */
  def ivfTopKFrames(spark: SparkSession, corpus: DataFrame,
      queries: DataFrame, vecCol: String, keyCol: String, k: Int,
      centroids: DataFrame, nprobe: Int): DataFrame = {
    requireIntCentIds(centroids)
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.vec_dot
    // localCheckpoint: consumed by the probe-set collect AND the join
    val probedQ = Similarity.ivfProbe(queries, vecCol, keyCol,
      centroids, nprobe).withColumn("cent_id", col("cent_id").cast("int"))
      .localCheckpoint()
    val probed = probedQ.select(col("cent_id")).distinct()
      .collect().map(_.getInt(0)).sorted
    val c = corpus
      .filter(col("cent_id").isin(probed.toIndexedSeq: _*))
    rankTopK(broadcast(probedQ).join(c, Seq("cent_id"))
      .withColumn("cos",
        vec_dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm"))),
      "cos", k)
  }
}
