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
  private def r3(c: Column): Column =
    round(c.cast(org.apache.spark.sql.types.DecimalType(28, 10)), 3)
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
      nprobe: Int = 2): DataFrame = {
    val nd = nativeDot(corpus) _
    val nn = nativeNorm(corpus) _
    val cent = broadcast(corpus.filter(centroidPred)
      .select(col(keyCol).as("cent_id"), col(vecCol).as("cent_vec"),
        nn(col(vecCol)).as("cent_norm")))
    // an empty centroid set would silently produce zero results (every
    // cluster join is empty) — fail fast instead; probe only the key
    // column so the check job scans one column and computes no norms
    require(corpus.filter(centroidPred).select(col(keyCol))
      .limit(1).collect().nonEmpty,
      "ivfTopK: centroidPred selects no corpus vectors")
    def scored(df: DataFrame, vec: String, nrm: String): DataFrame =
      df.crossJoin(cent)
        .withColumn("ccos",
          nd(col(vec), col("cent_vec")) / (col(nrm) * col("cent_norm")))
        // a null cosine (null/degenerate embedding) can rank neither
        // here nor meaningfully downstream — drop it in BOTH branches
        // so they agree
        .filter(col("ccos").isNotNull)
        .drop("cent_vec", "cent_norm")
    // argmax (keep=1) as a min_by aggregate: partially combines
    // map-side, so the corpus-sized assignment never shuffles the full
    // (vector × centroid) score relation the window form would sort.
    // min over (-ccos, cent_id) == row_number(ccos desc, cent_id asc)
    // for any key type (the key itself is never negated).
    def nearest(df: DataFrame, id: String, vec: String, nrm: String,
        keep: Int): DataFrame =
      if (keep == 1) {
        val payload = df.columns.filterNot(_ == id) :+ "cent_id"
        scored(df, vec, nrm)
          .groupBy(col(id))
          .agg(min_by(struct(payload.map(col).toIndexedSeq: _*),
            struct(-col("ccos"), col("cent_id"))).as("w"))
          .select((col(id) +: payload.map(c => col(s"w.$c"))).toIndexedSeq: _*)
      } else
        scored(df, vec, nrm)
          .withColumn("crk", row_number().over(
            Window.partitionBy(col(id))
              .orderBy(col("ccos").desc, col("cent_id"))))
          .filter(col("crk") <= keep)
          .drop("ccos", "crk")
    val assigned = nearest(
      corpus.select(col(keyCol).as("c_id"), col(vecCol).as("c_vec"),
        nn(col(vecCol)).as("c_norm")),
      "c_id", "c_vec", "c_norm", keep = 1)
    val probed = nearest(
      queries.select(col(keyCol).as("q_id"), col(vecCol).as("q_vec"),
        nn(col(vecCol)).as("q_norm")),
      "q_id", "q_vec", "q_norm", keep = nprobe)
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
}
