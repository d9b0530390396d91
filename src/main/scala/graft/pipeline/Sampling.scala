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
}
