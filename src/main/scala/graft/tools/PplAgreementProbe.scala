package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.TextAnalysis

/** Measure the approx-vs-exact tertile agreement slack behind
  * ta_ppl_tertiles_approx's ≥99% assert (round-16 ADVICE: the gate
  * must not sit on its own boundary). Replicates the gate's scored
  * relation, computes the percentile_approx cutoffs exactly as the
  * gate does (pinned 32-partition doc_id hash, accuracy 10⁴), and
  * prints the exact agreement fraction between cutoff routing and
  * NTILE(3) — the recorded number goes to BASELINE.md.
  *
  * Usage: `runMain graft.tools.PplAgreementProbe <sfDir>` */
object PplAgreementProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .appName("graft-ppl-agreement-probe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (g2, lamT, contT) = TextAnalysis.ngramLmKnModel(
      TextAnalysis.ngramLmCounts(
        docs.filter(col("doc_id") % 3 =!= 0), "text"))
    val scored = TextAnalysis.ngramLmScoreKn(docs, g2, lamT, contT,
        "text", "doc_id")
      .withColumnRenamed("key", "doc_id")
      .repartition(32, col("doc_id"))
      .localCheckpoint()
    val cutsRow = scored.agg(percentile_approx(col("avg_ll"),
      array(lit(2.0 / 3.0), lit(1.0 / 3.0)), lit(10000)).as("cuts"))
      .collect()(0).getSeq[Double](0)
    val (cHi, cLo) = (cutsRow(0), cutsRow(1))
    val r = scored
      .withColumn("nt", ntile(3).over(
        Window.orderBy(col("avg_ll").desc, col("doc_id"))))
      .withColumn("bucket",
        when(col("nt") === 1, lit("head"))
          .when(col("nt") === 2, lit("middle"))
          .otherwise(lit("tail")))
      .withColumn("bucket_approx",
        when(col("avg_ll") >= lit(cHi), lit("head"))
          .when(col("avg_ll") >= lit(cLo), lit("middle"))
          .otherwise(lit("tail")))
      .agg(count(lit(1)).as("n"),
        sum(when(col("bucket_approx") === col("bucket"), 1L)
          .otherwise(0L)).as("agree"))
      .collect()(0)
    val (n, agree) = (r.getLong(0), r.getLong(1))
    println(s"""{"sf_dir":"$dir","n_docs":$n,"n_agree":$agree,""" +
      s""""agreement_pct":${agree.toDouble * 100.0 / n}}""")
    spark.stop()
  }
}
