package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{PartitionedAnn, Retrieval}

/** Decomposition probe for pp_hybrid_at_rest's sf10 cost (round-12
  * verdict #5): time the BM25 leg, its df recount sub-plan, the ANN
  * leg, and the fusion separately over the SAME layouts the gate
  * probes, median-of-3 on a warmed session — plus the probed-bucket
  * row count vs the full postings count, to show what fraction of
  * the corpus the driver corpus's 31-word vocabulary forces the
  * query terms to touch.
  *
  * Usage: `sbt "runMain graft.tools.HybridProbe /tmp/testdata/sf10"`.
  */
object HybridProbe {
  private def med3(body: => Unit): Double = {
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    ts.sorted.apply(1)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "15s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = java.nio.file.Files
      .createTempDirectory("graft-hybridprobe").toString

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val qd = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"), col("text").as("q_text"))
      .localCheckpoint()

    val bmOut = s"$out/bm25"
    Retrieval.writeBm25Index(docs.filter(col("doc_id") >= 10),
      "text", "doc_id", bmOut, buckets = 64)
    val corpus = e.filter(col("vec_id") >= 10)
    val centroids = corpus
      .filter(col("vec_id") % 50 === 0 && col("vec_id") < 20000)
      .select(col("vec_id").as("cent_id"),
        col("embedding").as("cent_vec"))
      .localCheckpoint()
    val ivfOut = s"$out/ivf"
    PartitionedAnn.writeIvfPartitioned(corpus, "embedding", "vec_id",
      centroids, ivfOut)

    def bmLeg() = Retrieval.bm25TopKAtRest(spark, bmOut, qd, "q_id",
      "q_text", k = 20, buckets = 64)
      .select(col("q_id"), col("rank"), col("doc_id"))
    def annLeg() = PartitionedAnn.ivfTopKPartitioned(spark, ivfOut,
      e.filter(col("vec_id") < 3), "embedding", "vec_id", k = 20,
      centroids, nprobe = 2)
      .select(col("q_id"), col("rank"), col("c_id").as("doc_id"))

    // warm
    Retrieval.rrfFuse(bmLeg(), annLeg(), 60, 10).collect()
    val bmS = med3(bmLeg().collect(): Unit)
    val annS = med3(annLeg().collect(): Unit)
    val bothS = med3(
      Retrieval.rrfFuse(bmLeg(), annLeg(), 60, 10).collect(): Unit)
    // the df recount sub-plan alone: pruned postings scan + vocab
    // join + per-term count (one of the TWO reads of the pruned scan)
    val posts = spark.read.parquet(s"$bmOut/postings")
    val qterms = qd.select(explode(array_distinct(
        graft.pipeline.TextAnalysis.tokens(col("q_text")))).as("term"))
      .distinct().localCheckpoint()
    val probed = qterms
      .select(graft.pipeline.Retrieval.termBucket(col("term"), 64)
        .as("tb")).distinct().collect().map(_.getInt(0)).sorted
    def dfOnly() = posts
      .filter(col("term_bucket").isin(probed.toIndexedSeq: _*))
      .join(broadcast(qterms), Seq("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .collect(): Unit
    val dfS = med3(dfOnly())
    val totalPost = posts.count()
    val probedPost = posts
      .filter(col("term_bucket").isin(probed.toIndexedSeq: _*)).count()
    println(s"""{"metric":"hybrid_probe","sf":"$sfDir","bm25_leg_s":${f"$bmS%.2f"},"ann_leg_s":${f"$annS%.2f"},"fused_s":${f"$bothS%.2f"},"df_recount_s":${f"$dfS%.2f"},"probed_buckets":${probed.length},"buckets":64,"probed_postings":$probedPost,"total_postings":$totalPost}""")
    spark.stop()
  }
}
