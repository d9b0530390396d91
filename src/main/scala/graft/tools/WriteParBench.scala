package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{LayoutWrite, Retrieval, Similarity}

/** A/B probe for the base-writer parallelism ceiling (round-12
  * verdict #4): the one-bucket-one-task write
  * (`repartition(col(bucket))`) vs the (bucket, salt) shuffle
  * ([[LayoutWrite.salted]]) that multiplies write tasks by the salt
  * fan-out while `partitionBy(bucket)` still lands per-bucket dirs.
  *
  * Two layouts, both written BOTH ways over the same derived rows:
  *  - BM25 postings at a deliberately low bucket count (16 — below
  *    the core count, the regime where the old form idles cores and
  *    a skewed bucket serializes);
  *  - the IVF float layout over embeddings (≈40 centroids at sf1 —
  *    same regime).
  *
  * Usage: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.WriteParBench
  * /tmp/testdata/sf1"` → one JSON line.
  */
object WriteParBench {
  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
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
      .createTempDirectory("graft-writepar").toString
    def oldWrite(df: DataFrame, bucket: String, dir: String): Unit =
      df.repartition(col(bucket))
        .write.mode("overwrite").partitionBy(bucket).parquet(dir)
    def newWrite(df: DataFrame, bucket: String, key: String,
        dir: String): Unit =
      LayoutWrite.salted(df, bucket, col(key))
        .write.mode("overwrite").partitionBy(bucket).parquet(dir)

    // BM25 postings, 16 term buckets (below core count)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val posts = Retrieval.postingsFromTok(
      Retrieval.tokenized(docs, "text", "doc_id"), buckets = 16)
      .localCheckpoint() // isolate WRITE cost from the derivation
    val postsOld1 = time(oldWrite(posts, "term_bucket", s"$out/po"))
    val postsNew1 = time(newWrite(posts, "term_bucket", "doc_id",
      s"$out/pn"))
    val postsOld = math.min(postsOld1,
      time(oldWrite(posts, "term_bucket", s"$out/po")))
    val postsNew = math.min(postsNew1,
      time(newWrite(posts, "term_bucket", "doc_id", s"$out/pn")))

    // IVF float layout over embeddings
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cents = e.filter(col("vec_id") % 50 === 0 &&
        col("vec_id") < 2000)
      .select(col("vec_id").cast("int").as("cent_id"),
        col("embedding").as("cent_vec"))
    val assigned = Similarity.ivfAssign(e, "embedding", "vec_id", cents)
      .withColumn("cent_id", col("cent_id").cast("int"))
      .localCheckpoint()
    val ivfOld1 = time(oldWrite(assigned, "cent_id", s"$out/io"))
    val ivfNew1 = time(newWrite(assigned, "cent_id", "c_id", s"$out/in"))
    val ivfOld = math.min(ivfOld1, time(oldWrite(assigned, "cent_id",
      s"$out/io")))
    val ivfNew = math.min(ivfNew1, time(newWrite(assigned, "cent_id",
      "c_id", s"$out/in")))

    def files(dir: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(dir))
    }
    println(s"""{"metric":"write_par","sf":"$sfDir","cpus":$cpus,"bm25_postings":{"buckets":16,"old_s":${f"$postsOld%.2f"},"new_s":${f"$postsNew%.2f"},"old_files":${files(s"$out/po")},"new_files":${files(s"$out/pn")}},"ivf":{"old_s":${f"$ivfOld%.2f"},"new_s":${f"$ivfNew%.2f"},"old_files":${files(s"$out/io")},"new_files":${files(s"$out/in")}}}""")
    spark.stop()
  }
}
