package graft.tools

import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence probe for the MinHash-LSH parameter choice (SCALE.md):
  * sweeps (numHashes, bands) and reports, against the exact
  * shingle-set Jaccard ground truth, the recall at the 0.7 near-dup
  * threshold and the candidate-set size each setting pays for it.
  * Run: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.LshTuneBench
  * /root/testdata/sf0.1"`. */
object LshTuneBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val nDocs = df.count()

    // exact ground truth: Jaccard over distinct 3-shingle sets, via
    // the same inverted-index shape as Dedup.jaccardPairs (threshold
    // applied after intersection counting, so it is exact)
    val sh = Dedup.shingles(df, "text", "doc_id").distinct()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val truth = sh.select(col("doc_id").as("key_a"), col("shingle"))
      .join(sh.select(col("doc_id").as("key_b"), col("shingle")),
        Seq("shingle"))
      .filter(col("key_a") < col("key_b"))
      .groupBy(col("key_a"), col("key_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("key_a"), col("sz").as("sz_a")),
        Seq("key_a"))
      .join(sizes.select(col("doc_id").as("key_b"), col("sz").as("sz_b")),
        Seq("key_b"))
      .withColumn("jac", col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jac") >= 0.7)
      .select(col("key_a"), col("key_b"))
      .cache()
    val truthN = truth.count()
    println(s"[lshtune] docs=$nDocs truePairs(jaccard>=0.7)=$truthN " +
      s"allPairs=${nDocs * (nDocs - 1) / 2}")

    for ((nh, bands) <- Seq((8, 4), (16, 4), (16, 8))) {
      val cand = Dedup.minHashCandidates(df, "text", "doc_id", nh, bands)
        .cache()
      val candN = cand.count()
      val hits = cand.join(truth, Seq("key_a", "key_b")).count()
      val recall = if (truthN == 0) 1.0 else hits.toDouble / truthN
      println(f"[lshtune] numHashes=$nh%-3d bands=$bands%-2d " +
        f"rowsPerBand=${nh / bands} candidates=$candN%-6d " +
        f"recall@0.7=$recall%.3f " +
        f"candFrac=${candN.toDouble / (nDocs * (nDocs - 1) / 2)}%.2e")
      cand.unpersist()
    }
    spark.stop()
  }
}
