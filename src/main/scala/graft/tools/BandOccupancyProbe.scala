package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Band-bucket occupancy histogram for the leakage-safe split
  * (round-16 verdict #4): pp_split_decontam's decade-2 exponent came
  * out 0.86 — the only near-linear round-16 entry — and the builder's
  * explanation (gen_scale tiles each document ~100×, so at sf10
  * virtually the whole corpus collides into hot LSH band buckets) was
  * asserted, not measured. This probe measures it: the split's exact
  * band frame (same MinHash parameters as
  * [[Dedup.leakageSafeSplit]]), reduced to
  *
  *  - bucket-count / occupancy percentiles (p50/p90/p99/max) over
  *    `(band, band_hash)` buckets,
  *  - the fraction of TRAIN rows landing in a val-hit bucket — the
  *    semi-join's selectivity, which is what actually drives the
  *    near-leak row count,
  *  - distinct near-leaked train docs.
  *
  * If the tiling explanation holds, occupancy percentiles grow ~10×
  * per decade while the bucket COUNT stays ~flat (tiled copies hash
  * to the same buckets), and train-hit fraction approaches 1 — join
  * stays keyed, the output itself is what grows. If instead bucket
  * counts grow and occupancy stays flat, the 0.86 would be a plan
  * defect and the standard mitigation (bucket-size cap + exact
  * verify) applies.
  *
  * Usage: `sbt "runMain graft.tools.BandOccupancyProbe <sfDir>"` —
  * prints one JSON line; run at sf0.1 / sf1 / sf10 and compare.
  */
object BandOccupancyProbe {
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

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val isVal = pmod(col("doc_id"), lit(10)) === 0
    val bands = Dedup.lshBands(
      Dedup.minHashSignatures(d, "text", "doc_id", 8), "doc_id", 8, 4)
      .localCheckpoint() // consumed by three aggregations below
    val occ = bands.groupBy(col("band"), col("band_hash"))
      .agg(count(lit(1)).as("n"),
        sum(when(isVal, 1L).otherwise(0L)).as("n_val"),
        sum(when(!isVal, 1L).otherwise(0L)).as("n_train"))
      .localCheckpoint()
    val stats = occ.agg(
      count(lit(1)).as("buckets"),
      sum(col("n")).as("rows"),
      expr("percentile(n, 0.5)").as("p50"),
      expr("percentile(n, 0.9)").as("p90"),
      expr("percentile(n, 0.99)").as("p99"),
      max(col("n")).as("max"),
      // the semi-join's work: train rows in buckets a val row hits
      sum(when(col("n_val") > 0, col("n_train")).otherwise(0L))
        .as("train_rows_hit"),
      sum(col("n_train")).as("train_rows")).head()
    val nearLeaked = bands.filter(!isVal)
      .join(bands.filter(isVal)
          .select(col("band"), col("band_hash")).distinct(),
        Seq("band", "band_hash"), "left_semi")
      .select(col("doc_id")).distinct().count()
    val nDocs = d.count()
    println(
      s"""{"probe":"band_occupancy","sf":"$sfDir","docs":$nDocs,""" +
      s""""buckets":${stats.getAs[Long]("buckets")},""" +
      s""""band_rows":${stats.getAs[Long]("rows")},""" +
      s""""occ_p50":${stats.getAs[Double]("p50")},""" +
      s""""occ_p90":${stats.getAs[Double]("p90")},""" +
      s""""occ_p99":${stats.getAs[Double]("p99")},""" +
      s""""occ_max":${stats.getAs[Long]("max")},""" +
      s""""train_rows_hit":${stats.getAs[Long]("train_rows_hit")},""" +
      s""""train_rows":${stats.getAs[Long]("train_rows")},""" +
      s""""near_leaked_docs":$nearLeaked}""")
    spark.stop()
  }
}
