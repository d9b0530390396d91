package graft.tools

import graft.queries.Skew
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Evidence probe for the skew-mitigation claim (SCALE.md): the gate's
  * q29 runs `Skew.saltedJoin` on *uniform* TPC-H keys, which measures
  * pure salting overhead — this bench builds the input salting exists
  * for (one key owning 30% of a 20M-row fact) and times the same join
  * three ways: plain shuffle join, AQE skew-split, explicit salting.
  * Broadcast is disabled throughout: with a broadcastable dim there is
  * no shuffle and no skew problem — salting is for the big⋈big case.
  * Run: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.SkewBench"`. */
object SkewBench {

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val nKeys = 10000
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // force the shuffle join skew actually hurts; broadcast would
      // sidestep the experiment (and is the right fix when it fits)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // zipf-ish synthetic: key 0 owns 30% of rows, the rest spread
    // uniformly over nKeys-1 cold keys; deterministic (id-derived)
    val hot = (n * 3 / 10)
    val fact = spark.range(n).select(
      when(col("id") < hot, lit(0L))
        .otherwise(pmod(xxhash64(col("id")), lit(nKeys - 1)) + 1)
        .as("key"),
      (col("id") % 97).as("v"))
    val dim = spark.range(nKeys).select(col("id").as("key"),
      (col("id") * 2).as("payload"))

    def checksum(df: DataFrame): (Long, Long) = {
      val r = df.agg(sum(col("v")), sum(col("payload"))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    def bench(tag: String)(df: => DataFrame): (Long, Long) = {
      var sums: (Long, Long) = (0L, 0L)
      val ts = Seq.fill(3) {
        val t0 = System.nanoTime()
        sums = checksum(df)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[skewbench] $tag%-10s median=${median(ts)}%.2fs " +
        f"runs=${ts.map(t => f"$t%.2f").mkString(",")} sums=$sums")
      sums
    }

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val plain = bench("plain")(fact.join(dim, "key"))

    // thresholds lowered so AQE classifies the hot partition as skewed
    // at this (local-test) scale; at cluster scale the defaults fire
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    val aqe = bench("aqe_skew")(fact.join(dim, "key"))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val salted = bench("salted")(
      Skew.saltedJoin(fact, dim, "key", numSalts = cpus.toInt))

    require(plain == aqe && plain == salted,
      s"checksums diverge: plain=$plain aqe=$aqe salted=$salted")
    println("[skewbench] checksums identical across all three strategies")
    spark.stop()
  }
}
