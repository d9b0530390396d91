package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.Skew

/** Decomposition probe for the q29_salted_join drift (round-12
  * verdict #2): time the plain join, the salted join at several salt
  * counts, and the two salting ingredients in isolation (the
  * per-fact-row xxhash64 and the dim replication), each
  * median-of-3 on a warmed session — pins whether the drift is the
  * salting overhead itself, one ingredient, or session noise.
  *
  * Usage: `sbt "runMain graft.tools.SkewProbe /root/testdata/sf0.1"`.
  */
object SkewProbe {
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

    val fact = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_extendedprice"))
    val dim = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"),
        col("o_orderpriority"))
    def agg(df: org.apache.spark.sql.DataFrame): Unit = {
      df.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("s"))
        .collect(): Unit
    }
    // warm: footers, codegen, shuffle services
    agg(fact.join(dim, Seq("l_orderkey")))
    val plain = med3(agg(fact.join(dim, Seq("l_orderkey"))))
    val salted8 = med3(agg(Skew.saltedJoin(fact, dim, "l_orderkey", 8)))
    val salted4 = med3(agg(Skew.saltedJoin(fact, dim, "l_orderkey", 4)))
    val salted2 = med3(agg(Skew.saltedJoin(fact, dim, "l_orderkey", 2)))
    // ingredient 1: the per-fact-row hash alone (scan + hash + agg)
    val hashOnly = med3 {
      fact.select(pmod(xxhash64(col("l_orderkey"),
          col("l_extendedprice")), lit(8)).cast("int").as("s"))
        .agg(sum(col("s"))).collect(): Unit
    }
    // ingredient 2: the dim replication alone
    val explodeOnly = med3 {
      dim.withColumn("__salt", explode(sequence(lit(0), lit(7))))
        .agg(count(lit(1))).collect(): Unit
    }
    println(s"""{"metric":"skew_probe","sf":"$sfDir","plain_s":${f"$plain%.3f"},"salted8_s":${f"$salted8%.3f"},"salted4_s":${f"$salted4%.3f"},"salted2_s":${f"$salted2%.3f"},"hash_only_s":${f"$hashOnly%.3f"},"dim_explode_s":${f"$explodeOnly%.3f"}}""")
    spark.stop()
  }
}
