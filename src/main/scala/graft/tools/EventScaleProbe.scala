package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolates the super-linear ev_session_native / ev_interval_join
  * timings the round-10 sf10 probe surfaced (24 s / 10.6 s at 10 M
  * events vs 0.84 s for the lag-gap sessionization moving the same
  * rows). Times each event-tier form solo on `args(0)` (default
  * sf0.1) so the slow stage can be attributed: native session_window
  * vs the window/lag form vs the interval join, plus dissected
  * variants of the native path. */
object EventScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming.EventStream
    val events = spark.read.parquet(s"$dir/events.parquet")
    def time(label: String)(f: => Long): Unit = {
      val rs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = rs.map(_._1).sorted.apply(1)
      println(f"[probe] $label%-34s ${med}%7.2f s (n=${rs.head._2})")
    }
    // warm
    events.count()
    time("scan+normalize count") {
      EventStream.normalize(events).filter(col("ts_sec") > 0).count()
    }
    time("sessionizeBatch (lag-gap)") {
      EventStream.sessionizeBatch(
        EventStream.normalize(events).toDF()).count()
    }
    time("sessionWindows (native)") {
      EventStream.sessionWindows(events).count()
    }
    time("session_window no-partial-agg") {
      // same primitive, pre-aggregation disabled via a post-scan
      // barrier: does the partial HashAggregate over the struct key
      // dominate?
      val timed = EventStream.withEventTime(events)
        .repartition(col("user_id")).localCheckpoint(true)
      timed.groupBy(session_window(col("event_ts"), "30 minutes"),
          col("user_id"))
        .agg(count(lit(1))).count()
    }
    time("purchaseClickJoin (interval)") {
      EventStream.purchaseClickJoin(events).count()
    }
    time("interval join via asof-style window") {
      // linear alternative: union-tag + running collect over user
      val e = events.filter(col("event_type").isin("click", "purchase"))
        .select(col("event_id"), col("user_id"),
          EventStream.tsMicrosCol(events).as("ts_us"),
          when(col("event_type") === "purchase", 1).otherwise(0)
            .as("kind"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("clicks",
          collect_list(when(col("kind") === 0,
            struct(col("ts_us").as("c_ts"), col("event_id").as("c_id"))))
            .over(w))
        .filter(col("kind") === 1)
        .select(col("event_id"), col("user_id"), col("ts_us"),
          explode(col("clicks")).as("c"))
        .filter(col("c.c_ts") >= col("ts_us") - lit(1800000000L) &&
          col("c.c_ts") <= col("ts_us"))
        .count()
    }
    spark.stop()
  }
}
