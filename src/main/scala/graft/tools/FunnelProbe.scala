package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnosis harness for the ev_funnel vs ev_funnel_sparse
  * cost gap: times the funnel over the full event set, the filtered
  * set (middle step empty), and a filtered set whose steps all
  * populate — isolating whether the extra cost is the FILTER or the
  * EMPTY-step plan shape. */
object FunnelProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/testdata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "15s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val events = spark.read.parquet(s"$dir/events.parquet")
    events.count() // warm
    def time(label: String)(f: => Unit): Unit = (1 to 3).foreach { r =>
      System.gc()
      val t0 = System.nanoTime(); f
      println(f"[probe] $label r$r ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val steps = Seq("view", "click", "purchase")
    time("full")(
      graft.streaming.EventStream.funnelReport(events, steps).count())
    time("filtered, click empty")(
      graft.streaming.EventStream.funnelReport(
        events.filter(col("event_type") =!= "click"), steps).count())
    time("filtered, all populated")(
      graft.streaming.EventStream.funnelReport(
        events.filter(col("event_type") =!= "error"), steps).count())
    spark.stop()
  }
}
