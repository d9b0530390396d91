package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: a SparkSession configured the way the engine
  * expects — custom functions injected, nanos-timestamp parquet
  * readable, UTC, AQE on — plus the idiomatic imports documented in
  * README. Existing sessions are reused (Spark's getOrCreate
  * semantics); the custom functions are registered either way. */
object Graft {

  def session(master: String = "local[*]",
      shufflePartitions: Option[Int] = None): SparkSession = {
    val builder = SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    shufflePartitions.foreach(n =>
      builder.config("spark.sql.shuffle.partitions", n))
    val spark = builder.getOrCreate()
    // getOrCreate may have returned a pre-existing session whose
    // extensions differ — temp-function registration covers that path
    graft.functions.GraftFunctions.register(spark)
    spark
  }
}
