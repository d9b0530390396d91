package graft

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of one or more SparkEntry
  * queries — the plan-audit loop the round process runs after each
  * operator lands (`runMain graft.ExplainQuery <sfDir> <name,name>`).
  * Executes nothing beyond analysis unless `SPARK_GRAFT_EXPLAIN_RUN`
  * is set (then runs the query first so AQE's final plan prints). */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .appName("graft-explain")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      println(s"===== $n =====")
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN_RUN")) {
        // execute THE SAME queryExecution instance (df.count() builds a
        // new one, so AQE never finalized the plan being printed and
        // ReusedExchange/AQEShuffleRead nodes were invisible — the
        // round-19 audit found every "executed" dump still said
        // isFinalPlan=false). toRdd.foreach drives the exact plan
        // instance with no driver-side collection.
        df.queryExecution.toRdd.foreach(_ => ())
        println(df.queryExecution.executedPlan.toString.take(120000))
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
