package graft.tools

import graft.queries.PipelineQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Evidence probe for the partitioned-ANN pruning claim (SCALE.md):
  * builds the SRP- and IVF-partitioned layouts at a given sf dir, runs
  * the partitioned top-k queries, and prints partitions/files/bytes
  * READ (from the executed scan's metrics) against the layout's totals
  * (from the filesystem). Run:
  * `sbt "runMain graft.tools.AnnPruneProbe /root/testdata/sf0.1"`. */
object AnnPruneProbe {

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] =
    p.collect { case s: FileSourceScanExec => Seq(s)
                case q: QueryStageExec => scans(q.plan) }.flatten

  private def report(name: String, df: DataFrame, layoutDir: String): Unit = {
    df.collect()
    val fin = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case o => o
    }
    val scan = scans(fin)
      .find(_.relation.location.rootPaths
        .exists(_.toString.contains(layoutDir)))
      .getOrElse(sys.error(s"$name: no scan over $layoutDir in plan"))
    val dirs = Option(new java.io.File(layoutDir).listFiles()).get
      .filter(f => f.isDirectory && f.getName.contains("="))
    val files = dirs.flatMap(_.listFiles()
      .filter(_.getName.endsWith(".parquet")))
    def m(key: String): Long =
      scan.metrics.get(key).map(_.value).getOrElse(-1L)
    println(s"[annprune] $name: partitionsRead=${m("numPartitions")}" +
      s"/${dirs.length} filesRead=${m("numFiles")}/${files.length} " +
      s"bytesRead=${m("filesSize")}/${files.map(_.length).sum}")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    report("ann_lsh_partitioned",
      PipelineQueries.annLshPartitioned(spark, sfDir),
      PipelineQueries.annLayoutDir(sfDir, "srp_p4_d64"))
    report("ann_ivf_partitioned",
      PipelineQueries.annIvfPartitioned(spark, sfDir),
      PipelineQueries.annLayoutDir(sfDir, "ivf_mod50"))
    spark.stop()
  }
}
