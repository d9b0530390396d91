package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session — Spark
  * reuses the active session across `getOrCreate` calls). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val fixturesDir: String = SparkSpec.fixturesDir
  def sf(dir: String): String = s"/root/testdata/$dir"
}

object SparkSpec {
  val fixturesDir: String =
    sys.env.getOrElse("GRAFT_FIXTURES", "src/test/resources/fixtures")

  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      // managed-table layouts (the bucketed-join suite) belong under
      // the JVM tmpdir, not an untracked ./spark-warehouse in the
      // repo root
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft_test_warehouse")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
