package graft.tools
import org.apache.spark.sql.SparkSession
import java.nio.file.Files
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = Files.createTempDirectory("graft-probe-xml")
    (0 until 2000).foreach { i =>
      val items = (0 until 10).map { j =>
        s"""<item id="it_${i}_$j" idx="$j" ref="sec_$i" score="$j.5" active="${j % 2 == 0}">payload $i $j</item>"""
      }.mkString("\n")
      val xml = s"""<?xml version="1.0"?>
        |<doc id="doc_$i"><section id="sec_$i" kind="bench">
        |$items
        |</section></doc>""".stripMargin
      Files.write(dir.resolve(f"bench_$i%04d.xml"), xml.getBytes("UTF-8"))
    }
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $label ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    // warm
    graft.SparkEntry.entry(spark).count()
    (1 to 2).foreach { r =>
      val parsed = graft.ingest.XmlIngest.parse(spark, dir.toString)
      time(s"r$r parse+count") { parsed.count() }
      val t = graft.ingest.XmlIngest.tables(graft.ingest.XmlIngest.parse(spark, dir.toString))
      time(s"r$r tables (nodes count)") { t.nodes.count() }
      val conv = new graft.engine.Converter(spark).convert(dir.toString)
      time(s"r$r full convert xrefs count") { conv.crossReferences.count() }
      time(s"r$r props count (cached)") { conv.properties.count() }
    }
    spark.stop()
    // clean up the generated corpus (2000 files per run otherwise
    // accumulate in /tmp across probe invocations)
    import scala.jdk.CollectionConverters._
    Files.list(dir).iterator().asScala.foreach(Files.delete)
    Files.delete(dir)
  }
}
