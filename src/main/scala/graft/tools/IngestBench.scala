package graft.tools

import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Path}

/** Synthetic XML bench corpus shared by [[graft.Bench]] (fixed 2000
  * docs, part of the per-round bench line) and [[IngestBench]]
  * (variable size, the ingest-scaling curve in SCALE.md). Each file
  * carries 12 identified nodes and ~40 attributes. */
object BenchCorpus {
  def generate(nDocs: Int): Path = {
    val dir = Files.createTempDirectory("graft-bench-xml")
    (0 until nDocs).foreach { i =>
      val items = (0 until 10).map { j =>
        s"""<item id="it_${i}_$j" idx="$j" ref="sec_$i" score="$j.5" active="${j % 2 == 0}">payload $i $j</item>"""
      }.mkString("\n")
      val xml =
        s"""<?xml version="1.0"?>
           |<doc id="doc_$i"><section id="sec_$i" kind="bench">
           |$items
           |</section></doc>""".stripMargin
      Files.write(dir.resolve(f"bench_$i%05d.xml"), xml.getBytes("UTF-8"))
    }
    dir
  }
}

/** Ingest-scaling probe: time XML directory → full property-graph
  * conversion (core adapters) at a given corpus size, reporting
  * docs/sec. Two points (2k and 20k docs) pin whether per-file cost
  * stays flat as the corpus grows 10× — the claim behind SCALE.md's
  * ingest section (per-file parse tasks, no shared writer).
  *
  * Usage: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.IngestBench
  * 20000"` → one JSON line.
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(20000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ingest-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = BenchCorpus.generate(nDocs)
    // JVM/codegen warmup on a tiny slice so the timed run measures
    // steady-state conversion, as the per-round bench does
    val warm = BenchCorpus.generate(50)
    new graft.engine.Converter(spark).convert(warm.toString)
      .crossReferences.count()
    val t0 = System.nanoTime()
    val tables = new graft.engine.Converter(spark).convert(dir.toString)
    val nRefs = tables.crossReferences.count()
    val nProps = tables.properties.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"ingest_docs_per_sec","value":${nDocs / sec}%.1f,"unit":"docs/sec","docs":$nDocs,"sec":$sec%.2f,"cross_refs":$nRefs,"properties":$nProps,"cpus":$cpus}""")
    spark.stop()
  }
}
