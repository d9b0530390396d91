package graft.tools

import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Path}

/** Generator for the many-tiny-files listing corpora: the SAME nFiles
  * one-element XML files written twice — once flat (every file in one
  * directory) and once split across `nParts` `date=pNNN/` partition
  * directories. The partition tag is also embedded in the flat
  * filenames so a flat "slice" is expressible as a filename glob. */
object ListingCorpus {
  def generate(nFiles: Int, nParts: Int): (Path, Path) = {
    val flat = Files.createTempDirectory("graft-list-flat")
    val part = Files.createTempDirectory("graft-list-part")
    (0 until nParts).foreach(p =>
      Files.createDirectories(part.resolve(f"date=p$p%03d")))
    // partition-parallel generation (Java parallel stream — file
    // creation is fs-bound)
    java.util.stream.IntStream.range(0, nParts).parallel().forEach { p =>
      val sub = part.resolve(f"date=p$p%03d")
      var i = p
      while (i < nFiles) {
        val xml = s"""<?xml version="1.0"?><d id="d_$i"/>"""
        Files.write(flat.resolve(f"bench_$i%07d_p$p%03d.xml"),
          xml.getBytes("UTF-8"))
        Files.write(sub.resolve(f"bench_$i%07d.xml"),
          xml.getBytes("UTF-8"))
        i += nParts
      }
    }
    (flat, part)
  }
}

/** Driver-side file-listing probe for the many-millions-of-files
  * ingest question (SCALE.md "Ingest": `InMemoryFileIndex` handles
  * millions of files; beyond that, partitioned input dirs). Measures,
  * over the same corpus written flat and date-partitioned:
  *
  *  1. full listing+count of every file (both layouts — the flat
  *     layout works, it just makes every job pay for the whole
  *     listing),
  *  2. a one-partition slice read: on the flat layout this is a
  *     `pathGlobFilter` — the driver still LISTS all nFiles and then
  *     discards names; on the partitioned layout it is a directory
  *     path — the driver lists nFiles/nParts entries and never sees
  *     the rest.
  *
  * The slice numbers are the claim: partitioned input dirs bound both
  * the driver's listing time and its in-memory file index by the
  * slice actually read, which is what keeps a 100 M-file corpus
  * drivable when a flat listing would not be.
  *
  * Usage: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ListingBench
  * [nFiles] [nParts]"` → one JSON line.
  */
object ListingBench {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(200000)
    val nParts = args.drop(1).headOption.map(_.toInt).getOrElse(250)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-listing-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (flat, part) = ListingCorpus.generate(nFiles, nParts)

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def listCount(path: String, glob: Option[String]): Long = {
      val r = spark.read.format("binaryFile")
      glob.foreach(g => r.option("pathGlobFilter", g))
      r.load(path).select("path").count()
    }

    // warm both trees' dentry/inode caches with one untimed listing
    // pass each BEFORE any timed measurement: previously the flat tree
    // was listed first on a cold fs cache and the partitioned tree
    // after the JVM+cache warmup it provided, biasing the comparison
    // toward the partitioned layout. All four timed measurements below
    // are now warm-cache and mutually comparable.
    listCount(flat.toString, None)
    listCount(part.toString, None)
    val (tFlatFull, nFlatFull) = timed(listCount(flat.toString, None))
    val (tPartFull, nPartFull) = timed(listCount(part.toString, None))
    val slice = f"p${nParts / 2}%03d"
    val (tFlatSlice, nFlatSlice) =
      timed(listCount(flat.toString, Some(s"*_$slice.xml")))
    val (tPartSlice, nPartSlice) =
      timed(listCount(s"$part/date=$slice", None))
    println(f"""{"metric":"listing","files":$nFiles,"parts":$nParts,"cpus":$cpus,"flat_full_s":$tFlatFull%.2f,"part_full_s":$tPartFull%.2f,"flat_slice_s":$tFlatSlice%.2f,"part_slice_s":$tPartSlice%.2f,"flat_full_n":$nFlatFull,"part_full_n":$nPartFull,"flat_slice_n":$nFlatSlice,"part_slice_n":$nPartSlice}""")
    spark.stop()
  }
}
