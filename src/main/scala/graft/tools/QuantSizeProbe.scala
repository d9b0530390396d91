package graft.tools

import graft.pipeline.Similarity
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Measure the at-rest size of the int8-quantized embedding layout
  * ([[Similarity.quantizeInt8]]) against the float32 original — the
  * evidence behind SCALE.md's compression claim. Raw in-memory bytes
  * are 4× smaller by construction (1 vs 4 bytes/dim); what this probe
  * measures is what PARQUET actually does with each layout (dictionary
  * / bit-packing already shrink the float pages, so the honest on-disk
  * ratio is smaller than 4×).
  *
  * Usage: `sbt "runMain graft.tools.QuantSizeProbe [sfDir]"`.
  */
object QuantSizeProbe {
  private def dirBytes(p: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
    walk(new java.io.File(p))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-quant-size")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val out = s"${sys.props("java.io.tmpdir")}/graft_quant_probe"
    val fl = s"$out/float32"
    val i8 = s"$out/int8"
    e.select(col("vec_id"), col("embedding"))
      .repartition(1).write.mode(SaveMode.Overwrite).parquet(fl)
    // at-rest form: weights as tinyint (1 byte/dim pre-encoding); the
    // integer norm^2 rides along so probes never recompute it
    Similarity.quantizeInt8(e, "embedding", "vec_id")
      .select(col("vec_id"), col("q").cast("array<tinyint>").as("q"),
        col("qn"))
      .repartition(1).write.mode(SaveMode.Overwrite).parquet(i8)
    val (fb, ib) = (dirBytes(fl), dirBytes(i8))
    println(f"float32 layout: $fb%d bytes; int8 layout: $ib%d bytes; " +
      f"ratio ${fb.toDouble / ib}%.2f")
    spark.stop()
  }
}
