package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the lakehouse layout technique
  * for MULTI-dimensional pruning from ONE clustering key: interleave
  * the bits of per-dimension cell indices so that records close in
  * every dimension land close on a single linear key. Partitioning
  * (or sorting files) by a Z-key prefix then lets a 2-D box query
  * prune to the partitions whose Z-range intersects the box — the
  * thing neither `partitionBy(date)` nor `partitionBy(price)` alone
  * can give you, and at 100 TB the difference between scanning a
  * full date partition and scanning the (date × price) cells the
  * query actually touches.
  *
  * Everything here is exact integer arithmetic (cell indices are
  * clamped `floor((x − lo) / step)` over values ≪ 2^52, the
  * interleave is shifts and masks), so the DuckDB oracle replays it
  * bit-for-bit and the pruned at-rest probe can share the plain
  * WHERE-box oracle verbatim — the losslessness proof that the curve
  * + bucket enumeration drop no rows.
  */
object ZOrder {

  /** Clamped cell index of `x` on a fixed `[lo, lo + cells·step)`
    * grid — fixed LITERAL bounds, so batches/engines agree and
    * out-of-range values saturate into the edge cells instead of
    * corrupting the interleave. */
  def cellIndex(x: Column, lo: Double, step: Double,
      bits: Int): Column = {
    require(bits >= 1 && bits <= 16, s"cellIndex: 1..16 bits, got $bits")
    val cells = (1 << bits) - 1
    greatest(lit(0L), least(lit(cells.toLong),
      floor((x.cast("double") - lit(lo)) / lit(step)).cast("long")))
  }

  /** Morton interleave of two `bits`-wide cell indices: bit `i` of
    * `a` lands at position `2i`, of `b` at `2i+1`. A fixed fold of
    * shifts and masks — codegen-friendly, no UDF. */
  def interleave2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 16, s"interleave2: 1..16 bits, got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)),
          2 * i + 1))
    }
  }

  /** The SQL twin of [[interleave2]] over column expressions `a`,
    * `b` — shared by every oracle that replays a Z-value. */
  def interleave2Sql(a: String, b: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($a >> $i) & 1) << ${2 * i})",
        s"((($b >> $i) & 1) << ${2 * i + 1})")
    }.mkString("(", " | ", ")")

  /** De-interleave: the (a, b) cell pair a Z-value encodes. Driver
    * side only (bucket enumeration). */
  def deinterleave2(z: Long, bits: Int): (Long, Long) = {
    var a = 0L; var b = 0L
    for (i <- 0 until bits) {
      a |= ((z >> (2 * i)) & 1L) << i
      b |= ((z >> (2 * i + 1)) & 1L) << i
    }
    (a, b)
  }

  /** The Z-buckets (prefix cells of `bits` per dimension) whose box
    * intersects `[aLoCell, aHiCell] × [bLoCell, bHiCell]` — the
    * literal partition-filter set for a 2-D box query against a
    * `zb=`-partitioned layout. Enumerates the 4^bits buckets on the
    * driver (a layout constant, e.g. 64 for bits=3), never touches
    * data. */
  def bucketsForBox(bits: Int, cellBits: Int, aLoCell: Long,
      aHiCell: Long, bLoCell: Long, bHiCell: Long): Seq[Int] = {
    require(cellBits > bits,
      s"bucketsForBox: cellBits ($cellBits) must exceed bucket bits ($bits)")
    val sub = 1L << (cellBits - bits) // fine cells per bucket cell
    (0 until (1 << (2 * bits))).filter { zb =>
      val (aTop, bTop) = deinterleave2(zb.toLong, bits)
      val (aLo, aHi) = (aTop * sub, aTop * sub + sub - 1)
      val (bLo, bHi) = (bTop * sub, bTop * sub + sub - 1)
      aHi >= aLoCell && aLo <= aHiCell && bHi >= bLoCell && bLo <= bHiCell
    }
  }

  /** Write `df` partitioned by the Z-bucket of two cell-index
    * columns: `zb` = interleave of each cell's top `bucketBits`.
    * One shuffle clustered on `zb` ⇒ one file per bucket directory
    * (the small-files rule every graft layout writer follows). */
  def writeZOrdered(df: DataFrame, aCell: Column, bCell: Column,
      cellBits: Int, bucketBits: Int, outDir: String): Unit = {
    require(bucketBits >= 1 && bucketBits < cellBits,
      s"writeZOrdered: need 1 <= bucketBits < cellBits")
    df.withColumn("zb",
      interleave2(shiftright(aCell, cellBits - bucketBits),
        shiftright(bCell, cellBits - bucketBits), bucketBits)
        .cast("int"))
      .repartition(col("zb"))
      .write.mode("overwrite").partitionBy("zb")
      .parquet(s"$outDir/rows")
    new java.io.File(outDir, "_SUCCESS").createNewFile(): Unit
  }
}
