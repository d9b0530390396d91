package graft.streaming

import graft.pipeline.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming maintainer for the heavy-hitter count-min sketch
  * ([[TextAnalysis.heavyHitters]]): each micro-batch contributes its
  * own depth×width cell relation (KBs, independent of batch size)
  * under `root/cells/batch=<id>`, and a probe merges all batches
  * cell-wise — exact, because count-min cells are plain sums
  * ([[TextAnalysis.heavyHittersFromCells]] proves the merged sketch
  * bit-identical to a one-shot build).
  *
  * This is the cheapest possible incremental index in the repo: the
  * per-batch write is O(depth·width) rows derived ONLY from the
  * batch's own documents — never from accumulated state — so the
  * `batch=` overwrite is replay-idempotent with no sidecar, no
  * supersede, no staged swap (the append-only case of the round-11
  * overwrite-per-batch rule). Compaction is a single cell-wise sum
  * into a fresh base, should the batch count ever matter — at one
  * KB-sized file per batch it effectively never does.
  */
object CmsStream {

  /** One micro-batch's cells → its own `batch=` partition. The first
    * append also persists the sketch parameters under `root/params`:
    * cells built under different (n, depth, width) are NOT mergeable
    * (different gram streams / bucket spaces sum into nonsense with
    * no error anywhere), so both the writer and [[cells]] validate
    * against the persisted contract and fail pointedly on drift —
    * the events-ts canary discipline applied to this layout. */
  private[graft] def appendBatch(batch: DataFrame, batchId: Long,
      root: String, textCol: String, n: Int, depth: Int,
      width: Int): Unit = {
    // a reused id would REPLACE a committed batch's cells — the merged
    // sketch then undercounts that batch's grams, breaking the
    // never-underestimates bound the lossless prefilter relies on
    IvfStream.requireNoPendingSwap(root, "CmsStream.appendBatch")
    IvfStream.requireFreshBatchId(s"$root/cells", batchId,
      "CmsStream.appendBatch")
    checkOrWriteParams(batch.sparkSession, root, n, depth, width)
    TextAnalysis.cmsCells(batch, textCol, n, depth, width)
      .coalesce(1) // depth·width rows — one file, one dir
      .write.mode("overwrite").parquet(s"$root/cells/batch=$batchId")
  }

  private def checkOrWriteParams(spark: SparkSession, root: String,
      n: Int, depth: Int, width: Int): Unit = {
    val dir = s"$root/params"
    if (new java.io.File(dir, "_SUCCESS").exists()) {
      val r = spark.read.parquet(dir).collect().head
      val (pn, pd, pw) = (r.getAs[Int]("n"), r.getAs[Int]("depth"),
        r.getAs[Int]("width"))
      require((pn, pd, pw) == ((n, depth, width)),
        s"CmsStream: sketch-parameter drift — layout $root was built " +
          s"with (n=$pn, depth=$pd, width=$pw) but this call uses " +
          s"(n=$n, depth=$depth, width=$width); cells from different " +
          "parameters are not mergeable")
    } else {
      import spark.implicits._
      Seq((n, depth, width)).toDF("n", "depth", "width")
        .coalesce(1).write.mode("overwrite").parquet(dir)
    }
  }

  /** The live cell relation (all streamed batches), validated against
    * the layout's persisted sketch parameters; feed to
    * [[TextAnalysis.heavyHittersFromCells]] together with the corpus
    * relation to get the exact over-threshold set. */
  def cells(spark: SparkSession, root: String, n: Int = 2,
      depth: Int = 3, width: Int = 1024): DataFrame = {
    checkOrWriteParams(spark, root, n, depth, width)
    spark.read.parquet(s"$root/cells")
      .select(col("i"), col("b"), col("cnt"))
  }

  /** Maintain the sketch over a parquet document directory as files
    * arrive. */
  def run(spark: SparkSession, inputDir: String, root: String,
      textCol: String = "text", n: Int = 2, depth: Int = 3,
      width: Int = 1024, maxFilesPerTrigger: Int = 1,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val schema = spark.read.parquet(inputDir).schema
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", s"$root/_checkpoint")
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        appendBatch(b, id, root, textCol, n, depth, width)
      }
      .start()
  }
}
