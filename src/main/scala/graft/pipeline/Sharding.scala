package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic training-shard writer + manifest — the last step of
  * a curation pipeline: the selected corpus is laid out as N stable
  * shards and a manifest records per-shard invariants so any later
  * reader (a trainer, an auditor, a resumed job) can check it got
  * exactly the bytes the pipeline wrote.
  *
  * Scale shape: assignment is a scan-local key expression (no salt,
  * no global sort — shard identity must be a pure function of the
  * row, or a re-run re-shards differently); the write is ONE shuffle
  * onto the shard key; the manifest is one map-side-combinable
  * aggregate over the read-back layout. All manifest fields are
  * order-independent (counts, sums, min/max) so the manifest is
  * invariant to executor scheduling — the determinism the gate's
  * oracle replay proves.
  */
object Sharding {

  /** Write `docs` as a `shard=`-partitioned layout: shard =
    * key mod nShards — pure, portable, replayable (a hash-mod swap
    * is a one-line change with the same plan shape). One file per
    * shard dir via the repartition, the
    * [[PartitionedAnn.writeIvfPartitioned]] discipline. */
  def writeSharded(docs: DataFrame, keyCol: String, outDir: String,
      nShards: Int): Unit = {
    require(nShards >= 1, "writeSharded: nShards must be positive")
    LayoutWrite.salted(
      docs.withColumn("shard",
        pmod(col(keyCol), lit(nShards.toLong)).cast("int")),
      "shard", col(keyCol))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
  }

  /** [[writeSharded]] as the BASE of an incremental layout: writes
    * `root/base` AND stamps `root/params` with the shard count, so
    * every later [[appendBatch]] validates against the base's
    * contract rather than the first append stamping its own — a base
    * at n_shards=8 plus appends at 16 would otherwise pass silently
    * and mix two incompatible shardings. */
  def writeShardedBase(docs: DataFrame, keyCol: String, root: String,
      nShards: Int): Unit = {
    // params FIRST: a crash between the writes must leave the
    // contract stamped with the base absent (readers fail loudly on
    // the missing base) — the other order leaves a contract-less base
    // whose first append would silently stamp its own nShards, the
    // exact window this method exists to close
    writeParams(docs.sparkSession, root, nShards)
    writeSharded(docs, keyCol, s"$root/base", nShards)
  }

  private def writeParams(spark: SparkSession, root: String,
      nShards: Int): Unit = {
    import spark.implicits._
    Seq(nShards).toDF("n_shards")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/params")
  }

  /** Persist-or-validate the layout's shard count: a batch appended
    * with a DIFFERENT nShards than the base would silently mix two
    * incompatible shardings (the same doc key landing in different
    * `shard=` dirs per batch) — fail pointedly instead. A base
    * written via [[writeShardedBase]] owns the contract; a legacy
    * base without params gets it stamped by the first append. */
  private def checkOrWriteParams(spark: SparkSession, root: String,
      nShards: Int): Unit = {
    val dir = s"$root/params"
    if (new java.io.File(dir, "_SUCCESS").exists()) {
      val stored = spark.read.parquet(dir).collect().head
        .getAs[Int]("n_shards")
      require(stored == nShards,
        s"Sharding: shard-count drift — layout $root was built with " +
          s"n_shards=$stored but this call uses n_shards=$nShards")
    } else writeParams(spark, root, nShards)
  }

  /** The per-shard manifest of a [[writeSharded]] layout, computed
    * from the READ-BACK files (so a hash-green gate proves the
    * round trip, not just the plan): document count, exact token
    * total, md5 min/max as a content fingerprint, and the exact key
    * sum. Every field is an order-independent integer/string
    * aggregate — no floats anywhere. */
  def manifest(spark: SparkSession, layoutDir: String, keyCol: String,
      textCol: String): DataFrame =
    manifestOf(spark.read.parquet(layoutDir), keyCol, textCol)

  private def manifestOf(df: DataFrame, keyCol: String,
      textCol: String): DataFrame =
    df.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextAnalysis.tokens(col(textCol))).cast("long"))
          .as("n_tokens"),
        min(md5(col(textCol))).as("min_md5"),
        max(md5(col(textCol))).as("max_md5"),
        sum(col(keyCol)).as("sum_key"))
      .orderBy(col("shard"))

  /** Append one ingest batch to an incrementally-maintained sharded
    * layout: the batch lands under `root/delta/batch=N/shard=M/`,
    * OVERWRITING exactly its own batch directory — a crash-replayed
    * batch rewrites the identical files (assignment is a pure
    * function of the row), so the append is replay-idempotent with
    * no sidecar state (the append-only case of the round-11
    * overwrite-per-batch rule; supersede machinery only becomes
    * necessary once re-crawled keys must evict old rows, which is
    * the BM25 index's problem, not the shard log's). */
  def appendBatch(docs: DataFrame, batchId: Long, root: String,
      keyCol: String, nShards: Int): Unit = {
    require(nShards >= 1, "appendBatch: nShards must be positive")
    // a reused id would overwrite a committed batch's shard files
    // with a different batch's rows — documents silently vanish from
    // the training layout
    graft.streaming.IvfStream.requireFreshBatchId(s"$root/delta",
      batchId, "Sharding.appendBatch")
    checkOrWriteParams(docs.sparkSession, root, nShards)
    docs
      .withColumn("shard",
        pmod(col(keyCol), lit(nShards.toLong)).cast("int"))
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard")
      .parquet(s"$root/delta/batch=$batchId")
  }

  /** [[manifest]] over the LIVE layout (base ∪ streamed deltas).
    * Every manifest field is a sum/count/min/max, so the incremental
    * layout's manifest is bit-identical to a full rebuild's — the
    * gate proves it against the rebuild oracle verbatim. */
  def manifestIncremental(spark: SparkSession, root: String,
      keyCol: String, textCol: String): DataFrame = {
    val base = spark.read.parquet(s"$root/base")
    val live =
      try base.unionByName(spark.read.parquet(s"$root/delta")
        .select(base.columns.map(col).toIndexedSeq: _*))
      catch {
        // no batch appended yet — the base alone is the layout; any
        // OTHER analysis failure (half-written delta, schema drift)
        // must surface, not silently degrade to base-only
        case e: org.apache.spark.sql.AnalysisException
            if graft.streaming.IvfStream.missingPath(e) => base
      }
    manifestOf(live, keyCol, textCol)
  }
}
