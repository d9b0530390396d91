package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.Validation
import graft.pipeline.Validation.Rule

/** Streaming maintainer for the declarative data-quality monitor
  * ([[Validation]]) — continuous validation of an arriving corpus
  * without ever rescanning history. Every algebraic rule
  * (Completeness / Conformance / MeanBound) reduces to additive
  * numerators, so each micro-batch persists ONE aggregation row under
  * `root/partials/batch=<id>` and the live report folds the partials
  * cell-wise through the SAME ratio arithmetic as the one-shot
  * [[Validation.check]] — bit-identical to checking the union of all
  * batches ([[CmsStream]]'s additive-cells argument applied to the
  * validation tier). [[Validation.UniqueKey]] rules are rejected at
  * the boundary: a distinct count does not fold from per-batch
  * partials, and silently double-counting cross-batch duplicates
  * would be a wrong report with no error anywhere.
  *
  * Layout contract: append-only additive partials (each batch's row
  * derives ONLY from the batch — replay-idempotent overwrite, reused
  * ids rejected). The RULE SET is the contract: every partial is
  * stamped with the caller's `rulesetId`, and the report fails
  * pointedly when any partial was streamed under a different id —
  * numerators from two rule sets sum into nonsense otherwise. */
object DqStream {

  /** One micro-batch's additive numerators → its own `batch=`
    * partition. */
  private[graft] def appendBatch(batch: DataFrame, batchId: Long,
      root: String, rules: Seq[Rule], rulesetId: String): Unit = {
    IvfStream.requireNoPendingSwap(root, "DqStream.appendBatch")
    IvfStream.requireFreshBatchId(s"$root/partials", batchId,
      "DqStream.appendBatch")
    Validation.partialNumerators(batch, rules)
      .withColumn("ruleset_id", lit(rulesetId))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$root/partials/batch=$batchId")
  }

  /** The live validation report over everything streamed so far —
    * identical schema and values to running [[Validation.check]] on
    * the union of all appended batches. Fails pointedly when nothing
    * has been streamed (a report over zero rows is a contract
    * question the caller must answer, not an all-NaN table) or when
    * partials were streamed under a different rule set. */
  def report(spark: SparkSession, root: String, rules: Seq[Rule],
      rulesetId: String): DataFrame = {
    val partials =
      try spark.read.parquet(s"$root/partials")
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if IvfStream.missingPath(e) =>
          throw new IllegalStateException(
            s"DqStream.report: no partials under $root — stream at " +
              "least one batch before asking for a report")
      }
    val foreign = partials.filter(col("ruleset_id") =!= rulesetId)
      .select(col("ruleset_id")).limit(1).collect()
    require(foreign.isEmpty,
      s"DqStream.report: partials under $root carry ruleset_id " +
        s"'${foreign.headOption.map(_.getString(0)).orNull}' but " +
        s"this report folds rules '$rulesetId' — numerators from " +
        "two rule sets sum into nonsense; clear the partials tree " +
        "when changing the rule set")
    val folded = partials.agg(sum(col("n")).as("n"),
      rules.map(r => sum(col(s"s_${r.name}")).as(s"s_${r.name}")): _*)
    Validation.assemble(
      Validation.metricsFromFolded(folded, rules), rules)
  }

  /** Monitor a parquet directory as files arrive. */
  def run(spark: SparkSession, inputDir: String, root: String,
      checkpointDir: String, rules: Seq[Rule], rulesetId: String,
      maxFilesPerTrigger: Int = 1,
      trigger: Trigger = Trigger.AvailableNow(),
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : StreamingQuery = {
    val inputSchema =
      schema.getOrElse(spark.read.parquet(inputDir).schema)
    spark.readStream
      .schema(inputSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        appendBatch(b, id, root, rules, rulesetId)
      }
      .start()
  }
}
