package graft.streaming

import graft.ingest.XmlIngest
import graft.model.ParsedDocument
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import java.nio.charset.StandardCharsets.UTF_8

/** Continuous conversion: "process XML files as they appear".
  *
  * The reference's async fiber pipeline (async_processor.rb:24-44) is
  * a one-shot run; its natural streaming upgrade is Structured
  * Streaming's file source discovering new files per micro-batch. The
  * whole-file read uses the text source in `wholetext` mode (the file
  * streaming source does not support binaryFile), so each micro-batch
  * row is one complete XML document; the batch then flows through the
  * exact same parse → explode → dedup stages as the batch ingest and
  * appends to the parquet tables via `foreachBatch`.
  *
  * Append semantics: last-write-wins holds within a micro-batch (same
  * window dedup as batch ingest); across batches the parquet tables
  * accumulate one version per batch and readers resolve keys with the
  * same deterministic rule — or a periodic compaction job rewrites
  * them (the streaming-upsert pattern for immutable object stores). */
object XmlStreamIngest {

  /** Streaming per-file parse: one [[ParsedDocument]] per discovered
    * file. */
  def parsedStream(spark: SparkSession, inputDir: String): Dataset[ParsedDocument] = {
    import spark.implicits._
    spark.readStream
      .format("text")
      .option("wholetext", "true")
      .option("pathGlobFilter", "*.xml")
      .option("recursiveFileLookup", "true")
      .load(inputDir)
      .select(input_file_name().as("path"), col("value"))
      .as[(String, String)]
      .mapPartitions(_.flatMap { case (path, content) =>
        val bytes = content.getBytes(UTF_8)
        XmlIngest.parseOne(path, bytes.length.toLong, bytes)
      })
  }

  /** Run the continuous conversion into `outDir` (parquet append per
    * micro-batch; rows carry their micro-batch id in `_batch` so
    * [[compact]] can resolve cross-batch keys). */
  def run(spark: SparkSession, inputDir: String, outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    parsedStream(spark, inputDir).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[ParsedDocument], batchId: Long) =>
        if (!batch.isEmpty) {
          val t = XmlIngest.tables(batch)
          Seq(
            t.documents -> "documents",
            t.nodes -> "nodes",
            t.properties -> "node_properties"
          ).foreach { case (df, name) =>
            df.withColumn("_batch", lit(batchId))
              .write.mode("append").parquet(s"$outDir/$name")
          }
        }
        ()
      }
      .start()

  /** Cross-batch key resolution: within a batch the tables are already
    * deduplicated; across batches the highest `_batch` wins per key
    * (INSERT OR REPLACE arrival order). Writes clean tables (no
    * `_batch`) under `outDir/compacted` — the periodic-compaction leg
    * of the streaming-upsert pattern for immutable stores. */
  def compact(spark: SparkSession, outDir: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    def lastPerKey(name: String, keys: Seq[String]): Unit = {
      val df = spark.read.parquet(s"$outDir/$name")
      df.withColumn("_rn", row_number().over(
          Window.partitionBy(keys.map(col): _*)
            .orderBy(col("_batch").desc)))
        .filter(col("_rn") === 1)
        .drop("_rn", "_batch")
        .write.mode("overwrite").parquet(s"$outDir/compacted/$name")
    }
    lastPerKey("documents", Seq("id"))
    lastPerKey("nodes", Seq("id"))
    lastPerKey("node_properties", Seq("node_id", "property_name"))
  }
}
