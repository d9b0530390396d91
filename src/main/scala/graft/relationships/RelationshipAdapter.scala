package graft.relationships

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pluggable relationship derivation — the reference's sole extension
  * point (/root/reference/lib/relationships/adapter.rb:5-21,
  * detector.rb:19-21).
  *
  * The reference adapter is row-at-a-time Ruby called once per document
  * over a read-only connection; the Spark-native analog is a
  * whole-relation transformer: `(nodes, properties) => edges`. Document
  * scoping happens inside each adapter with `document_id` join/window
  * keys instead of an outer per-document loop, so one adapter invocation
  * covers the entire corpus in a single distributed job
  * (SURVEY.md §2.10).
  *
  * Output must conform to [[graft.model.Schemas.crossReferences]] minus
  * `source_file` (never populated by the reference either —
  * relationships/manager.rb:35-44 vs adapter.rb:12-20).
  */
trait RelationshipAdapter extends Serializable {
  def name: String

  /** Derive edges for the whole corpus. */
  def detect(nodes: DataFrame, properties: DataFrame): DataFrame
}

object RelationshipAdapter {
  val edgeColumns: Seq[String] = Seq("source_node_id", "target_node_id",
    "reference_type", "attribute_name", "confidence")

  /** Run every adapter and concatenate the edge sets (the manager's
    * concat-then-store loop, relationships/manager.rb:20-45). The
    * reference upserts on a surrogate autoincrement key, so no
    * deduplication happens — duplicates across adapters are preserved. */
  def detectAll(adapters: Seq[RelationshipAdapter], nodes: DataFrame,
      properties: DataFrame): DataFrame = {
    val spark = nodes.sparkSession
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      graft.model.Schemas.crossReferences)
    adapters
      .map(_.detect(nodes, properties)
        .select(edgeColumns.map(col): _*)
        .withColumn("source_file", lit(null).cast("string")))
      .foldLeft(empty)(_ unionByName _)
  }
}
