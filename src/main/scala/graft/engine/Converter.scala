package graft.engine

import graft.ingest.XmlIngest
import graft.relationships._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The four public tables of the property-graph model. */
final case class GraphTables(documents: DataFrame, nodes: DataFrame,
    properties: DataFrame, crossReferences: DataFrame) {

  /** Register SQL-accessible temp views (the working version of the
    * reference's vestigial `create_views`, main.rb:100-107). Views
    * register in the session that owns these DataFrames. */
  def createViews(): Unit = {
    documents.createOrReplaceTempView("documents")
    nodes.createOrReplaceTempView("nodes")
    properties.createOrReplaceTempView("node_properties")
    crossReferences.createOrReplaceTempView("cross_references")
  }

  /** One view per node_type (`<type>_nodes`) — the per-type views the
    * reference enumerates but leaves commented out (main.rb:100-107).
    * Type names are sanitized to identifier characters; types whose
    * sanitized names collide (e.g. `my-item` / `my.item`) share one
    * view covering all of them, so no rows become unreachable.
    * Returns the distinct view names. */
  def createNodeTypeViews(): Seq[String] = {
    import org.apache.spark.sql.functions.col
    val types = nodes.select(col("node_type")).distinct()
      .collect().map(_.getString(0)).filter(_ != null)
    types.groupBy(t =>
        t.replaceAll("[^A-Za-z0-9_]", "_").toLowerCase + "_nodes")
      .toSeq.sortBy(_._1)
      .map { case (name, ts) =>
        nodes.filter(col("node_type").isin(ts.toIndexedSeq: _*))
          .createOrReplaceTempView(name)
        name
      }
  }

  /** Persist as partitioned parquet — the columnar replacement for the
    * SQLite file (no sqlite-jdbc resolvable offline; capability, not
    * byte format, is the target — SURVEY.md S6). Nodes cluster by
    * `node_type` so type-filtered scans prune files at read time. */
  def write(outDir: String): Unit = {
    documents.write.mode("overwrite").parquet(s"$outDir/documents")
    nodes.write.mode("overwrite").partitionBy("node_type")
      .parquet(s"$outDir/nodes")
    properties.write.mode("overwrite").parquet(s"$outDir/node_properties")
    crossReferences.write.mode("overwrite")
      .parquet(s"$outDir/cross_references")
  }
}

object GraphTables {
  /** Release any caches backing these tables (the converter caches
    * nodes/properties for adapter reuse; call this when done with a
    * conversion in a long-lived session). */
  def unpersist(t: GraphTables): Unit = {
    t.documents.unpersist()
    t.nodes.unpersist()
    t.properties.unpersist()
    t.crossReferences.unpersist()
  }

  /** Reload previously written tables. */
  def read(spark: SparkSession, dir: String): GraphTables = GraphTables(
    spark.read.parquet(s"$dir/documents"),
    spark.read.parquet(s"$dir/nodes"),
    spark.read.parquet(s"$dir/node_properties"),
    spark.read.parquet(s"$dir/cross_references"))
}

/** End-to-end XML directory → property-graph tables.
  *
  * The Spark-native counterpart of the reference's `XMLToSQLite` CLI
  * object (/root/reference/main.rb:27-57): scan → parse → explode →
  * dedup replaces the fiber pipeline; the adapter list is the same
  * configuration surface the reference exposes
  * (main.rb:109-115, examples/custom_main.rb:10-42), defaulting to the
  * two core adapters. The whole run is two Spark jobs (ingest,
  * relationship derivation) — transactions, WAL, queues and VACUUM all
  * dissolve into immutable DataFrames + atomic job commits
  * (SURVEY.md §3.1, §4.2).
  */
class Converter(
    spark: SparkSession,
    adapters: Seq[RelationshipAdapter] = Converter.coreAdapters,
    detectRelationships: Boolean = true,
    parseFailures: Option[org.apache.spark.util.LongAccumulator] = None) {

  def convert(inputDir: String): GraphTables = {
    val t = XmlIngest.ingest(spark, inputDir, parseFailures)
    // Ingest tables feed every adapter and the final write; cache once.
    val nodes = t.nodes.cache()
    val properties = t.properties.cache()
    val xrefs =
      if (detectRelationships)
        RelationshipAdapter.detectAll(adapters, nodes, properties)
      else
        RelationshipAdapter.detectAll(Nil, nodes, properties)
    GraphTables(t.documents, nodes, properties, xrefs)
  }

  def convertAndWrite(inputDir: String, outDir: String): GraphTables = {
    val tables = convert(inputDir)
    tables.write(outDir)
    tables
  }

  /** Re-conversion into an existing database — the reference's
    * incremental path: a second run against a db that already holds a
    * conversion (main.rb opens the SQLite file in place; every write is
    * INSERT OR REPLACE, database_writer.rb:47-59, with foreign_keys OFF
    * during the write phase, main.rb:87). Merge semantics:
    *
    *  - documents / nodes / properties: the new batch wins on each
    *    table's replace keys — nodes on PK `id` and then
    *    UNIQUE(parent_id, position), so a patch node can EVICT a
    *    previous batch's node that occupied its sibling slot
    *    (001_create_base_schema.rb:29).
    *  - cross_references: previous rows are never replaced (the table's
    *    synthetic autoincrement PK means INSERT OR REPLACE never
    *    conflicts); detection re-runs over ALL documents against the
    *    merged final state (relationship_processor.rb:20-39 iterates
    *    the whole documents table) and appends. The engine keeps set
    *    semantics — a re-detected edge equal to a previous row dedups —
    *    where the reference accumulates byte-identical rows under fresh
    *    synthetic ids, an autoincrement artifact its own corpus queries
    *    paper over with DISTINCT.
    *
    * This is the one path that can strand a reference: a previous
    * batch's edge whose target node the new batch evicted keeps its
    * row. That is by design — the schema deliberately puts no FK on
    * target_node_id (001_create_base_schema.rb:40-48) and ships a
    * broken-references health check for exactly this state
    * (sql_queries.md:193-199). Detection input properties are scoped to
    * surviving nodes (the reference joins node_properties to nodes,
    * attribute_reference_adapter.rb:14-19), while the STORED properties
    * table keeps orphans of evicted nodes, exactly as SQLite does with
    * foreign_keys OFF during writes. */
  def upsert(prev: GraphTables, inputDir: String): GraphTables = {
    import org.apache.spark.sql.functions._
    val t2 = XmlIngest.ingest(spark, inputDir, parseFailures)

    // Last-write-wins across batches with the same max_by shape as
    // ingest's intra-batch dedup (XmlIngest.tables): batch rank is the
    // arrival order — the new conversion strictly follows the old one.
    def lastBatchWins(old: DataFrame, fresh: DataFrame,
        keys: Seq[org.apache.spark.sql.Column]): DataFrame = {
      val u = old.withColumn("batch", lit(0))
        .unionByName(fresh.withColumn("batch", lit(1)))
      val payload = struct(old.columns.map(col).toIndexedSeq: _*)
      u.groupBy(keys: _*).agg(max_by(payload, col("batch")).as("w"))
        .select(col("w.*"))
    }

    val documents = lastBatchWins(prev.documents, t2.documents,
      Seq(col("id")))
    val byId = lastBatchWins(prev.nodes, t2.nodes, Seq(col("id")))
    // UNIQUE(parent_id, position) with SQLite's multi-NULL exemption:
    // null-parent rows each keep their own slot (third key = id). The
    // slot pass re-ranks the id-survivors by batch: rows whose id came
    // from the new conversion win their slots, evicting previous-batch
    // occupants — the reference's INSERT OR REPLACE eviction.
    val nodes = lastBatchWins(
      byId.join(t2.nodes.select(col("id")), Seq("id"), "left_anti"),
      byId.join(t2.nodes.select(col("id")), Seq("id"), "left_semi"),
      Seq(col("parent_id"), col("position"),
        when(col("parent_id").isNull, col("id"))))
      .cache()
    val properties = lastBatchWins(prev.properties, t2.properties,
      Seq(col("node_id"), col("property_name"))).cache()

    // Detection sees only surviving nodes' properties (np JOIN nodes);
    // the stored table above keeps orphans like the reference does.
    val liveProps = properties.join(nodes.select(col("id")),
      properties("node_id") === nodes("id"), "left_semi")
    val fresh =
      if (detectRelationships)
        RelationshipAdapter.detectAll(adapters, nodes, liveProps)
      else
        RelationshipAdapter.detectAll(Nil, nodes, liveProps)
    val xrefs = prev.crossReferences.unionByName(fresh).distinct()
    GraphTables(documents, nodes, properties, xrefs)
  }
}

object Converter {
  /** The pair registered by default in the reference (main.rb:109-115). */
  def coreAdapters: Seq[RelationshipAdapter] =
    Seq(StructuralAdapter, AttributeReferenceAdapter)

  /** Everything, including the examples-dir adapters. */
  def allAdapters: Seq[RelationshipAdapter] =
    Seq(StructuralAdapter, AttributeReferenceAdapter,
      MultiReferenceAdapter, SemanticAdapter)

  /** The corpus-scale lineup: the quadratic content-similarity scan is
    * swapped for the LSH sketch-then-verify variant (same edge schema
    * and confidence math, bounded join fan-out); the exact `same_type`
    * pass stays ([[SameTypeAdapter]]), so the relationship schema is
    * identical to [[allAdapters]] — only content_similar recall is
    * approximate. */
  def scaleAdapters: Seq[RelationshipAdapter] =
    Seq(StructuralAdapter, AttributeReferenceAdapter,
      MultiReferenceAdapter, SameTypeAdapter, SemanticLshAdapter)
}
