package graft.queries

import graft.engine.{Converter, GraphTables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-visible demonstrations of the XML property-graph surface.
  *
  * These queries run the full engine (ingest → adapters → corpus query)
  * over the bundled reference fixtures; they ignore the scale-factor
  * directory argument because their input is XML, which the synthetic
  * star schema cannot supply. The driver therefore records rows-only
  * checks for them (no oracle SQL) — their exact-output verification
  * lives in the ScalaTest golden suites (IngestSpec, AdapterSpec,
  * CorpusSpec).
  */
object XmlQueries {

  /** Bundled copies of the reference's fixtures (FIXTURES.md §A). */
  val fixturesDir: String = sys.env.getOrElse("GRAFT_FIXTURES",
    "/root/repo/src/test/resources/fixtures")

  @volatile private var cached: Option[(SparkSession, GraphTables)] = None

  /** Convert once per session and reuse across the query map. */
  def tables(spark: SparkSession): GraphTables = synchronized {
    cached match {
      case Some((s, t)) if s eq spark => t
      case _ =>
        val t = new Converter(spark, Converter.allAdapters)
          .convert(fixturesDir)
        // localCheckpoint truncates the ingest/adapter lineage so each
        // downstream query plans against flat in-memory tables instead
        // of re-analyzing the whole conversion pipeline
        val materialized = GraphTables(t.documents.localCheckpoint(),
          t.nodes.localCheckpoint(), t.properties.localCheckpoint(),
          t.crossReferences.localCheckpoint())
        cached = Some((spark, materialized))
        materialized
    }
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "xml_count_by_type" ->
      ((s: SparkSession, _: String) => GraphQueries.countByType(tables(s))),
    "xml_search_attribute" ->
      ((s: SparkSession, _: String) =>
        GraphQueries.searchByAttribute(tables(s), "category", "cat_fiction")),
    "xml_node_tree" ->
      ((s: SparkSession, _: String) => GraphQueries.nodeTree(tables(s))),
    "xml_relationship_summary" ->
      ((s: SparkSession, _: String) =>
        GraphQueries.relationshipSummary(tables(s))),
    "xml_most_connected" ->
      ((s: SparkSession, _: String) => GraphQueries.mostConnected(tables(s))),
    "xml_relationship_counts" ->
      ((s: SparkSession, _: String) =>
        GraphQueries.relationshipCounts(tables(s))),
    "xml_ancestors" ->
      ((s: SparkSession, _: String) =>
        GraphQueries.ancestors(tables(s), "reviewer_1")),
    "xml_descendants" ->
      ((s: SparkSession, _: String) =>
        GraphQueries.descendants(tables(s), "books")),
    "xml_bidirectional" ->
      ((s: SparkSession, _: String) =>
        GraphQueries.bidirectionalPairs(tables(s))),
    "xml_statistics" ->
      ((s: SparkSession, _: String) => GraphQueries.statistics(tables(s))),
    "xml_hierarchical_paths" ->
      ((s: SparkSession, _: String) =>
        GraphQueries.hierarchicalPaths(tables(s))))
}
