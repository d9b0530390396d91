package graft.model

import org.apache.spark.sql.types._

/** Relational property-graph model of an XML corpus.
  *
  * Mirrors the reference's fixed physical schema
  * (/root/reference/db/migrate/001_create_base_schema.rb:6-48) as Spark
  * `StructType`s: documents, nodes (tree via `parent_id` adjacency),
  * node_properties (EAV with inferred scalar type tags), and
  * cross_references (derived edge table). There is no runtime migration
  * machinery — the schema is a compile-time constant (SURVEY.md §1.4).
  */
object Schemas {

  /** One row per ingested XML file. `id` is the filename minus `.xml`
    * (document_parser.rb:10); PK semantics = last write wins on `id`.
    * `file_hash` exists in the reference schema
    * (001_create_base_schema.rb:14) but no reference write path ever
    * populates it (database_writer.rb:47-49 omits the column); graft
    * fills it with the md5 hex of the file bytes — column-for-column
    * schema parity, strictly more useful content. */
  val documents: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("filename", StringType, nullable = false),
    StructField("file_hash", StringType, nullable = false),
    StructField("file_size", LongType, nullable = false),
    StructField("parsed_at", TimestampType, nullable = false)
  ))

  /** One row per XML element carrying an `id` attribute
    * (document_parser.rb:26). `parent_id` is the immediate parent
    * element's `id` attribute, null when the parent is unidentified or
    * the element is the root; `position` is the 0-based index among the
    * parent's *element* children; `content` is the concatenation of all
    * descendant text (whitespace-only text nodes dropped), stripped;
    * `xpath` is the element's canonical path with positional predicates
    * only where same-named siblings exist. */
  val nodes: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("node_type", StringType, nullable = false),
    StructField("document_id", StringType, nullable = false),
    StructField("parent_id", StringType, nullable = true),
    StructField("position", IntegerType, nullable = false),
    StructField("content", StringType, nullable = true),
    StructField("xpath", StringType, nullable = false),
    StructField("created_at", TimestampType, nullable = false)
  ))

  /** EAV attribute store: one row per (element, attribute), the `id`
    * attribute excluded (document_parser.rb:57). `data_type` is the
    * inferred logical scalar tag of §1.2 — values stay strings. PK
    * semantics = last write wins on (node_id, property_name).
    * `document_id` is denormalized here (the reference reaches it by
    * joining through `nodes`, e.g. attribute_reference_adapter.rb:13-19)
    * so that document-scoped adapters avoid a shuffle join at scale. */
  val nodeProperties: StructType = StructType(Seq(
    StructField("node_id", StringType, nullable = false),
    StructField("property_name", StringType, nullable = false),
    StructField("property_value", StringType, nullable = true),
    StructField("data_type", StringType, nullable = false),
    StructField("document_id", StringType, nullable = false)
  ))

  /** Derived edge table produced by relationship adapters
    * (001_create_base_schema.rb:40-48). `target_node_id` is *not* a
    * foreign key — dangling targets are queryable as broken references.
    * `source_file` is written as NULL by the reference's both write
    * paths (relationships/manager.rb:35-44) and is kept for schema
    * parity. */
  val crossReferences: StructType = StructType(Seq(
    StructField("source_node_id", StringType, nullable = false),
    StructField("target_node_id", StringType, nullable = false),
    StructField("reference_type", StringType, nullable = false),
    StructField("attribute_name", StringType, nullable = true),
    StructField("confidence", DoubleType, nullable = false),
    StructField("source_file", StringType, nullable = true)
  ))
}

/** Typed row mirrors of [[Schemas]] for `Dataset[T]` use. `ordinal` on
  * [[RawNode]]/[[RawProperty]] is the within-file document-order index —
  * it does not survive into the public tables but makes duplicate-id
  * last-write-wins deterministic under parallelism (SURVEY.md §7.4). */
final case class DocumentRow(id: String, filename: String,
    file_hash: String, file_size: Long)

final case class RawNode(
    id: String,
    node_type: String,
    document_id: String,
    parent_id: Option[String],
    position: Int,
    content: Option[String],
    xpath: String,
    ordinal: Long)

final case class RawProperty(
    node_id: String,
    property_name: String,
    property_value: String,
    data_type: String,
    document_id: String,
    ordinal: Long)

/** One parsed XML file: the per-file intermediate of the ingest stage
  * (the Spark analog of the reference's per-document hash IR,
  * document_parser.rb:31-36). */
final case class ParsedDocument(
    document: DocumentRow,
    nodes: Seq[RawNode],
    properties: Seq[RawProperty])

final case class CrossReference(
    source_node_id: String,
    target_node_id: String,
    reference_type: String,
    attribute_name: Option[String],
    confidence: Double,
    source_file: Option[String])
