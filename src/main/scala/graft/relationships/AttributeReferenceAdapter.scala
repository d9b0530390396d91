package graft.relationships

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-expression building blocks shared by the attribute-driven
  * adapters (the reference duplicates these between
  * attribute_reference_adapter.rb:52-78 and
  * multi_reference_adapter.rb:67-89). All pure Catalyst — they inline
  * into whole-stage codegen. */
private[relationships] object RefPatterns {

  /** Value looks like an identifier: simple ident, `prefix_123`, or
    * hyphenated (attribute_reference_adapter.rb:55-60). */
  def idPattern(v: Column): Column =
    v.rlike("^[a-zA-Z_][a-zA-Z0-9_]*$") ||
      v.rlike("^[a-zA-Z]+_\\d+$") ||
      v.rlike("^[a-zA-Z0-9]+(-[a-zA-Z0-9]+)*$")

  /** `prefix_suffix` shape that earns the +0.05/+0.1 value boost
    * (attribute_reference_adapter.rb:75; multi_reference_adapter.rb:85). */
  def prefixedValue(v: Column): Column = v.rlike("^[a-zA-Z]+_[a-zA-Z0-9]+$")

  /** lower(name) contains any indicator substring. */
  def nameContainsAny(name: Column, indicators: Seq[String]): Column =
    indicators.map(i => lower(name).contains(i)).reduce(_ || _)

  /** min(1.0, base + nameBoost?name + valueBoost?value) — the shared
    * confidence shape with the reference's exact constants. */
  def confidence(base: Double, nameBoost: Double, valueBoost: Double,
      indicators: Seq[String], name: Column, value: Column): Column =
    least(lit(1.0),
      lit(base) +
        when(nameContainsAny(name, indicators), nameBoost).otherwise(0.0) +
        when(prefixedValue(value), valueBoost).otherwise(0.0))
}

/** Single attribute-value → node-id reference edges.
  *
  * Semantics from /root/reference/lib/relationships/adapters/
  * attribute_reference_adapter.rb: for every property whose whole value
  * matches an identifier pattern (:52-63) *and* equals the id of a node
  * in the same document (:22-30,43), emit one `attribute_reference`
  * edge with confidence 0.8, +0.15 when the property name contains a
  * reference indicator, +0.05 when the value is `prefix_suffix`-shaped,
  * clamped to 1.0 (:65-78).
  *
  * Spark shape: the reference's per-document Ruby `Set#include?` probe
  * becomes one left-semi join of properties against node ids keyed by
  * (document_id, id) — a single shuffle at corpus scale, no per-document
  * loop (SURVEY.md J2).
  */
object AttributeReferenceAdapter extends RelationshipAdapter {
  val name = "attribute_reference"

  val indicators: Seq[String] =
    Seq("id", "ref", "reference", "parent", "child", "target", "source",
      "link")

  def detect(nodes: DataFrame, properties: DataFrame): DataFrame = {
    val candidates = properties
      .filter(col("property_value").isNotNull &&
        col("property_value") =!= "" &&
        RefPatterns.idPattern(col("property_value")))
    val ids = nodes.select(col("document_id"), col("id"))
    candidates
      .join(ids,
        candidates("document_id") === ids("document_id") &&
          candidates("property_value") === ids("id"),
        "left_semi")
      .select(
        col("node_id").as("source_node_id"),
        col("property_value").as("target_node_id"),
        lit("attribute_reference").as("reference_type"),
        col("property_name").as("attribute_name"),
        RefPatterns.confidence(0.8, 0.15, 0.05, indicators,
          col("property_name"), col("property_value")).as("confidence"))
  }
}

/** Delimited multi-reference edges (the examples-dir extension,
  * /root/reference/examples/relationship_adapters/
  * multi_reference_adapter.rb): property values containing a comma or
  * whitespace (:36) are split on `[,\s]+` (:52), and every non-empty
  * token that matches the identifier patterns *and* resolves to a node
  * id of the same document emits a `multi_attribute_reference` edge with
  * confidence min(1.0, 0.6 +0.2[name hints plural refs] +0.1[token is
  * prefix_suffix]) × 0.8 (:58,78-89).
  *
  * Spark shape: `explode(split(...))` then the same document-scoped
  * semi-join as [[AttributeReferenceAdapter]] (SURVEY.md J6). */
object MultiReferenceAdapter extends RelationshipAdapter {
  val name = "multi_reference"

  val indicators: Seq[String] =
    Seq("ids", "refs", "references", "targets", "sources", "links")

  def detect(nodes: DataFrame, properties: DataFrame): DataFrame = {
    val tokens = properties
      .filter(col("property_value").isNotNull &&
        col("property_value").rlike("[,\\s]"))
      .select(col("node_id"), col("property_name"), col("document_id"),
        explode(split(col("property_value"), "[,\\s]+")).as("ref_id"))
      .filter(col("ref_id") =!= "" && RefPatterns.idPattern(col("ref_id")))
    val ids = nodes.select(col("document_id"), col("id"))
    tokens
      .join(ids,
        tokens("document_id") === ids("document_id") &&
          tokens("ref_id") === ids("id"),
        "left_semi")
      .select(
        col("node_id").as("source_node_id"),
        col("ref_id").as("target_node_id"),
        lit("multi_attribute_reference").as("reference_type"),
        col("property_name").as("attribute_name"),
        (RefPatterns.confidence(0.6, 0.2, 0.1, indicators,
          col("property_name"), col("ref_id")) * 0.8).as("confidence"))
  }
}
