package graft.relationships

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-based edges (the examples-dir extension,
  * /root/reference/examples/relationship_adapters/semantic_adapter.rb):
  * over the document's nodes with non-null content,
  *  - `same_type`: every ordered pair of distinct nodes sharing a
  *    `node_type` (groups of ≥2), confidence 0.6 (:28-50);
  *  - `content_similar`: every ordered pair of distinct nodes whose
  *    word-set Jaccard similarity ≥ 0.7, confidence = similarity × 0.5
  *    (:52-85); words are `\w+` runs of the lowercased content,
  *    deduplicated (:77-78); empty word sets never match (:79-82).
  *
  * Spark shape: tokenization is one projection
  * (`array_distinct(split(lower(content)))`); both pair families are
  * document-scoped self-joins. The similarity join is quadratic per
  * document by definition (the reference's O(n²) loop, SURVEY.md J8) —
  * correct at fixture scale and for modest documents. For corpus-scale
  * all-pairs similarity use the LSH-banded
  * [[graft.pipeline.Dedup.minHashCandidates]] family, which buckets
  * before pairing instead of cross-joining.
  */
object SemanticAdapter extends RelationshipAdapter {
  val name = "semantic"

  /** `\w+` word-set of lowercased content, deduplicated. */
  def wordSet(content: Column): Column =
    array_distinct(filter(split(lower(content), "\\W+"), _ =!= ""))

  def detect(nodes: DataFrame, properties: DataFrame): DataFrame = {
    val n = nodes
      .filter(col("content").isNotNull)
      .select(col("document_id"), col("id"), col("node_type"),
        wordSet(col("content")).as("words"))

    val a = n.select(col("document_id"), col("id").as("a_id"),
      col("node_type").as("a_type"), col("words").as("a_words"))
    val b = n.select(col("document_id"), col("id").as("b_id"),
      col("node_type").as("b_type"), col("words").as("b_words"))

    val sameType = a.join(b,
        Seq("document_id"))
      .filter(col("a_type") === col("b_type") && col("a_id") =!= col("b_id"))
      .select(
        col("a_id").as("source_node_id"),
        col("b_id").as("target_node_id"),
        lit("same_type").as("reference_type"),
        lit(null).cast("string").as("attribute_name"),
        lit(0.6).as("confidence"))

    val sim = size(array_intersect(col("a_words"), col("b_words")))
      .cast("double") /
      size(array_union(col("a_words"), col("b_words")))
    val contentSimilar = a.join(b, Seq("document_id"))
      .filter(col("a_id") =!= col("b_id") &&
        size(col("a_words")) > 0 && size(col("b_words")) > 0)
      .withColumn("sim", sim)
      .filter(col("sim") >= 0.7)
      .select(
        col("a_id").as("source_node_id"),
        col("b_id").as("target_node_id"),
        lit("content_similar").as("reference_type"),
        lit(null).cast("string").as("attribute_name"),
        (col("sim") * 0.5).as("confidence"))

    sameType.unionByName(contentSimilar)
  }
}
