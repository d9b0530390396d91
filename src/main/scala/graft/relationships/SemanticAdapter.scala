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

    val sameType = SameTypeAdapter.detect(nodes, properties)

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

/** The `same_type` half of [[SemanticAdapter]] on its own
  * (semantic_adapter.rb:28-50): every ordered pair of distinct
  * content-bearing nodes sharing a `node_type` within a document,
  * confidence 0.6. Pair counts grow with the square of the per-type
  * group size but involve no similarity math, so this pass needs no
  * sketching — it joins on the (document_id, node_type) group key and
  * partitions cleanly at scale. Factored out so the scale lineup
  * ([[Converter.scaleAdapters]]) keeps the full edge family while
  * swapping only the quadratic content-similarity scan for LSH. */
object SameTypeAdapter extends RelationshipAdapter {
  val name = "same_type"

  def detect(nodes: DataFrame, properties: DataFrame): DataFrame = {
    val n = nodes
      .filter(col("content").isNotNull)
      .select(col("document_id"), col("id"), col("node_type"))
    val a = n.select(col("document_id"), col("node_type"),
      col("id").as("a_id"))
    val b = n.select(col("document_id"), col("node_type"),
      col("id").as("b_id"))
    // type equality in the join key (not a post-filter) so the shuffle
    // pairs only within (document, type) groups
    a.join(b, Seq("document_id", "node_type"))
      .filter(col("a_id") =!= col("b_id"))
      .select(
        col("a_id").as("source_node_id"),
        col("b_id").as("target_node_id"),
        lit("same_type").as("reference_type"),
        lit(null).cast("string").as("attribute_name"),
        lit(0.6).as("confidence"))
  }
}

/** Scale variant of [[SemanticAdapter]]'s content-similarity pass: the
  * all-pairs cross join is replaced by MinHash/LSH candidate
  * generation ([[graft.pipeline.Dedup.minHashCandidates]]) followed by
  * exact Jaccard verification of the candidates only — the standard
  * sketch-then-verify shape (SURVEY.md §7.2 step 6, §4.2's "LSH at
  * scale" row). Emits the same `content_similar` edge schema and the
  * same confidence math (similarity × 0.5, threshold 0.7); pairs the
  * banding misses are the recall tradeoff, tuned by numHashes/bands.
  * `same_type` edges need no sketching — [[SameTypeAdapter]] carries
  * them in the scale lineup. */
object SemanticLshAdapter extends RelationshipAdapter {
  val name = "semantic_lsh"

  def detect(nodes: DataFrame, properties: DataFrame): DataFrame = {
    val content = nodes
      .filter(col("content").isNotNull && col("content") =!= "")
      // document-scoped pairing: key candidates by (document, node)
      .select(concat_ws("\u0000", col("document_id"), col("id"))
        .as("doc_node"), col("content"))
    val candidates = graft.pipeline.Dedup
      .minHashCandidates(content, "content", "doc_node")
    val toks = content.select(col("doc_node"),
      SemanticAdapter.wordSet(col("content")).as("words"))
    val a = toks.select(col("doc_node").as("key_a"),
      col("words").as("a_words"))
    val b = toks.select(col("doc_node").as("key_b"),
      col("words").as("b_words"))
    val sim = size(array_intersect(col("a_words"), col("b_words")))
      .cast("double") /
      size(array_union(col("a_words"), col("b_words")))
    val verified = candidates
      .join(a, Seq("key_a")).join(b, Seq("key_b"))
      .withColumn("sim", sim)
      .filter(col("sim") >= 0.7)
      // candidates arrive deduped as key_a < key_b; the reference
      // emits both directions
      .filter(substring_index(col("key_a"), "\u0000", 1) ===
        substring_index(col("key_b"), "\u0000", 1))
    // both directions from one execution of the verify join (explode,
    // not a two-branch union that would re-run it)
    verified
      .select(explode(array(
        struct(col("key_a").as("s"), col("key_b").as("t"), col("sim")),
        struct(col("key_b").as("s"), col("key_a").as("t"), col("sim"))))
        .as("e"))
      .select(
        substring_index(col("e.s"), "\u0000", -1).as("source_node_id"),
        substring_index(col("e.t"), "\u0000", -1).as("target_node_id"),
        lit("content_similar").as("reference_type"),
        lit(null).cast("string").as("attribute_name"),
        (col("e.sim") * 0.5).as("confidence"))
  }
}
