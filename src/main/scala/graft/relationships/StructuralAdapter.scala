package graft.relationships

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structural edges: parent/child, sibling, adjacent-sibling.
  *
  * Semantics from /root/reference/lib/relationships/adapters/
  * structural_adapter.rb:
  *  - every node with a `parent_id` emits `parent_child` (parent→child)
  *    and `child_parent` (child→parent), confidence 1.0 (:28-41);
  *  - within a (document, parent) group of ≥2 nodes, every unordered
  *    pair emits `sibling` in both directions (:43-60);
  *  - pairs whose positions differ by exactly 1 additionally emit
  *    `next_sibling` (earlier→later) and `previous_sibling`
  *    (later→earlier) (:63-71).
  *
  * Spark shape: the parent/child edges are a projection + union (no
  * join needed — `parent_id` is already resolved at ingest). Sibling
  * pairs are a self-equi-join on the (document_id, parent_id) group key
  * with `a.position < b.position` (the reference's i<j loop over rows
  * pre-sorted by position, :13). Fan-out is quadratic only in per-parent
  * children count — the same output cardinality the reference produces —
  * and the join co-partitions both sides on the group key, so at 100 TB
  * this is one shuffle keyed by (document_id, parent_id); AQE handles
  * the occasional huge-family skew. Adjacency falls out of the same
  * join (position delta = 1) instead of a second pass.
  */
object StructuralAdapter extends RelationshipAdapter {
  val name = "structural"

  def detect(nodes: DataFrame, properties: DataFrame): DataFrame = {
    val n = nodes.select("id", "document_id", "parent_id", "position")
    val withParent = n.filter(col("parent_id").isNotNull)

    def edge(src: Column, dst: Column, refType: String): Column =
      struct(src.as("source_node_id"), dst.as("target_node_id"),
        lit(refType).as("reference_type"),
        lit(null).cast("string").as("attribute_name"),
        lit(1.0).as("confidence"))

    // one scan: each child emits its parent_child + child_parent pair
    val parentEdges = withParent.select(explode(array(
      edge(col("parent_id"), col("id"), "parent_child"),
      edge(col("id"), col("parent_id"), "child_parent"))).as("e"))

    val a = withParent.select(col("document_id"), col("parent_id"),
      col("id").as("a_id"), col("position").as("a_pos"))
    val b = withParent.select(col("document_id"), col("parent_id"),
      col("id").as("b_id"), col("position").as("b_pos"))
    // one self-join execution for all four sibling edge types: each
    // surviving pair explodes into its 2 sibling edges plus, when the
    // positions are adjacent, the next/previous pair — slice(.., 1, 0)
    // contributes nothing otherwise. Previously these were four union
    // branches that each re-ran the join.
    val pairEdges = a.join(b, Seq("document_id", "parent_id"))
      .filter(col("a_pos") < col("b_pos"))
      .select(explode(concat(
        array(edge(col("a_id"), col("b_id"), "sibling"),
          edge(col("b_id"), col("a_id"), "sibling")),
        slice(array(
          edge(col("a_id"), col("b_id"), "next_sibling"),
          edge(col("b_id"), col("a_id"), "previous_sibling")),
          lit(1),
          when(col("b_pos") - col("a_pos") === 1, 2).otherwise(0))))
        .as("e"))

    parentEdges.unionByName(pairEdges).select(col("e.*"))
  }
}
