package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** B6: semantic-view convenience API over the node table (reference
  * `document/semantic_document.py:134-165` — `iter_by_type`,
  * `iter_by_type_recursively`, `view_by_type`, `get_text_by_type`).
  *
  * The reference walks an in-memory tree per document; the engine's
  * node table is already the flattened tree (doc_id, node_id,
  * parent_id, node_type, text, content_id), so type queries are plain
  * predicates — Catalyst prunes and pushes them into the scan — and
  * subtree queries are one per-doc fold over the (tiny) node set, the
  * same shape every extractor stage uses.
  */
object SemanticViews {

  /** `iter_by_type` over direct children of the virtual root, or any
    * node when `rootOnly` is false (`iter_by_type_recursively` — the
    * flat table holds every depth, so the recursive variant is the same
    * predicate). */
  def byType(nodes: DataFrame, types: String*): DataFrame =
    nodes.filter(col("node_type").isin(types: _*))

  def rootsByType(nodes: DataFrame, types: String*): DataFrame =
    byType(nodes, types: _*).filter(col("parent_id") < 0)

  /** `view_by_type`: every node that lies inside a subtree whose root
    * has one of `rootTypes` — the filtered sub-document the reference's
    * model stages run on. Per-doc fold (node sets are small; the corpus
    * fans out by document).
    */
  def subtreeView(nodes: DataFrame, rootTypes: String*): Dataset[SemanticNode] = {
    val sparkSession = nodes.sparkSession
    import sparkSession.implicits._
    val roots = rootTypes.toSet
    Processor.withCoordsColumn(nodes)
      .select(col("doc_id"), col("node_id"), col("parent_id"),
        col("node_type"), col("text"), col("content_id"), col("coords"),
        col("styles"))
      .as[SemanticNode]
      .groupByKey(_.doc_id)
      .flatMapGroups { (_, it) =>
        val all = it.toSeq
        val byId = all.map(n => n.node_id -> n).toMap
        def inView(n: SemanticNode): Boolean = {
          var cur = n
          var steps = 0
          while (steps < 1000) {
            if (roots(cur.node_type)) return true
            if (cur.parent_id < 0) return false
            byId.get(cur.parent_id) match {
              case Some(p) => cur = p; steps += 1
              case None => return false
            }
          }
          false
        }
        all.filter(inView).iterator
      }
  }

  /** `get_text_by_type`: per-document concatenated text of nodes of the
    * given type, in node order (the reference joins merged blocks with
    * a space). */
  def textByType(nodes: DataFrame, nodeType: String): DataFrame =
    nodes.filter(col("node_type") === nodeType && col("text") =!= "")
      .groupBy("doc_id")
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("node_id"), col("text")))),
        n => n.getField("text"))).as("text"))

  /** Children joined with their parent's type/content id — the "what is
    * this node inside of" view consumers otherwise rebuild with ad-hoc
    * self-joins. */
  def withParent(nodes: DataFrame): DataFrame = {
    val parents = nodes.select(col("doc_id"),
      col("node_id").as("parent_id"),
      col("node_type").as("parent_type"),
      col("content_id").as("parent_content_id"))
    nodes.join(parents, Seq("doc_id", "parent_id"), "left")
  }
}
