package graft

import graft.pipeline.{SemanticNode, SemanticViews}

/** B6 semantic-view API: type filters, subtree views, text-by-type —
  * reference document/semantic_document.py:134-165 semantics over the
  * flattened node table.
  */
class SemanticViewsSpec extends SparkSuite {
  import spark.implicits._

  // doc 0: section(0) -> paragraph(1) -> text(2), figure(3) -> label(4);
  //        title(5) at root
  private def nodes = Seq(
    SemanticNode(0L, 0L, -1L, "section", "", "s1"),
    SemanticNode(0L, 1L, 0L, "paragraph", "", null),
    SemanticNode(0L, 2L, 1L, "text", "hello world", null),
    SemanticNode(0L, 3L, 0L, "figure", "", "fig_0"),
    SemanticNode(0L, 4L, 3L, "label", "Figure 1", null),
    SemanticNode(0L, 5L, -1L, "title", "A Title", null),
    SemanticNode(1L, 0L, -1L, "title", "Other Doc", null),
  ).toDF()

  test("byType filters all depths; rootsByType only the root level") {
    assert(SemanticViews.byType(nodes, "label").count() == 1)
    assert(SemanticViews.byType(nodes, "title").count() == 2)
    assert(SemanticViews.rootsByType(nodes, "figure").count() == 0) // nested
    assert(SemanticViews.rootsByType(nodes, "section").count() == 1)
  }

  test("subtreeView returns every node under matching roots") {
    val ids = SemanticViews.subtreeView(nodes, "figure")
      .collect().map(n => (n.doc_id, n.node_id)).toSet
    assert(ids == Set((0L, 3L), (0L, 4L)))
    val section = SemanticViews.subtreeView(nodes, "section")
      .collect().map(_.node_id).toSet
    assert(section == Set(0L, 1L, 2L, 3L, 4L)) // figure nested in section
  }

  test("textByType concatenates in node order per doc") {
    val texts = SemanticViews.textByType(nodes, "title")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(texts == Map(0L -> "A Title", 1L -> "Other Doc"))
  }

  test("withParent annotates the parent's type and content id") {
    val labelRow = SemanticViews.withParent(nodes)
      .filter($"node_type" === "label").collect().head
    assert(labelRow.getAs[String]("parent_type") == "figure")
    assert(labelRow.getAs[String]("parent_content_id") == "fig_0")
  }
}
