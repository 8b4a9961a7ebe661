package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** The per-document citation pass (`Processor.citationPass`):
  * raw references from the segmenter gain their parsed (or demoted
  * invalid) sibling, which inherits the raw reference's content
  * FIRST (`citation/extract.py:214-217`: the `SemanticReference`
  * starts with the raw reference's label and — for valid refs — the
  * raw text, before any parsed field). */
class CitationPassSpec extends AnyFunSuite {

  private def n(id: Long, parent: Long, tpe: String, text: String,
      cid: String = null): SemanticNode =
    SemanticNode(0L, id, parent, tpe, text, cid, null, null)

  private def segNodes(text: String): Seq[SemanticNode] = Seq(
    n(0L, -1L, "raw_reference", "", "b0"),
    n(1L, 0L, "label", "12."),
    n(2L, 0L, "raw_reference_text", text))

  test("valid reference: inherited label and raw text precede parsed fields") {
    val nodes = Processor.citationPass(0L,
      segNodes("Smith J. A title. Journal 2020"))
    val root = nodes.find(_.node_type == "reference").get
    assert(root.content_id == "b0")
    val kids = nodes.filter(_.parent_id == root.node_id).sortBy(_.node_id)
    // sibling order is node-id order: label, raw text, then fields
    assert(kids.take(2).map(_.node_type) == Seq("label", "raw_reference_text"))
    assert(kids.head.text == "12.")
    assert(kids.drop(2).nonEmpty)
    assert(kids.drop(2).forall(n =>
      n.node_type != "label" && n.node_type != "raw_reference_text"))
    // ids stay unique across the whole node set
    assert(nodes.map(_.node_id).distinct.size == nodes.size)
  }

  test("two raw references: parsed siblings keep disjoint id ranges") {
    val nodes = Processor.citationPass(0L,
      segNodes("Smith J. A title. Journal 2020") ++ Seq(
        n(3L, -1L, "raw_reference", "", "b1"),
        n(4L, 3L, "label", "13."),
        n(5L, 3L, "raw_reference_text", "Jones K. Other paper 2021")))
    assert(nodes.map(_.node_id).distinct.size == nodes.size)
    val roots = nodes.filter(n => n.node_type == "reference")
    assert(roots.map(_.content_id).sorted == Seq("b0", "b1"))
    roots.foreach { r =>
      val kids = nodes.filter(_.parent_id == r.node_id).sortBy(_.node_id)
      assert(kids.take(2).map(_.node_type) ==
        Seq("label", "raw_reference_text"))
    }
  }
}
