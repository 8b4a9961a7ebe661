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

  test("whitespace-only raw text: demoted to an invalid reference " +
      "with the label, no orphaned copies") {
    // the reference's citation model parses every raw reference; an
    // unparseable block can only demote (it never survives raw)
    val nodes = Processor.citationPass(0L, segNodes("   "))
    val inv = nodes.find(_.node_type == "invalid_reference").get
    assert(inv.content_id.startsWith("invalid_ref_"))
    val kids = nodes.filter(_.parent_id == inv.node_id)
    assert(kids.map(n => (n.node_type, n.text)) == Seq(("label", "12.")))
    // the raw sibling shares the out-of-band id for sink suppression
    assert(nodes.find(_.node_type == "raw_reference").get.content_id ==
      inv.content_id)
    // every non-root parent id must exist
    val ids = nodes.map(_.node_id).toSet
    assert(nodes.filter(_.parent_id >= 0).forall(n => ids(n.parent_id)))
  }

  test("renumberReferenceIds: demoted pairs leave the b-sequence, " +
      "valid references renumber contiguously (processor.py:241)") {
    // segmenter order: b0 demoted, b1 valid, b2 unparsed raw
    val nodes = Seq(
      n(0L, -1L, "raw_reference", "", "b0"),
      n(10L, -1L, "invalid_reference", "", "b0"),
      n(20L, -1L, "raw_reference", "", "b1"),
      n(30L, -1L, "reference", "", "b1"),
      n(40L, -1L, "raw_reference", "", "b2"))
    val out = Processor.renumberReferenceIds(nodes)
    def cid(id: Long) = out.find(_.node_id == id).get.content_id
    // the valid pair takes b0 (the demoted pair does not consume an id)
    assert(cid(20L) == "b0" && cid(30L) == "b0")
    // the unparsed raw consumes the next id
    assert(cid(40L) == "b1")
    // the demoted pair keeps an out-of-band id, still shared for the
    // sink's in-place replacement pairing
    assert(cid(0L) == cid(10L) && cid(0L).startsWith("invalid_ref_"))
  }

  test("reference markers: label match, then raw-text vote; demoted " +
      "references are never targets (processor.py:239-251)") {
    val nodes = Seq(
      n(100L, -1L, "reference_citation", "Smith 2020"),
      n(101L, -1L, "reference_citation", "99."),
      n(0L, -1L, "raw_reference", "", "b0"),
      n(1L, 0L, "label", "1."),
      n(2L, 0L, "raw_reference_text", "J Smith, A title, 2020"),
      n(10L, -1L, "reference", "", "b0"),
      n(3L, -1L, "raw_reference", "", "b1"),
      n(4L, 3L, "label", "2."),
      n(5L, 3L, "raw_reference_text", "K Jones, Other work, 2021"),
      n(11L, -1L, "reference", "", "b1"),
      n(20L, -1L, "raw_reference", "", "invalid_ref_0"),
      n(21L, 20L, "label", "99."),
      n(30L, -1L, "invalid_reference", "", "invalid_ref_0"))
    val out = Processor.assignIdsAndTargets(nodes)
    // author-year marker resolves through the raw-text vote fallback
    assert(out.find(_.node_id == 100L).get.content_id == "b0")
    // the demoted reference's own label "99." is NOT a candidate; its
    // punctuation-token votes tie across b0/b1 (the reference Counter
    // semantics) — the marker stays unresolved, no dangling target
    assert(out.find(_.node_id == 101L).get.content_id == null)
  }

  test("partial matcher follows the reference's Counter semantics: " +
      "first-encountered wins, punctuation tokens vote (ref_matching.py:85-93)") {
    // reference behavior verified against the vendored python: the
    // winner is keys[0] in vote-insertion order, NOT the max count
    val out = Processor.matchContentIdsLocal(
      Seq((1L, "2020 Smith")),
      candidates = Seq(("b0", "1."), ("b1", "2.")),
      partialCandidates = Seq(
        ("b0", "Year 2020"), ("b1", "Smith B. Title 2020")))
    // b0 is first-encountered via the "2020" token and its count (1)
    // differs from b1's (2) -> b0 wins despite fewer votes
    assert(out == Map(1L -> "b0"))
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
