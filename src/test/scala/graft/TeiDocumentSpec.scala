package graft

import graft.pipeline.SemanticNode
import graft.sinks.Tei

/** Ported `tests/document/tei_document_test.py` cases not already
  * pinned by PipelineSpec — the document-assembly long tail:
  * figure/table lifting out of section divs, empty-div suppression,
  * teiHeader front notes, body-level notes, asset citations.
  */
class TeiDocumentSpec extends SparkSuite {
  import spark.implicits._

  private def n(id: Long, parent: Long, tpe: String, text: String,
      cid: String = null) = SemanticNode(0L, id, parent, tpe, text, cid)

  private def tei(nodes: Seq[SemanticNode]): String =
    Tei.serialize(nodes.toDF()).collect().head.getString(1)

  test("empty document has no div (test_should_return_empty_document)") {
    val xml = tei(Seq(n(0, -1, "title", "")))
    assert(!xml.contains("<div"), xml)
  }

  test("section figures render at body level, not inside the div " +
      "(test_should_add_section_figures_to_body)") {
    val xml = tei(Seq(
      n(0, -1, "section", ""),
      n(1, 0, "figure", "", "fig_0"),
      n(2, 1, "label", "Label 1"),
      n(3, 1, "caption", "Caption 1")))
    // the figure is a DIRECT child of <body> (tei_document.py:124-129)
    assert(xml.contains("<body>" +
      """<figure xml:id="fig_0"><head>Label 1</head><label>Label 1</label>""" +
      "<figDesc>Caption 1</figDesc></figure></body>"), xml)
    // the section div, left with no content, is suppressed entirely
    // (tei/section.py:122-125 returns [])
    assert(!xml.contains("<div"), xml)
  }

  test("section tables render at body level with type=table " +
      "(test_should_add_section_tables_to_body)") {
    val xml = tei(Seq(
      n(0, -1, "section", ""),
      n(1, 0, "table", "", "tab_0"),
      n(2, 1, "label", "Table 1"),
      n(3, 1, "caption", "Caption 1")))
    assert(xml.contains("<body>" +
      """<figure type="table" xml:id="tab_0"><head>Table 1</head>""" +
      "<label>Table 1</label><figDesc>Caption 1</figDesc></figure></body>"), xml)
    assert(!xml.contains("<div"), xml)
  }

  test("back-section figures render inside the annex container " +
      "(test_should_add_section_figures_to_back)") {
    val xml = tei(Seq(
      n(0, -1, "section", "", "annex"),
      n(1, 0, "figure", "", "fig_0"),
      n(2, 1, "label", "Label 1"),
      n(3, 1, "caption", "Caption 1")))
    assert(xml.contains("""<back><div type="annex">""" +
      """<figure xml:id="fig_0"><head>Label 1</head><label>Label 1</label>""" +
      "<figDesc>Caption 1</figDesc></figure></div></back>"), xml)
    // no inner div for the figure-only section
    assert(!xml.contains("<div>"), xml)
  }

  test("section with paragraph AND figure keeps its div, figure lifts out") {
    val xml = tei(Seq(
      n(0, -1, "section", ""),
      n(1, 0, "heading", ""),
      n(2, 1, "title", "Section 1"),
      n(3, 0, "paragraph", ""),
      n(4, 3, "text", "Some text"),
      n(5, 0, "figure", "", "fig_0"),
      n(6, 5, "label", "Figure 1")))
    assert(xml.contains("<div><head>Section 1</head><p>Some text</p></div>"), xml)
    val divEnd = xml.indexOf("</div>")
    val fig = xml.indexOf("""<figure xml:id="fig_0"""")
    assert(fig > divEnd, xml) // figure AFTER the div, under body
    assert(xml.indexOf("<figure", xml.indexOf("<body>")) <
      xml.indexOf("</body>"), xml)
  }

  test("asset citations carry type and #target " +
      "(test_should_add_asset_citation_for_resolved_figure/table/reference)") {
    val xml = tei(Seq(
      n(0, -1, "section", ""),
      n(1, 0, "paragraph", ""),
      n(2, 1, "text", "See"),
      n(3, 1, "figure_citation", "Fig 1", "fig_0"),
      n(4, 1, "table_citation", "Tab 1", "tab_0"),
      n(5, 1, "reference_citation", "Ref 1", "b0")))
    assert(xml.contains("<p>See " +
      """<ref type="figure" target="#fig_0">Fig 1</ref> """ +
      """<ref type="table" target="#tab_0">Tab 1</ref> """ +
      """<ref type="bibr" target="#b0">Ref 1</ref></p>"""), xml)
  }

  test("front content not folded into title/abstract/authors renders as a " +
      "teiHeader note with the raw tag as type (tei_document.py:92-99)") {
    val xml = tei(Seq(
      n(0, -1, "title", "First Title"),
      n(1, -1, "note[<title>]", "Second Title")))
    assert(xml.contains(
      """<note type="&lt;title&gt;">Second Title</note></teiHeader>"""), xml)
    // and NOT inside body or back
    assert(!xml.substring(xml.indexOf("<text>"))
      .contains("Second Title"), xml)
  }

  test("root fulltext notes render directly under body " +
      "(test_should_add_notes_to_body)") {
    val xml = tei(Seq(
      n(0, -1, "note[fulltext:other]", "A loose note"),
      n(1, -1, "section", ""),
      n(2, 1, "paragraph", ""),
      n(3, 2, "text", "Text")))
    assert(xml.contains(
      """<body><note type="other">A loose note</note><div>"""), xml)
  }

  test("section notes render inside the div (test_should_add_notes_to_section)") {
    val xml = tei(Seq(
      n(0, -1, "section", ""),
      n(1, 0, "note[other]", "Section note")))
    assert(xml.contains(
      """<div><note type="other">Section note</note></div>"""), xml)
  }
}
