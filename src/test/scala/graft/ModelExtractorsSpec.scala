package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Extractors.Span
import graft.pipeline.ModelExtractors._
import graft.pipeline.SemanticNode

/** Golden cases mirroring the reference's extractor tests
  * (tests/models/{name,citation,reference_segmenter,affiliation_address,
  * fulltext}/extract_test.py scenarios).
  */
class ModelExtractorsSpec extends AnyFunSuite {

  private def spansOf(tags: (String, String)*): Seq[Span] =
    tags.zipWithIndex.map { case ((tag, text), i) => Span(i.toLong, tag, text) }

  private def byType(nodes: Seq[SemanticNode], t: String): Seq[SemanticNode] =
    nodes.filter(_.node_type == t)

  // ------------------------------------------------------------- names

  test("markerPieces: split on comma/space, not on digits") {
    assert(markerPieces("1").map(_._2) == Seq("1"))
    assert(markerPieces("1,2") ==
      Seq(("marker", "1"), ("note[marker_delimiter]", ","), ("marker", "2")))
    assert(markerPieces("1 2").collect { case ("marker", t) => t } == Seq("1", "2"))
    assert(markerPieces("11,12").collect { case ("marker", t) => t } == Seq("11", "12"))
  }

  test("nameFold: single author with title-cased parts") {
    val nodes = nameFold(0L, spansOf(
      "<forename>" -> "JOHN", "<surname>" -> "SMITH"))
    val authors = byType(nodes, "author")
    assert(authors.size == 1)
    val parts = nodes.filter(_.parent_id == authors.head.node_id)
      .map(n => (n.node_type, n.text))
    assert(parts == Seq(("given_name", "John"), ("surname", "Smith")))
  }

  test("nameFold: single editor (name_type=editor)") {
    // reference test_should_be_able_to_extract_single_editor
    val nodes = nameFold(0L, spansOf(
      "<forename>" -> "John", "<surname>" -> "Smith"), nameType = "editor")
    val editors = byType(nodes, "editor")
    assert(editors.size == 1)
    val parts = nodes.filter(_.parent_id == editors.head.node_id)
      .map(n => (n.node_type, n.text))
    assert(parts == Seq(("given_name", "John"), ("surname", "Smith")))
  }

  test("citationNamePass: raw_authors under a reference become person nodes") {
    import graft.pipeline.Processor
    // a parsed reference with raw_authors + raw_editors + title children
    val spans = spansOf(
      "<author>" -> "John Smith and Mary Jones",
      "<editor>" -> "Bob Editor",
      "<title>" -> "Some Title")
    val refNodes = citationFold(7L, spans, "b0")
    assert(byType(refNodes, "raw_authors").size == 1)
    // default config: authors parsed, editors left raw
    val out = Processor.citationNamePass(7L, refNodes)
    val authors = byType(out, "author")
    assert(authors.size == 2)
    val ref = byType(out, "reference").head
    assert(authors.forall(_.parent_id == ref.node_id))
    val surnameTexts = out.filter(_.node_type == "surname").map(_.text)
    assert(surnameTexts == Seq("Smith", "Jones"))
    assert(byType(out, "raw_editors").size == 1) // editors off by default
    assert(byType(out, "title").map(_.text) == Seq("Some Title"))
    // editors enabled: raw_editors replaced by editor person nodes
    val outEd = Processor.citationNamePass(7L, refNodes,
      Processor.Config(extractCitationEditors = true))
    assert(byType(outEd, "editor").size == 1)
    assert(byType(outEd, "raw_editors").isEmpty)
  }

  test("nameFold: split on second forename") {
    val nodes = nameFold(0L, spansOf(
      "<forename>" -> "John", "<surname>" -> "Smith",
      "<forename>" -> "Mary", "<surname>" -> "Jones"))
    assert(byType(nodes, "author").size == 2)
  }

  test("nameFold: split on marker after comma") {
    val nodes = nameFold(0L, spansOf(
      "<forename>" -> "John", "<surname>" -> "Smith,",
      "<marker>" -> "1", "<forename>" -> "Mary", "<surname>" -> "Jones"))
    val authors = byType(nodes, "author")
    assert(authors.size == 2)
    // marker "1" belongs to the SECOND author (starts it)
    val secondParts = nodes.filter(_.parent_id == authors(1).node_id)
    assert(secondParts.exists(n => n.node_type == "marker" && n.text == "1"))
  }

  test("nameFold: tail marker then new name part starts a new author") {
    val nodes = nameFold(0L, spansOf(
      "<forename>" -> "John", "<surname>" -> "Smith",
      "<marker>" -> "1", "<forename>" -> "Mary", "<surname>" -> "Jones"))
    val authors = byType(nodes, "author")
    assert(authors.size == 2)
    // tail marker stays with the FIRST author (no comma before it)
    val firstParts = nodes.filter(_.parent_id == authors(0).node_id)
    assert(firstParts.exists(_.node_type == "marker"))
  }

  test("nameFold: split on second title") {
    // reference test_should_split_on_second_title
    val nodes = nameFold(0L, spansOf(
      "<title>" -> "Mr", "<forename>" -> "John", "<surname>" -> "Smith",
      "<title>" -> "Ms", "<forename>" -> "Maria", "<surname>" -> "Madison"))
    val authors = byType(nodes, "author")
    assert(authors.size == 2)
    val a1 = nodes.filter(_.parent_id == authors(0).node_id).map(n => (n.node_type, n.text))
    assert(a1 == Seq(("name_title", "Mr"), ("given_name", "John"), ("surname", "Smith")))
    val a2 = nodes.filter(_.parent_id == authors(1).node_id).map(n => (n.node_type, n.text))
    assert(a2 == Seq(("name_title", "Ms"), ("given_name", "Maria"), ("surname", "Madison")))
  }

  test("nameFold: split on second surname (surname-first order)") {
    // reference test_should_split_on_second_surname
    val nodes = nameFold(0L, spansOf(
      "<surname>" -> "Smith", "<forename>" -> "John",
      "<surname>" -> "Madison", "<forename>" -> "Maria"))
    val authors = byType(nodes, "author")
    assert(authors.size == 2)
    def part(a: SemanticNode, t: String) =
      nodes.filter(n => n.parent_id == a.node_id && n.node_type == t).map(_.text)
    assert(part(authors(0), "given_name") == Seq("John"))
    assert(part(authors(0), "surname") == Seq("Smith"))
    assert(part(authors(1), "given_name") == Seq("Maria"))
    assert(part(authors(1), "surname") == Seq("Madison"))
  }

  test("nameFold: does NOT split on second middlename (multi-middle names)") {
    // reference test_should_split_not_split_on_second_middlename
    val nodes = nameFold(0L, spansOf(
      "<forename>" -> "John", "<middlename>" -> "M", "<middlename>" -> "J",
      "<surname>" -> "Smith",
      "<forename>" -> "Maria", "<surname>" -> "Madison"))
    val authors = byType(nodes, "author")
    assert(authors.size == 2)
    val middles = nodes.filter(n =>
      n.parent_id == authors(0).node_id && n.node_type == "middle_name").map(_.text)
    assert(middles == Seq("M", "J"))
    assert(nodes.filter(n => n.parent_id == authors(1).node_id &&
      n.node_type == "middle_name").isEmpty)
  }

  test("nameFold: does NOT split on second suffix") {
    // reference test_should_split_not_split_on_second_suffix
    val nodes = nameFold(0L, spansOf(
      "<forename>" -> "John", "<surname>" -> "Smith",
      "<suffix>" -> "X", "<suffix>" -> "Y",
      "<forename>" -> "Maria", "<surname>" -> "Madison"))
    val authors = byType(nodes, "author")
    assert(authors.size == 2)
    val suffixes = nodes.filter(n =>
      n.parent_id == authors(0).node_id && n.node_type == "name_suffix").map(_.text)
    assert(suffixes == Seq("X", "Y"))
  }

  test("nameFold: comma as separate O span before marker splits authors") {
    // reference test_should_split_on_comma_before_marker (the comma is
    // its own O-tagged block, not trailing surname text) + the
    // double-comma variant
    for (comma <- Seq(",", ", ,")) {
      val nodes = nameFold(0L, spansOf(
        "<marker>" -> "1", "<forename>" -> "John", "<surname>" -> "Smith",
        "O" -> comma,
        "<marker>" -> "2", "<forename>" -> "Maria", "<surname>" -> "Madison"))
      val authors = byType(nodes, "author")
      assert(authors.size == 2, s"comma=$comma")
      def markers(a: SemanticNode) = nodes.filter(n =>
        n.parent_id == a.node_id && n.node_type == "marker").map(_.text)
      assert(markers(authors(0)) == Seq("1"), s"comma=$comma")
      assert(markers(authors(1)) == Seq("2"), s"comma=$comma")
    }
  }

  test("nameFold: consecutive tail markers accumulate, next name part splits") {
    // reference test_should_parse_multiple_markers: '1' and '2' are both
    // tail markers of the first author (no comma directly before '2'
    // would matter — has_tail_marker suppresses the comma rule); Maria
    // starts the next author, which collects tail markers '2' and '3'
    val nodes = nameFold(0L, spansOf(
      "<forename>" -> "John", "<surname>" -> "Smith",
      "<marker>" -> "1", "O" -> ",", "<marker>" -> "2", "O" -> ",",
      "<forename>" -> "Maria", "<surname>" -> "Madison",
      "<marker>" -> "2", "O" -> ",", "<marker>" -> "3"))
    val authors = byType(nodes, "author")
    assert(authors.size == 2)
    def markers(a: SemanticNode) = nodes.filter(n =>
      n.parent_id == a.node_id && n.node_type == "marker").map(_.text)
    assert(markers(authors(0)) == Seq("1", "2"))
    assert(markers(authors(1)) == Seq("2", "3"))
  }

  test("nameFold: two-letter uppercase given name splits to initials") {
    val nodes = nameFold(0L, spansOf("<forename>" -> "JM", "<surname>" -> "Smith"))
    val author = byType(nodes, "author").head
    val parts = nodes.filter(_.parent_id == author.node_id).map(n => (n.node_type, n.text))
    assert(parts == Seq(("given_name", "J"), ("middle_name", "M"), ("surname", "Smith")))
  }

  test("nameFold: no surname -> invalid_author_name note") {
    val nodes = nameFold(0L, spansOf("<forename>" -> "John"))
    assert(byType(nodes, "author").isEmpty)
    assert(nodes.exists(_.node_type == "note[invalid_author_name]"))
  }

  test("titleCase matches python str.title semantics") {
    assert(titleCase("mcdonald") == "Mcdonald")
    assert(titleCase("o'brien") == "O'Brien")
    assert(titleCase("SMITH-JONES") == "Smith-Jones")
  }

  // ---------------------------------------------------------- citation

  test("parsePageRange expands short to-page") {
    assert(parsePageRange("123-7") == (Some("123"), Some("127")))
    assert(parsePageRange("123-129") == (Some("123"), Some("129")))
    assert(parsePageRange("123") == (None, None))
  }

  test("detectExternalId: doi/pmcid/arxiv/pmid/pii precedence") {
    assert(detectExternalId("10.1234/abc") == (Some("doi"), "10.1234/abc"))
    assert(detectExternalId("PMC1234567") == (Some("pmcid"), "PMC1234567"))
    assert(detectExternalId("arXiv:2101.12345") == (Some("arxiv"), "2101.12345"))
    assert(detectExternalId("PMID: 12345") == (Some("pmid"), "12345"))
    assert(detectExternalId("just text")._1.isEmpty)
  }

  test("detectExternalId: reference label-variant matrix") {
    // citation/extract_test.py TestParsePubNum — every labeled variant
    val pii = "S0123-1234(11)01234-5"
    val cases = Seq(
      ("xyz", None, "xyz"),
      ("doi: 10.1234/test", Some("doi"), "10.1234/test"),
      ("10.1234/test", Some("doi"), "10.1234/test"),
      ("PMID: 1234567", Some("pmid"), "1234567"),
      ("PMID1234567", Some("pmid"), "1234567"),
      ("PubMed: 1234567", Some("pmid"), "1234567"),
      ("PubMedID: 1234567", Some("pmid"), "1234567"),
      ("PMC1234567", Some("pmcid"), "PMC1234567"),
      ("PMCPMC1234567", Some("pmcid"), "PMC1234567"),
      ("PubMed Central: PMC1234567", Some("pmcid"), "PMC1234567"),
      ("arXiv: 0706.0001", Some("arxiv"), "0706.0001"),
      ("arXiv: math.GT/0309136", Some("arxiv"), "math.GT/0309136"),
      (pii, Some("pii"), pii.replaceAll("\\s", "")),
      ("pii: " + pii, Some("pii"), pii),
      (pii + " [pii]", Some("pii"), pii))
    cases.foreach { case (in, wantType, wantValue) =>
      val (gotType, gotValue) = detectExternalId(in)
      assert(gotType == wantType && gotValue == wantValue,
        s"$in -> ($gotType, $gotValue), want ($wantType, $wantValue)")
    }
    // TestParsePageRange / TestParseWeb / TestParseDate residuals
    assert(parsePageRange(" 12 - 15 ") == (Some("12"), Some("15")))
    assert(parsePageRange("1234-56") == (Some("1234"), Some("1256")))
    assert(parseYear("1991-01-01").contains(1991))
  }

  test("parseYear finds 4-digit year") {
    assert(parseYear("(2020)").contains(2020))
    assert(parseYear("May 7, 1999").contains(1999))
    assert(parseYear("n.d.").isEmpty)
  }

  test("citationFold: valid reference with typed fields") {
    val nodes = citationFold(0L, spansOf(
      "<author>" -> "Smith J",
      "<title>" -> "A Study",
      "<date>" -> "2020",
      "<pages>" -> "123-9",
      "<web>" -> "https://doi.org/10.1234/xyz.1"),
      contentId = "b0")
    val ref = byType(nodes, "reference")
    assert(ref.size == 1 && ref.head.content_id == "b0")
    val children = nodes.filter(_.parent_id == ref.head.node_id)
      .map(n => (n.node_type, n.text)).toSet
    assert(children.contains(("raw_authors", "Smith J")))
    assert(children.contains(("date", "2020")))
    assert(children.contains(("page_range", "123-129")))
    assert(children.exists { case (t, v) => t == "external_id" && v.startsWith("10.1234/") })
  }

  test("citationFold: reference without valid fields demoted to invalid") {
    val nodes = citationFold(0L, spansOf("<date>" -> "2020", "<pages>" -> "1-2"),
      contentId = "b0")
    assert(byType(nodes, "reference").isEmpty)
    // the invalid root keeps the raw reference's content id so it can
    // replace the raw reference in place (processor.py:612-623)
    assert(byType(nodes, "invalid_reference").map(_.content_id) == Seq("b0"))
  }

  // ----------------------------------------------- reference segmenter

  test("referenceSegmenterFold: label+reference pairs, short first ref is heading") {
    val nodes = referenceSegmenterFold(0L, spansOf(
      "<reference>" -> "References",
      "<label>" -> "1.",
      "<reference>" -> "Smith J, A Study of Things, 2020",
      "<label>" -> "2.",
      "<reference>" -> "Jones M, Another Longer Study, 2021"))
    assert(byType(nodes, "heading").map(_.text) == Seq("References"))
    val refs = byType(nodes, "raw_reference")
    assert(refs.map(_.content_id) == Seq("b0", "b1"))
    val texts = byType(nodes, "raw_reference_text")
    assert(texts.forall(t => refs.exists(_.node_id == t.parent_id)))
  }

  // ---------------------------------------------------- affiliations

  test("affiliationFold: markers start affs, second institution splits, country cleaned") {
    val nodes = affiliationFold(0L, spansOf(
      "<marker>" -> "1",
      "<institution>" -> "Uni A",
      "<country>" -> "France.",
      "<institution>" -> "Uni B",
      "<settlement>" -> "Paris"))
    val affs = byType(nodes, "affiliation_address")
    assert(affs.size == 2 && affs.map(_.content_id) == Seq("aff0", "aff1"))
    val aff0Children = nodes.filter(_.parent_id == affs(0).node_id)
    assert(aff0Children.exists(n => n.node_type == "country" && n.text == "France"))
    assert(aff0Children.exists(n => n.node_type == "note[<country>-suffix]" && n.text == "."))
    val aff1Children = nodes.filter(_.parent_id == affs(1).node_id)
    assert(aff1Children.exists(n => n.node_type == "institution" && n.text == "Uni B"))
    assert(aff1Children.exists(n => n.node_type == "settlement" && n.text == "Paris"))
  }

  test("cleanCountry strips trailing dots as suffix") {
    assert(cleanCountry("France.") == ("", "France", "."))
    assert(cleanCountry("France") == ("", "France", ""))
  }

  // -------------------------------------------------------- fulltext

  test("sectionLabelAndTitle splits numeric labels") {
    assert(sectionLabelAndTitle("1. Introduction") == (Some("1."), "Introduction"))
    assert(sectionLabelAndTitle("2.1 Methods") == (Some("2.1"), "Methods"))
    assert(sectionLabelAndTitle("Discussion") == (None, "Discussion"))
  }

  test("fulltextFold: sections, paragraphs, markers, equations") {
    val nodes = fulltextFold(0L, spansOf(
      "<section>" -> "1. Introduction",
      "<paragraph>" -> "Some intro text",
      "<citation_marker>" -> "[1]",
      "<paragraph>" -> "continues same paragraph after marker",
      "<paragraph>" -> "Second paragraph",
      "<section>" -> "2. Methods",
      "<equation_label>" -> "(1)",
      "<equation>" -> "E = mc^2",
      "<figure>" -> "Figure 1 caption text"))
    val sections = byType(nodes, "section")
    assert(sections.size == 2)
    val headings = byType(nodes, "heading")
    assert(headings.size == 2)
    val labels = byType(nodes, "label").map(_.text)
    assert(labels.contains("1.") && labels.contains("2.") && labels.contains("(1)"))
    // consecutive <paragraph> spans -> two paragraphs in section 1
    val s1Paragraphs = byType(nodes, "paragraph").filter(_.parent_id == sections(0).node_id)
    assert(s1Paragraphs.size == 2)
    // citation marker nested in the first paragraph
    assert(byType(nodes, "reference_citation")
      .exists(_.parent_id == s1Paragraphs(0).node_id))
    // equation pair under section 2's paragraph
    val eq = byType(nodes, "raw_equation")
    assert(eq.size == 1)
    assert(byType(nodes, "raw_equation_content").head.parent_id == eq.head.node_id)
    assert(byType(nodes, "raw_figure").exists(_.parent_id == sections(1).node_id))
  }

  test("fulltextFold: reference equation/label/note corner cases") {
    // fulltext/extract_test.py: label AFTER content stays in the same
    // raw equation; a second content span starts a new one
    val after = fulltextFold(0L, spansOf(
      "<paragraph>" -> "p1",
      "<equation>" -> "Equation 1",
      "<equation_label>" -> "(1)",
      "<paragraph>" -> "p2"))
    val eqAfter = byType(after, "raw_equation")
    assert(eqAfter.size == 1)
    assert(byType(after, "raw_equation_content").map(_.text) == Seq("Equation 1"))
    assert(byType(after, "label").filter(_.parent_id == eqAfter.head.node_id)
      .map(_.text) == Seq("(1)"))
    // two label-less equations -> two raw equations
    val multi = fulltextFold(0L, spansOf(
      "<paragraph>" -> "p1",
      "<equation>" -> "Equation 1",
      "<equation>" -> "Equation 2",
      "<paragraph>" -> "p2"))
    assert(byType(multi, "raw_equation").size == 2)
    assert(byType(multi, "raw_equation_content").map(_.text) ==
      Seq("Equation 1", "Equation 2"))
    // single number without dot is still a label
    assert(sectionLabelAndTitle("1 Introduction") == (Some("1"), "Introduction"))
    assert(sectionLabelAndTitle("1.2.3. Results") == (Some("1.2.3."), "Results"))
    // 'O' text before any section -> standalone body note
    val o = fulltextFold(0L, spansOf("O" -> "stray text"))
    assert(o.exists(n =>
      n.node_type == "note[fulltext:other]" && n.parent_id < 0))
  }
}
