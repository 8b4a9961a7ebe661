package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Jats

/** TEI→JATS behaviors ported from the reference's XSLT test suite
  * (`tests/transformers/tei_to_jats_xslt_test.py`) against graft's
  * own stylesheet. */
class JatsXsltSpec extends AnyFunSuite {

  private def teiOf(header: String = "", body: String = "",
      back: String = ""): String =
    """<TEI xmlns="http://www.tei-c.org/ns/1.0"><teiHeader><fileDesc>""" +
      """<titleStmt><title level="a" type="main">T</title></titleStmt>""" +
      header +
      s"""</fileDesc></teiHeader><text><body>$body</body>""" +
      s"""<back>$back</back></text></TEI>"""

  test("journal title from sourceDesc monogr; absent without it") {
    // test_should_translate_journal_title / not_add_journal_title...
    val tei = teiOf(header = "<sourceDesc><biblStruct><monogr>" +
      "<title>Journal 1</title></monogr></biblStruct></sourceDesc>")
    assert(Jats.transform(tei).contains(
      "<journal-meta><journal-title-group><journal-title>Journal 1" +
        "</journal-title></journal-title-group></journal-meta>"))
    assert(!Jats.transform(teiOf()).contains("journal-title"))
  }

  test("no contrib-group at all without authors") {
    // test_should_not_output_contribut_group_without_authors
    assert(!Jats.transform(teiOf()).contains("contrib-group"))
  }

  test("contrib carries person type, email, middle names join given-names") {
    // test_should_include_middle_name_in_given_names / ..._add_email
    val tei = teiOf(header = "<sourceDesc><biblStruct><analytic>" +
      """<author><persName><forename type="first">Jane</forename>""" +
      """<forename type="middle">M</forename><surname>Doe</surname>""" +
      "</persName><email>jane@example.org</email></author>" +
      "</analytic></biblStruct></sourceDesc>")
    val jats = Jats.transform(tei)
    assert(jats.contains("""<contrib-group content-type="author">"""), jats)
    assert(jats.contains("""<contrib contrib-type="person">"""), jats)
    assert(jats.contains("<given-names>Jane M</given-names>"), jats)
    assert(jats.contains("<email>jane@example.org</email>"), jats)
    // no email in TEI -> no email element
    assert(!Jats.transform(teiOf(header = "<sourceDesc><biblStruct>" +
      "<analytic><author><persName><surname>Doe</surname></persName>" +
      "</author></analytic></biblStruct></sourceDesc>")).contains("<email>"))
  }

  test("affiliations: xref rid on the contrib, aff blocks with typed institutions") {
    // test_should_add_affiliation_of_single_author_with_xref + fields
    val tei = teiOf(header = "<sourceDesc><biblStruct><analytic>" +
      """<author><persName><surname>Doe</surname></persName>""" +
      """<affiliation key="aff0"><orgName type="institution">Inst 1</orgName>""" +
      """<orgName type="department">Dep 1</orgName>""" +
      """<orgName type="laboratory">Lab 1</orgName>""" +
      "<address><settlement>City 1</settlement><country>Country 1</country>" +
      "</address></affiliation></author></analytic></biblStruct></sourceDesc>")
    val jats = Jats.transform(tei)
    assert(jats.contains("""<xref ref-type="aff" rid="aff0"/>"""), jats)
    assert(jats.contains("""<aff id="aff0">""" +
      """<institution content-type="orgname">Inst 1</institution>""" +
      """<institution content-type="orgdiv1">Dep 1</institution>""" +
      """<institution content-type="orgdiv2">Lab 1</institution>""" +
      "<city>City 1</city><country>Country 1</country></aff>"), jats)
    // fields not in TEI stay out (test_should_not_add_affiliation_fields...)
    val bare = teiOf(header = "<sourceDesc><biblStruct><analytic>" +
      """<author><persName><surname>Doe</surname></persName>""" +
      """<affiliation key="aff0"/></author></analytic></biblStruct></sourceDesc>""")
    assert(Jats.transform(bare).contains("""<aff id="aff0"/>"""))
  }

  test("acknowledgement and annex body/app targets") {
    // test_should_extract_acknowledgement_head_and_p_divs_as_body /
    // ..._annex_..._as_app_group
    val back = """<div type="acknowledgement"><div><head>Ack</head>""" +
      "<p>thanks</p></div></div>" +
      """<div type="annex"><div><head>Annex</head><p>extra</p></div></div>"""
    val ackBody = Jats.transform(teiOf(back = back),
      Map("acknowledgement_target" -> "body"))
    // the ack section renders into <body> as a plain sec, no <ack>
    assert(!ackBody.contains("<ack>"), ackBody)
    assert(ackBody.substring(ackBody.indexOf("<body>"),
      ackBody.indexOf("</body>")).contains(
      "<sec><title>Ack</title><p>thanks</p></sec>"), ackBody)
    val annexApp = Jats.transform(teiOf(back = back),
      Map("annex_target" -> "app"))
    assert(annexApp.contains("""<app-group><app id="appendix-1">""" +
      "<title>Appendix 1</title><sec><title>Annex</title><p>extra</p></sec>" +
      "</app></app-group>"), annexApp)
    val annexBody = Jats.transform(teiOf(back = back),
      Map("annex_target" -> "body"))
    assert(annexBody.substring(annexBody.indexOf("<body>"),
      annexBody.indexOf("</body>")).contains(
      "<sec><title>Annex</title><p>extra</p></sec>"), annexBody)
  }

  test("reference dates split into year/month/day; single page fills both") {
    // test_should_convert_year_and_month / _year_month_and_day /
    // _single_page_no
    def refTei(date: String, pages: String) = teiOf(back =
      """<div type="references"><listBibl><biblStruct xml:id="b0">""" +
        "<monogr><imprint>" +
        s"""<date type="published" when="$date"/>$pages""" +
        "</imprint></monogr></biblStruct></listBibl></div>")
    val ym = Jats.transform(refTei("2001-02", ""))
    assert(ym.contains("<year>2001</year><month>02</month>"), ym)
    assert(!ym.contains("<day>"), ym)
    val ymd = Jats.transform(refTei("2001-02-03", ""))
    assert(ymd.contains(
      "<year>2001</year><month>02</month><day>03</day>"), ymd)
    val single = Jats.transform(refTei("2001",
      """<biblScope unit="page">123</biblScope>"""))
    assert(single.contains("<fpage>123</fpage><lpage>123</lpage>"), single)
  }

  test("article-title falls back to the collection title; doi becomes pub-id") {
    // test_should_fallback_to_collection_title... / only_return_article...
    def refTei(titles: String) = teiOf(back =
      """<div type="references"><listBibl><biblStruct xml:id="b0">""" +
        titles + "</biblStruct></listBibl></div>")
    val fallback = Jats.transform(refTei(
      """<monogr><title type="main">Collection 1</title>""" +
        """<idno type="doi">10.1234/x</idno></monogr>"""))
    assert(fallback.contains("<article-title>Collection 1</article-title>"), fallback)
    assert(fallback.contains(
      """<pub-id pub-id-type="doi">10.1234/x</pub-id>"""), fallback)
    val both = Jats.transform(refTei(
      """<analytic><title type="main">Article 1</title></analytic>""" +
        """<monogr><title type="main">Collection 1</title></monogr>"""))
    assert(both.contains("<article-title>Article 1</article-title>"), both)
    assert(!both.contains("Collection 1"), both)
  }

  test("collection (monogr) authors get their own person-group") {
    // test_should_convert_multiple_collection_authors_of_single_reference
    val tei = teiOf(back =
      """<div type="references"><listBibl><biblStruct xml:id="b0">""" +
        "<monogr><author><persName>" +
        """<forename type="first">A</forename><surname>S1</surname>""" +
        "</persName></author></monogr></biblStruct></listBibl></div>")
    assert(Jats.transform(tei).contains(
      """<person-group person-group-type="author"><name>""" +
        "<surname>S1</surname><given-names>A</given-names></name></person-group>"))
  }

  test("unknown ref types and targetless refs render as text") {
    // test_should_extract_unknown_ref_as_text / _bibr_ref_without_target
    val tei = teiOf(body = "<div><p>" +
      """see <ref type="other" target="#x">X</ref> and """ +
      """<ref type="bibr">[2]</ref></p></div>""")
    val jats = Jats.transform(tei)
    assert(jats.contains("<p>see X and [2]</p>"), jats)
  }

  test("figures gain an empty graphic unless disabled; urls map to xlink:href") {
    // test_should_create_empty_graphic_for_figures_without_graphic /
    // _extract_figures_with_graphic_having_url
    val fig = """<figure xml:id="fig_0"><head>Figure 1</head>""" +
      "<figDesc>D</figDesc></figure>"
    val on = Jats.transform(teiOf(body = fig))
    assert(on.contains("<graphic/></fig>"), on)
    val off = Jats.transform(teiOf(body = fig),
      Map("output_empty_figure_graphic" -> "false"))
    assert(!off.contains("<graphic"), off)
    val withUrl = Jats.transform(teiOf(body =
      """<figure xml:id="fig_0"><head>F</head>""" +
        """<graphic url="image1.png"/></figure>"""))
    assert(withUrl.contains("xlink:href=\"image1.png\""), withUrl)
  }
}
