package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TrainingData

/** Training-XML generator cases ported from
  * `tests/models/header/training_data_test.py` (structure asserted on
  * the serialized form — the writer is forward-only so the string IS
  * the tree).
  */
class TrainingDataSpec extends AnyFunSuite {

  private def lineOf(text: String, label: String): Seq[(String, String, String)] = {
    val toks = text.split(" ")
    toks.zipWithIndex.map { case (t, i) =>
      val l =
        if (label == "O") "O"
        else if (i == 0) s"B-$label"
        else s"I-$label"
      (t, if (i < toks.length - 1) " " else "", l)
    }.toSeq
  }

  test("unlabeled text round-trips with lb per line") {
    val xml = TrainingData.trainingXmlBody(
      Seq(lineOf("this is text 1", "O"), lineOf("this is text 2", "O")),
      TrainingData.HeaderRoot, TrainingData.HeaderPaths)
    assert(xml == "<text><front>this is text 1<lb/>\nthis is text 2<lb/>\n</front></text>")
  }

  test("title and abstract lines land under their mapped paths") {
    val xml = TrainingData.trainingXmlBody(
      Seq(lineOf("this is text 1", "<title>"), lineOf("this is text 2", "<abstract>")),
      TrainingData.HeaderRoot, TrainingData.HeaderPaths)
    assert(xml == "<text><front><docTitle><titlePart>this is text 1<lb/></titlePart>" +
      "</docTitle>\n<div type=\"abstract\">this is text 2<lb/></div>\n</front></text>")
  }

  test("unknown label maps to a typed note") {
    val xml = TrainingData.trainingXmlBody(
      Seq(lineOf("mystery words", "<unknown>")),
      TrainingData.HeaderRoot, TrainingData.HeaderPaths)
    assert(xml == "<text><front><note type=\"unknown\">mystery words<lb/></note>\n" +
      "</front></text>")
  }

  test("separate B- labels do not join into one element") {
    val xml = TrainingData.trainingXmlBody(
      Seq(lineOf("this is text 1", "<title>"), lineOf("this is text 2", "<title>")),
      TrainingData.HeaderRoot, TrainingData.HeaderPaths)
    assert(xml == "<text><front><docTitle><titlePart>this is text 1<lb/></titlePart>\n" +
      "<titlePart>this is text 2<lb/></titlePart></docTitle>\n</front></text>")
  }

  test("citation paths: author/title/date under bibl, TEI namespace root") {
    val spark = SparkSuite.session
    import spark.implicits._
    val labeled = Seq(
      (0L, 0, 0, 0, 0, "Smith", " ", "B-<author>"),
      (0L, 0, 0, 0, 1, "Measuring", " ", "B-<title>"),
      (0L, 0, 0, 0, 2, "Things", "", "I-<title>"),
      (0L, 0, 0, 1, 0, "2020", "", "B-<date>"))
      .toDF("doc_id", "page_idx", "block_idx", "line_idx", "token_idx",
        "text", "whitespace", "label")
    val out = TrainingData.citationTrainingXml(labeled).collect()
    assert(out.length == 1)
    val xml = out.head.getString(1)
    assert(xml.startsWith("""<TEI xmlns="http://www.tei-c.org/ns/1.0">"""))
    assert(xml.contains("<author>Smith</author>"))
    assert(xml.contains("""<title level="a">Measuring Things<lb/></title>"""))
    assert(xml.contains("<date>2020<lb/></date>"))
  }

  test("reference-segmenter reset: each B-<label> opens a fresh bibl") {
    // two references, each "label then text": without the reset path the
    // second label would nest inside the first bibl
    val lines = Seq(
      Seq(("1.", " ", "B-<label>"), ("First", " ", "B-<reference>"),
        ("ref", "", "I-<reference>")),
      Seq(("2.", " ", "B-<label>"), ("Second", " ", "B-<reference>"),
        ("ref", "", "I-<reference>")))
    val xml = TrainingData.trainingXmlBody(lines,
      TrainingData.ReferenceSegmenterRoot, TrainingData.ReferenceSegmenterPaths,
      TrainingData.ReferenceSegmenterResets)
    assert(xml == "<text><listBibl><bibl><label>1.</label> First ref<lb/></bibl>\n" +
      "<bibl><label>2.</label> Second ref<lb/></bibl>\n</listBibl></text>", xml)
  }

  test("affiliation paths nest address children under one address element") {
    val lines = Seq(Seq(
      ("MIT", " ", "B-<institution>"),
      ("Cambridge", " ", "B-<settlement>"),
      ("USA", "", "B-<country>")))
    val xml = TrainingData.trainingXmlBody(lines,
      TrainingData.AffiliationRoot, TrainingData.AffiliationPaths)
    assert(xml.contains("""<orgName type="institution">MIT</orgName>"""), xml)
    assert(xml.contains("<address><settlement>Cambridge</settlement>" +
      " <country>USA<lb/></country></address>"), xml)
  }

  test("segmentation: header/body regions, O lines at root") {
    val lines = Seq(
      lineOf("A Title", "<header>"),
      lineOf("stray page number", "O"),
      lineOf("body words here", "<body>"))
    val xml = TrainingData.trainingXmlBody(lines,
      TrainingData.SegmentationRoot, TrainingData.SegmentationPaths)
    assert(xml == "<text><front>A Title<lb/></front>\nstray page number<lb/>\n" +
      "<body>body words here<lb/></body>\n</text>", xml)
  }

  test("fulltext: mapped <other> wins over current-path fallback; markers nest in p") {
    val lines = Seq(
      Seq(("see", " ", "B-<paragraph>"), ("[1]", " ", "B-<citation_marker>"),
        ("now", "", "B-<paragraph>")),
      lineOf("margin junk", "<other>"))
    val xml = TrainingData.trainingXmlBody(lines,
      TrainingData.FulltextRoot, TrainingData.FulltextPaths)
    assert(xml.contains("""<p>see <ref type="biblio">[1]</ref> now<lb/></p>"""), xml)
    assert(xml.contains("""<note type="other">margin junk<lb/></note>"""), xml)
  }

  test("header training XML over the labeled token table") {
    val spark = SparkSuite.session
    import spark.implicits._
    val ps = new PipelineSpec()
    val tokens = graft.sources.AltoReader.tokens(Seq((0L, ps.altoXml)).toDS()).toDF()
    val labeled = new graft.pipeline.RuleLabeler().label(tokens)
    val out = TrainingData.headerTrainingXml(labeled).collect()
    assert(out.length == 1)
    val xml = out.head.getString(1)
    assert(xml.startsWith("<tei><text><front>"))
    assert(xml.contains("<docTitle><titlePart>A Title"), xml)
    assert(xml.contains("<byline><docAuthor>Jane Doe"), xml)
  }
}
