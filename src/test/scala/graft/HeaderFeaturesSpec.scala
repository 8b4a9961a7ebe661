package graft

import graft.pipeline.HeaderFeatures
import graft.sources.AltoReader

/** Golden 32-feature header-model data lines, hand-derived from the
  * reference generator (models/header/data.py + models/data.py) over
  * the FIXTURES.md ALTO sample.
  */
class HeaderFeaturesSpec extends SparkSuite {
  import spark.implicits._

  test("digit/caps/punct classification matrices match the reference") {
    import graft.pipeline.Features
    import org.apache.spark.sql.functions.col
    // models/data_test.py TestGetDigitFeature / CapitalisationFeature /
    // PunctuationTypeFeature — the full expectation matrices
    val inputs = Seq(
      "abc", "123", "abc123xyz", "ABC", "Abc", "*",
      "(", "[", ")", "]", ".", ",", "-", "\u2013",
      "\"", "'", "`", "\u2019", ",,", "::", ";;", "??", "..")
    val got = inputs.toDF("text").select(col("text"),
        Features.digitFeature().as("d"),
        Features.capitalisationFeature().as("c"),
        Features.punctuationTypeFeature().as("p"))
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getString(3))).toMap
    assert(got("abc") == ("NODIGIT", "NOCAPS", "NOPUNCT"))
    assert(got("123")._1 == "ALLDIGIT")
    assert(got("abc123xyz")._1 == "CONTAINSDIGITS")
    assert(got("ABC")._2 == "ALLCAP")
    assert(got("Abc")._2 == "INITCAP")
    assert(got("*")._2 == "ALLCAP") // symbols count as ALLCAP
    Seq("(", "[").foreach(t => assert(got(t)._3 == "OPENBRACKET"))
    Seq(")", "]").foreach(t => assert(got(t)._3 == "ENDBRACKET"))
    assert(got(".")._3 == "DOT")
    assert(got(",")._3 == "COMMA")
    Seq("-", "\u2013").foreach(t => assert(got(t)._3 == "HYPHEN"))
    Seq("\"", "'", "`", "\u2019").foreach(t => assert(got(t)._3 == "QUOTE"))
    Seq(",,", "::", ";;", "??", "..").foreach(t =>
      assert(got(t)._3 == "PUNCT", t))
  }

  test("32-feature token data lines match hand-derived reference values") {
    val toks = AltoReader.tokens(Seq((0L, new PipelineSpec().altoXml)).toDS()).toDF()
    val lines = HeaderFeatures.dataLines(toks)
      .orderBy("doc_id", "page_idx", "block_idx", "line_idx", "token_idx")
      .select("data_line").collect().map(_.getString(0))
    assert(lines.length == 4)
    assert(lines(0) ==
      "A a A A A A A A A A BLOCKSTART LINESTART ALIGNEDLEFT NEWFONT HIGHERFONT " +
        "1 0 ALLCAP NODIGIT 1 0 0 0 0 0 0 0 NOPUNCT 1 0 1 0")
    assert(lines(1) ==
      "Title title T Ti Tit Titl e le tle itle BLOCKEND LINEEND ALIGNEDLEFT " +
        "SAMEFONT SAMEFONTSIZE 1 0 INITCAP NODIGIT 0 0 0 0 0 0 0 0 NOPUNCT 1 0 1 0")
    assert(lines(2) ==
      "Jane jane J Ja Jan Jane e ne ane Jane BLOCKSTART LINESTART ALIGNEDLEFT " +
        "SAMEFONT LOWERFONT 0 0 INITCAP NODIGIT 0 0 0 0 0 0 0 0 NOPUNCT 0 0 1 0")
    assert(lines(3) ==
      "Doe doe D Do Doe Doe e oe Doe Doe BLOCKEND LINEEND ALIGNEDLEFT " +
        "SAMEFONT SAMEFONTSIZE 0 0 INITCAP NODIGIT 0 0 0 0 0 0 0 0 NOPUNCT 0 0 1 0")
    // width invariant
    lines.foreach(l => assert(l.split(" ").length == 32, l))
  }

  test("generic Features fontStatus/fontSizeStatus agree with the contract generator") {
    // Two implementations of C9 existed; the reference compares
    // font_family (models/data.py:131-139) and returns HIGHERFONT for a
    // missing/zero previous size (models/data.py:141-154). Assert the
    // generic Features path now matches HeaderFeatures column-for-column.
    import org.apache.spark.sql.functions.col
    val toks = AltoReader.tokens(Seq((0L, new PipelineSpec().altoXml)).toDS()).toDF()
    val generic = toks
      .withColumn("fs", graft.pipeline.Features.fontStatus)
      .withColumn("fss", graft.pipeline.Features.fontSizeStatus)
      .orderBy("page_idx", "block_idx", "line_idx", "token_idx")
      .select("fs", "fss").collect().map(r => (r.getString(0), r.getString(1)))
    val contract = HeaderFeatures.dataLines(toks)
      .orderBy("page_idx", "block_idx", "line_idx", "token_idx")
      .select(col("data_line")).collect()
      .map { r => val f = r.getString(0).split(" "); (f(13), f(14)) }
    assert(generic.toSeq == contract.toSeq)
  }

  test("sticky indentation: indented line keeps state until outdent") {
    // block with three lines: x=100, x=150 (indented), x=150 (stays), x=100 (outdent)
    def line(y: Int, x: Int, w1: String, w2: String) =
      s"""<TextLine><String CONTENT="$w1" HPOS="$x" VPOS="$y" WIDTH="40" HEIGHT="10" STYLEREFS="f1"/>
         |<String CONTENT="$w2" HPOS="${x + 45}" VPOS="$y" WIDTH="40" HEIGHT="10" STYLEREFS="f1"/></TextLine>""".stripMargin
    val xml =
      s"""<alto xmlns="http://www.loc.gov/standards/alto/ns-v3#">
         |<Styles><TextStyle ID="f1" FONTFAMILY="Times" FONTSIZE="10.0" FONTSTYLE=""/></Styles>
         |<Layout><Page PHYSICAL_IMG_NR="1" WIDTH="612" HEIGHT="792"><PrintSpace><TextBlock>
         |${line(100, 100, "first", "line")}
         |${line(114, 150, "indented", "line")}
         |${line(128, 150, "still", "indented")}
         |${line(142, 100, "back", "left")}
         |</TextBlock></PrintSpace></Page></Layout></alto>""".stripMargin
    val toks = AltoReader.tokens(Seq((0L, xml)).toDS()).toDF()
    val align = HeaderFeatures.dataLines(toks)
      .orderBy("line_idx", "token_idx")
      .select("line_idx", "data_line").collect()
      .map(r => r.getInt(0) -> r.getString(1).split(" ")(12)).toMap
    assert(align(0) == "ALIGNEDLEFT")
    assert(align(1) == "LINEINDENT")
    assert(align(2) == "LINEINDENT") // sticky
    assert(align(3) == "ALIGNEDLEFT") // outdent resets
  }
}
