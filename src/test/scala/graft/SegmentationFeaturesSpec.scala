package graft

import org.apache.spark.sql.functions._

import graft.pipeline.SegmentationFeatures
import graft.sources.AltoReader

/** Golden 34-feature data lines, hand-derived by executing the
  * reference generator's logic (models/segmentation/data.py) over the
  * FIXTURES.md ALTO sample.
  */
class SegmentationFeaturesSpec extends SparkSuite {
  import spark.implicits._

  private val NBSP = "\u00A0"

  private def fixtureTokens = {
    val xml = new PipelineSpec().altoXml
    AltoReader.tokens(Seq((0L, xml)).toDS()).toDF()
  }

  test("34-feature data lines match hand-derived reference values") {
    val lines = SegmentationFeatures.dataLines(fixtureTokens)
      .orderBy("doc_id", "page_idx", "block_idx", "line_idx")
      .select("data_line").collect().map(_.getString(0))
    assert(lines.length == 2)
    // line 1: "A Title" — first token "A", 1 of 1 line in block 0 of 2
    assert(lines(0) ==
      "A Title a A A A A BLOCKSTART PAGESTART NEWFONT HIGHERFONT 1 0 " +
        "ALLCAP NODIGIT 1 0 0 0 0 0 0 0 0 0 no 0 10 0 0 0 0 1 " +
        s"A${NBSP}Title")
    // line 2: "Jane Doe" — same font family Times → SAMEFONT, smaller
    // size → LOWERFONT; last block+line → PAGEEND; doc pos 2/4*12 = 6
    assert(lines(1) ==
      "Jane Doe jane J Ja Jan Jane BLOCKSTART PAGEEND SAMEFONT LOWERFONT 0 0 " +
        "INITCAP NODIGIT 0 0 0 0 0 0 0 0 6 0 no 0 10 0 0 0 0 1 " +
        s"Jane${NBSP}Doe")
  }

  test("every data line has exactly 34 space-separated fields") {
    // NBSP inside the whole-line feature must survive the space join
    val lines = SegmentationFeatures.dataLines(fixtureTokens)
      .select("data_line").collect().map(_.getString(0))
    lines.foreach { l =>
      assert(l.split(" ").length == 34, s"field count in: $l")
    }
  }

  test("use_first_token_of_block=false selects the line's own first token") {
    // reference models/segmentation/data.py:209-214: the Java-GROBID
    // default takes the BLOCK's first token for every line; the false
    // variant takes each LINE's first token. Block with two lines whose
    // first tokens differ in font size — the second line's font-size
    // status flips between the variants.
    val xml =
      """<alto xmlns="http://www.loc.gov/standards/alto/ns-v3#">
        |<Styles>
        |<TextStyle ID="f1" FONTFAMILY="Times" FONTSIZE="10.0" FONTSTYLE=""/>
        |<TextStyle ID="f2" FONTFAMILY="Times" FONTSIZE="18.0" FONTSTYLE=""/>
        |</Styles>
        |<Layout><Page PHYSICAL_IMG_NR="1" WIDTH="612" HEIGHT="792"><PrintSpace>
        |<TextBlock>
        |<TextLine><String CONTENT="small" HPOS="50" VPOS="40" WIDTH="40" HEIGHT="10" STYLEREFS="f1"/></TextLine>
        |<TextLine><String CONTENT="big" HPOS="50" VPOS="60" WIDTH="40" HEIGHT="18" STYLEREFS="f2"/></TextLine>
        |</TextBlock>
        |</PrintSpace></Page></Layout></alto>""".stripMargin
    val toks = AltoReader.tokens(Seq((0L, xml)).toDS()).toDF()
    def sizeStatus(blockFirst: Boolean): Seq[String] =
      SegmentationFeatures.dataLines(toks, useFirstTokenOfBlock = blockFirst)
        .orderBy("line_idx").select("data_line").collect()
        .map(_.getString(0).split(" ")(10)).toSeq
    // block-first: line 2 compares block token vs block token -> same size
    assert(sizeStatus(true) == Seq("HIGHERFONT", "SAMEFONTSIZE"))
    // line-first: line 2's own 18pt token vs line 1's 10pt -> HIGHERFONT
    assert(sizeStatus(false) == Seq("HIGHERFONT", "HIGHERFONT"))
  }

  test("repetitive patterns: repeated page-edge lines are flagged") {
    // 3 pages, each with the same long header line first + a body block
    def page(n: Int, header: String) =
      s"""<Page PHYSICAL_IMG_NR="$n" WIDTH="612" HEIGHT="792"><PrintSpace>
         |<TextBlock><TextLine>${header.split(" ").zipWithIndex.map { case (w, i) =>
        s"""<String CONTENT="$w" HPOS="${50 + i * 60}" VPOS="40" WIDTH="55" HEIGHT="10" STYLEREFS="f1"/>"""
      }.mkString}</TextLine></TextBlock>
         |<TextBlock><TextLine><String CONTENT="body$n" HPOS="50" VPOS="200" WIDTH="40" HEIGHT="10" STYLEREFS="f1"/></TextLine></TextBlock>
         |</PrintSpace></Page>""".stripMargin
    val xml =
      s"""<alto xmlns="http://www.loc.gov/standards/alto/ns-v3#">
         |<Styles><TextStyle ID="f1" FONTFAMILY="Times" FONTSIZE="10.0" FONTSTYLE=""/></Styles>
         |<Layout>${page(1, "Journal of Interesting Results")}
         |${page(2, "Journal of Interesting Results")}
         |${page(3, "Journal of Interesting Results")}</Layout></alto>""".stripMargin
    val toks = AltoReader.tokens(Seq((0L, xml)).toDS()).toDF()
    val lines = SegmentationFeatures.dataLines(toks)
      .orderBy("page_idx", "block_idx", "line_idx")
      .select("line_text", "data_line").collect()
    val headers = lines.filter(_.getString(0) == "Journal of Interesting Results")
    assert(headers.length == 3)
    val flags = headers.map(_.getString(1).split(" ").slice(30, 32).toSeq)
    assert(flags(0) == Seq("1", "1")) // repetitive + first occurrence
    assert(flags(1) == Seq("1", "0"))
    assert(flags(2) == Seq("1", "0"))
    val bodies = lines.filter(_.getString(0).startsWith("body"))
    assert(bodies.forall(_.getString(1).split(" ").slice(30, 32).toSeq == Seq("0", "0")))
  }
}
