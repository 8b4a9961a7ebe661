package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{HeaderFeatures, RuleLabeler, TrainingData}
import graft.sources.AltoReader

/** DELFT training-data export (reference
  * `training/cli/generate_delft_data.py` +
  * `tests/training/cli/generate_delft_data_test.py` expectations):
  * IOB→GROBID tag translation and the data-line format
  * `token feat… tag`.
  */
class DelftDataSpec extends SparkSuite {
  import spark.implicits._

  private def labeledLines(rows: Seq[(Long, Int, String, String)]) =
    rows.zipWithIndex.map { case ((doc, tok, dl, label), _) =>
      (doc, 0, 0, 0, tok, dl, label)
    }.toDF("doc_id", "page_idx", "block_idx", "line_idx", "token_idx",
      "data_line", "label")

  test("IOB tags translate to GROBID convention in the final field") {
    // generate_delft_data.py:76-89: O-><other>, B-x->I-x, I-x->x
    val out = TrainingData.delftData(labeledLines(Seq(
        (0L, 0, "token1 f1 f2 0", "B-<title>"),
        (0L, 1, "token2 f1 f2 0", "I-<title>"),
        (0L, 2, "token3 f1 f2 0", "O"))))
      .collect().head.getAs[String]("delft_data")
    assert(out == Seq(
      "token1 f1 f2 I-<title>",
      "token2 f1 f2 <title>",
      "token3 f1 f2 <other>").mkString("\n"))
  }

  test("lines are document-ordered and grouped per document") {
    val out = TrainingData.delftData(labeledLines(Seq(
        (1L, 1, "b x 0", "I-<author>"),
        (1L, 0, "a x 0", "B-<author>"),
        (0L, 0, "c x 0", "O"))))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == "c x <other>")
    assert(out(1L) == "a x I-<author>\nb x <author>")
  }

  test("end-to-end: header data lines + rule labels -> DELFT block") {
    val altoXml =
      """<alto xmlns="http://www.loc.gov/standards/alto/ns-v3#">
        |  <Styles>
        |    <TextStyle ID="f0" FONTFAMILY="Times" FONTSIZE="18.0" FONTSTYLE="bold"/>
        |    <TextStyle ID="f1" FONTFAMILY="Times" FONTSIZE="9.5" FONTSTYLE=""/>
        |  </Styles>
        |  <Layout><Page PHYSICAL_IMG_NR="1" WIDTH="612" HEIGHT="792"><PrintSpace>
        |    <TextBlock><TextLine>
        |      <String CONTENT="A" HPOS="100" VPOS="60" WIDTH="14" HEIGHT="18" STYLEREFS="f0"/>
        |      <String CONTENT="Title" HPOS="118" VPOS="60" WIDTH="48" HEIGHT="18" STYLEREFS="f0"/>
        |    </TextLine></TextBlock>
        |    <TextBlock><TextLine>
        |      <String CONTENT="Jane" HPOS="100" VPOS="90" WIDTH="30" HEIGHT="10" STYLEREFS="f1"/>
        |    </TextLine></TextBlock>
        |  </PrintSpace></Page></Layout></alto>""".stripMargin
    val tokens = AltoReader.tokens(Seq((0L, altoXml)).toDS()).toDF()
    val block = TrainingData.delftData(
        new RuleLabeler().label(HeaderFeatures.dataLines(tokens)))
      .collect().head.getAs[String]("delft_data")
    val lines = block.split("\n")
    assert(lines.length == 3)
    // data-line first field is the token, last the translated tag
    assert(lines(0).startsWith("A ") && lines(0).endsWith(" I-<title>"))
    assert(lines(1).startsWith("Title ") && lines(1).endsWith(" <title>"))
    assert(lines(2).startsWith("Jane ") && lines(2).endsWith(" I-<author>"))
    // 32 fields: 31 features + the tag
    assert(lines(0).split(" ").length == 32)
  }
}
