package graft

import graft.pipeline.ModelDataGenerators
import graft.pipeline.ModelDataGenerators.Lexica
import graft.sources.AltoReader

/** Width invariants + hand-derived goldens for the five per-model
  * token data-line generators.
  */
class ModelDataGeneratorsSpec extends SparkSuite {
  import spark.implicits._

  private def fixtureTokens =
    AltoReader.tokens(Seq((0L, new PipelineSpec().altoXml)).toDS()).toDF()

  private def linesOf(df: org.apache.spark.sql.DataFrame): Array[String] =
    df.orderBy("doc_id", "page_idx", "block_idx", "line_idx", "token_idx")
      .select("data_line").collect().map(_.getString(0))

  test("per-model vector widths match the reference contracts") {
    val toks = fixtureTokens
    val widths = Map(
      ModelDataGenerators.fulltextDataLines(toks) -> 27,
      ModelDataGenerators.citationDataLines(toks) -> 30,
      ModelDataGenerators.nameDataLines(toks) -> 21,
      ModelDataGenerators.affiliationDataLines(toks) -> 22,
      ModelDataGenerators.referenceSegmenterDataLines(toks) -> 28,
    )
    widths.foreach { case (df, n) =>
      linesOf(df).foreach(l => assert(l.split(" ").length == n, s"width $n: $l"))
    }
  }

  test("name model golden line (with lexica)") {
    val lex = Lexica(firstNames = Set("jane"), lastNames = Set("doe"))
    val lines = linesOf(ModelDataGenerators.nameDataLines(fixtureTokens, lex))
    // "Jane": LINESTART (lineend variant: not last), INITCAP, first-name hit
    assert(lines(2) ==
      "Jane jane J Ja Jan Jane e ne ane Jane LINESTART INITCAP NODIGIT 0 0 1 0 0 0 NOPUNCT 0")
    // "Doe": LINEEND, last-name hit
    assert(lines(3) ==
      "Doe doe D Do Doe Doe e oe Doe Doe LINEEND INITCAP NODIGIT 0 0 0 1 0 0 NOPUNCT 0")
  }

  test("affiliation model golden line: ALLCAPS variant, word shape, country") {
    val lex = Lexica(countries = Set("doe")) // pretend for the lookup path
    val lines = linesOf(ModelDataGenerators.affiliationDataLines(fixtureTokens, lex))
    // "A": ALLCAP -> ALLCAPS variant; word shape "X"; LINEEND dummy
    assert(lines(0) ==
      "A a A A A A A A A A LINEEND ALLCAPS NODIGIT 1 0 0 0 0 0 NOPUNCT X 0")
    assert(lines(3) ==
      "Doe doe D Do Doe Doe e oe Doe Doe LINEEND INITCAP NODIGIT 0 0 0 0 0 1 NOPUNCT Xxx 0")
  }

  test("reference-segmenter golden: line profile + relative positions") {
    val lines = linesOf(ModelDataGenerators.referenceSegmenterDataLines(fixtureTokens))
    // "A Title" line: concat text "ATitle" (6 chars); token "A" at pos 0
    // -> rel pos 0; line length 6 == doc max 7? "JaneDoe" is 7 -> bin
    // floor(6/7*10)=8; no punctuation -> profile "no", truncated len 0
    assert(lines(0) ==
      "A a A A A A A A A A LINESTART ALIGNEDLEFT ALLCAP NODIGIT 1 0 0 0 0 0 0 0 no 0 8 BLOCKSTART 0 0")
    // "Title": char pos 1 of 6 -> floor(1/6*10)=1
    assert(lines(1) ==
      "Title title T Ti Tit Titl e le tle itle LINEEND ALIGNEDLEFT INITCAP NODIGIT 0 0 0 0 0 0 0 0 no 1 8 BLOCKEND 0 0")
  }

  test("citation golden: sentence-relative position bins") {
    val lines = linesOf(ModelDataGenerators.citationDataLines(fixtureTokens))
    // 4 tokens; token 3 ("Doe") -> floor(3/4*12)=9
    assert(lines(3) ==
      "Doe doe D Do Doe Doe e oe Doe Doe LINEEND INITCAP NODIGIT 0 0 0 0 0 0 0 0 0 0 0 0 0 0 NOPUNCT 9 0")
  }

  test("fulltext golden: blockstart variant + superscript flag") {
    val lines = linesOf(ModelDataGenerators.fulltextDataLines(fixtureTokens))
    assert(lines(0) ==
      "A a A A A A A A A A BLOCKSTART LINESTART ALIGNEDLEFT NEWFONT HIGHERFONT " +
        "1 0 ALLCAP NODIGIT 1 NOPUNCT 0 0 0 UNKNOWN 0 0")
  }
}
