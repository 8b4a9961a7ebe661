package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{BioSpans, CrfLabeler, CrfModel, HeaderFeatures}

/** Pure-JVM CRF inference (D1/D2 backend): model parsing, pattern
  * expansion, Viterbi decoding — including a case where the Viterbi
  * path differs from per-token argmax (proving transitions are used,
  * i.e. this is sequence decoding, not pointwise classification).
  */
class CrfLabelerSpec extends SparkSuite {
  import spark.implicits._

  private val simpleModel =
    """[labels]
      |O
      |B-<title>
      |I-<title>
      |[patterns]
      |U00:%x[0,0]
      |B
      |[weights]
      |U00:Title	B-<title>	2.0
      |U00:Case	I-<title>	2.0
      |B:	B-<title>	I-<title>	0.5
      |""".stripMargin

  test("parse: labels, patterns, unigram + transition weights") {
    val m = CrfModel.parse(simpleModel)
    assert(m.labels == Seq("O", "B-<title>", "I-<title>"))
    assert(m.patterns.size == 2)
    assert(m.unigram("U00:Title")(1) == 2.0)
    assert(m.transition(1)(2) == 0.5)
  }

  test("decode: emission argmax on matched observations") {
    val m = CrfModel.parse(simpleModel)
    assert(m.decode(Seq("Title x", "Case y", "other z")) ==
      Seq("B-<title>", "I-<title>", "O"))
  }

  // wapiti native model-file format (wapiti model.c mdl_save layout):
  // observations in quark order take nlbl unigram slots (u/U), nlbl^2
  // transition slots (b/B), or both (*). Weights are sparse C %la hex
  // floats. Feature ids here: u:Title -> 0,1; u:other -> 2,3;
  // U1:_x-1 -> 4,5; b -> 6..9 ([prev*2+next]).
  private val nativeModel =
    """#mdl#2#5
      |#rdr#3/2/0
      |#pat#3
      |u:%x[0,0]
      |U1:%x[-1,0]
      |b
      |#qrk#2
      |O
      |Y
      |#qrk#4
      |u:Title
      |u:other
      |U1:_x-1
      |b
      |1=0x1p+1
      |2=0x1p+0
      |3=-0x1.8p+0
      |5=0x1p-1
      |9=0x1p-1
      |""".stripMargin

  test("wapiti native: header/quark/sparse-weight parsing and feature layout") {
    val m = CrfModel.parseWapitiNative(nativeModel)
    assert(m.labels == Seq("O", "Y"))
    assert(m.unigram("u:Title").toSeq == Seq(0.0, 2.0))
    assert(m.unigram("u:other").toSeq == Seq(1.0, -1.5)) // hex-negative weight
    assert(m.unigram("U1:_x-1").toSeq == Seq(0.0, 0.5))
    // the constant `b` template folds into the static transition matrix
    assert(m.transition(1)(1) == 0.5 && m.transition(0)(0) == 0.0)
    assert(m.bigramObs.isEmpty)
  }

  test("wapiti native: template expansion + Viterbi over data lines") {
    val m = CrfModel.parse(nativeModel) // auto-detected by #mdl# header
    // t0 BOS: U1:%x[-1,0] expands to wapiti's _x-1 -> Y boost;
    // Y->Y transition keeps Y at t1; "other" flips to O at t2
    assert(m.decode(Seq("Title a", "Title b", "other c")) == Seq("Y", "Y", "O"))
  }

  test("wapiti native: equivalent simple-format model decodes identically") {
    val simple = CrfModel.parse(
      """[labels]
        |O
        |Y
        |[patterns]
        |U00:%x[0,0]
        |B
        |[weights]
        |U00:Title	Y	2.0
        |U00:other	O	1.0
        |U00:other	Y	-1.5
        |B:	Y	Y	0.5
        |""".stripMargin)
    val native = CrfModel.parse(
      """#mdl#2#4
        |#rdr#2/2/0
        |#pat#2
        |U00:%x[0,0]
        |b
        |#qrk#2
        |O
        |Y
        |#qrk#3
        |U00:Title
        |U00:other
        |b
        |1=0x1p+1
        |2=0x1p+0
        |3=-0x1.8p+0
        |7=0x1p-1
        |""".stripMargin)
    val data = Seq("Title x", "Title y", "other z", "Title w")
    assert(native.decode(data) == simple.decode(data))
    assert(native.decode(data) == Seq("Y", "Y", "O", "Y"))
  }

  test("wapiti native: observation-dependent bigram and %X lowercasing") {
    // *-kind observation takes a unigram block THEN a bigram block;
    // %X lowercases the cell value. Layout: *:strong -> uni 0,1 + big
    // 2..5; u2:x -> 6,7.
    val m = CrfModel.parseWapitiNative(
      """#mdl#2#3
        |#rdr#2/2/0
        |#pat#2
        |*:%X[0,1]
        |u2:%x[0,0]
        |#qrk#2
        |O
        |Y
        |#qrk#2
        |*:strong
        |u2:x
        |1=0x1p+0
        |5=0x1.8p+1
        |6=0x1p+1
        |""".stripMargin)
    assert(m.bigramObs("*:strong").toSeq == Seq(0.0, 0.0, 0.0, 3.0))
    // t1 has col1 "STRONG" -> lowercased matches *:strong: unigram Y+1
    // and Y->Y transition +3 beat the O emissions (2 each)
    assert(m.decode(Seq("x STRONG a", "x STRONG b")) == Seq("Y", "Y"))
  }

  test("wapiti native: malformed weight line errors carry the line number") {
    val broken = nativeModel.replace("5=0x1p-1", "5=not-a-number")
    val ex = intercept[IllegalArgumentException] {
      CrfModel.parseWapitiNative(broken)
    }
    // 1-based line of the corrupt entry, plus its content
    assert(ex.getMessage.contains("not-a-number"), ex.getMessage)
    assert(ex.getMessage.matches("(?s).*weight line \\d+.*"), ex.getMessage)
    val noEq = nativeModel.replace("5=0x1p-1", "garbage")
    val ex2 = intercept[IllegalArgumentException] {
      CrfModel.parseWapitiNative(noEq)
    }
    assert(ex2.getMessage.contains("garbage") &&
      ex2.getMessage.matches("(?s).*weight line \\d+.*"), ex2.getMessage)
  }

  test("fromFile: gzipped model.wapiti.gz loads via magic-byte detection") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wapiti")
    val gz = dir.resolve("model.wapiti.gz")
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(gz))
    out.write(nativeModel.getBytes("UTF-8"))
    out.close()
    try {
      val labeler = graft.pipeline.CrfLabeler.fromFile(gz.toString)
      val df = Seq(
        (0L, 0, 0, 0, 0, "Title", " ", "Title a"),
        (0L, 0, 0, 0, 1, "other", " ", "other b"))
        .toDF("doc_id", "page_idx", "block_idx", "line_idx", "token_idx",
          "text", "whitespace", "features")
      val labels = labeler.label(df).orderBy("token_idx")
        .select("label").collect().map(_.getString(0)).toSeq
      assert(labels == Seq("Y", "O"))
    } finally {
      java.nio.file.Files.deleteIfExists(gz)
      java.nio.file.Files.deleteIfExists(dir)
    }
  }

  test("wapiti native: dense (zero-included) dump equals the sparse dump; " +
      "* observation takes unigram then bigram blocks") {
    // layout with labels {O,Y}: u:Title -> ids 0,1; *Mix -> unigram
    // 2,3 then bigram 4..7; b -> 8..11. Weights mix hex floats and
    // plain decimals (both appear in real dumps).
    val header =
      """#mdl#2#12
        |#rdr#3/2/0
        |#pat#3
        |u:%x[0,0]
        |*%x[0,1]
        |b
        |#qrk#2
        |O
        |Y
        |#qrk#3
        |u:Title
        |*Mix
        |b
        |""".stripMargin
    val sparse = header +
      """1=0x1p+1
        |3=1.25
        |7=0x1.8p+0
        |10=0x1p-1
        |""".stripMargin
    // the dense dump writes EVERY feature id, zeros included
    val sparseW = Map(1L -> 2.0, 3L -> 1.25, 7L -> 1.5, 10L -> 0.5)
    val dense = header + (0L to 11L).map(id =>
      s"$id=${sparseW.getOrElse(id, 0.0)}").mkString("", "\n", "\n")
    val ms = CrfModel.parse(sparse)
    val md = CrfModel.parse(dense)
    assert(ms.labels == md.labels)
    assert(ms.unigram.keySet == md.unigram.keySet &&
      ms.unigram.forall { case (k, v) => md.unigram(k).toSeq == v.toSeq })
    assert(ms.bigramObs.keySet == md.bigramObs.keySet &&
      ms.bigramObs.forall { case (k, v) => md.bigramObs(k).toSeq == v.toSeq })
    assert(ms.transition.map(_.toSeq).toSeq == md.transition.map(_.toSeq).toSeq)
    // the * observation carries BOTH blocks: unigram Y weight at id 3,
    // bigram [Y->Y] at id 7 (offset 4 + prev*2 + next = 4+3)
    assert(ms.unigram("*Mix").toSeq == Seq(0.0, 1.25))
    assert(ms.bigramObs("*Mix").toSeq == Seq(0.0, 0.0, 0.0, 1.5))
    // constant b folds to static transitions: id 10 = [Y][O]
    assert(ms.transition(1)(0) == 0.5)
    // and both decode identically on data exercising every block
    val data = Seq("Title Mix", "other Mix", "Title Mix", "other other")
    assert(ms.decode(data) == md.decode(data))
  }

  test("parse: a unigram pattern id beginning with B is not a transition") {
    val m = CrfModel.parse(
      """[labels]
        |O
        |X
        |[patterns]
        |B12:%x[0,0]
        |B
        |[weights]
        |B12:hit	X	2.0
        |B:	X	X	0.5
        |""".stripMargin)
    assert(m.patterns.collect { case u: CrfModel.Unigram => u.id } == Seq("B12"))
    assert(m.unigram("B12:hit")(1) == 2.0)
    assert(m.transition(1)(1) == 0.5)
    // X,X (2.0 + B: trans 0.5) beats X,O (2.0) — the B: line acted as a
    // transition while B12: stayed observational
    assert(m.decode(Seq("hit a", "miss b")) == Seq("X", "X"))
  }

  test("decode: Viterbi path beats per-token argmax when transitions say so") {
    // emissions favor X at both steps (2.0, 0.5) but X->X is heavily
    // penalized: best path is [X, Y] (2.0 + 0 + 0) over [X, X]
    // (2.0 + 0.5 - 10). Pointwise argmax would output [X, X].
    val m = CrfModel.parse(
      """[labels]
        |X
        |Y
        |[patterns]
        |U00:%x[0,0]
        |B
        |[weights]
        |U00:a	X	2.0
        |U00:b	X	0.5
        |B:	X	X	-10.0
        |""".stripMargin)
    assert(m.decode(Seq("a", "b")) == Seq("X", "Y"))
  }

  test("decode: %x[-1,c] pattern sees the previous row; out-of-range is _X") {
    // label the token AFTER "Dr" as a name, via the -1 offset pattern
    val m = CrfModel.parse(
      """[labels]
        |O
        |NAME
        |[patterns]
        |U01:%x[-1,0]
        |[weights]
        |U01:Dr	NAME	1.0
        |U01:_X[-1,0]	O	1.0
        |""".stripMargin)
    assert(m.decode(Seq("Dr", "Who", "said")) == Seq("O", "NAME", "O"))
  }

  test("decode: conjunction pattern joins multiple cells") {
    val m = CrfModel.parse(
      """[labels]
        |O
        |HIT
        |[patterns]
        |U02:%x[0,0]/%x[0,1]
        |[weights]
        |U02:a|b	HIT	1.0
        |""".stripMargin)
    assert(m.decode(Seq("a b", "a c", "b b")) == Seq("HIT", "O", "O"))
  }

  test("CrfLabeler: end-to-end over the token table -> BIO spans") {
    // model keyed on the real header data-line columns: col 28 is the
    // largest-font flag ('1' on the synthesized title block)
    val model =
      """[labels]
        |O
        |B-<title>
        |I-<title>
        |[patterns]
        |U00:%x[0,28]
        |U01:%x[-1,28]/%x[0,28]
        |B
        |[weights]
        |U00:1	B-<title>	1.0
        |U00:0	O	1.0
        |U01:1|1	I-<title>	1.5
        |B:	B-<title>	I-<title>	0.25
        |B:	I-<title>	I-<title>	0.25
        |""".stripMargin
    val xml = new PipelineSpec().altoXml
    val tokens = graft.sources.AltoReader.tokens(Seq((0L, xml)).toDS()).toDF()
    val lines = HeaderFeatures.dataLines(tokens)
      .withColumnRenamed("data_line", "features")
    val labeled = new CrfLabeler(model).label(lines)
    val byText = labeled.select("text", "label").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byText("A") == "B-<title>" && byText("Title") == "I-<title>")
    assert(byText("Jane") == "O" && byText("Doe") == "O")
    val spans = BioSpans.spans(labeled)
    assert(spans.filter(col("tag") === "<title>").count() == 1)
  }
}
