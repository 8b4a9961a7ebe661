package graft

import graft.sources.{AltoReader, AltoWriter, DocxReader, PdfReader}
import graft.sources.DocxReader.Run

/** The in-JVM A3 seam: OOXML parse (paragraphs/runs/rPr/breaks),
  * docx → PDF → token chain, sniffing, the ALTO serializer identity,
  * and the Spark quarantine surface.
  */
class DocxSpec extends SparkSuite {
  import spark.implicits._

  private def fixture = DocxReader.buildDocx(Seq(
    ("Title", Seq(Run("Measuring Corpus Quality", bold = false,
      italic = false))),
    ("", Seq(Run("Alice Smith", bold = false, italic = false))),
    ("Heading1", Seq(Run("Introduction", bold = false, italic = false))),
    ("", Seq(
      Run("Plain text with ", bold = false, italic = false),
      Run("bold words", bold = true, italic = false),
      Run(" and ", bold = false, italic = false),
      Run("italic ones", bold = false, italic = true),
      Run(" mixed in.", bold = false, italic = false)))))

  test("OOXML parse: styles, run properties, explicit false flags, " +
      "tabs and breaks") {
    val paras = DocxReader.parse(fixture)
    assert(paras.map(_.style) == Seq("Title", "", "Heading1", ""))
    assert(paras(0).runs.head.map(_.text) == Seq("Measuring Corpus Quality"))
    val body = paras(3).runs.head
    assert(body.map(r => (r.bold, r.italic)) == Seq(
      (false, false), (true, false), (false, false), (false, true),
      (false, false)))
    // w:val="false"/"0" clears a flag; w:br splits run groups
    val tricky = DocxReader.buildDocx(Seq(("", Seq(
      Run("a", bold = true, italic = false))))).pipe { _ =>
      // hand-build the XML shapes buildDocx doesn't emit
      val w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
      val doc =
        s"""<?xml version="1.0"?><w:document xmlns:w="$w"><w:body>
           |<w:p><w:r><w:rPr><w:b w:val="false"/><w:i w:val="0"/></w:rPr>
           |<w:t>off</w:t></w:r>
           |<w:r><w:t xml:space="preserve">one</w:t><w:br/>
           |<w:t xml:space="preserve">two</w:t></w:r>
           |<w:r><w:t>a</w:t><w:tab/><w:t>b</w:t></w:r></w:p>
           |</w:body></w:document>""".stripMargin
      rezip(fixture, doc)
    }
    val p = DocxReader.parse(tricky)
    assert(p.length == 1)
    assert(p.head.runs.length == 2, p.head.runs) // br split
    assert(p.head.runs.head.map(_.text) == Seq("off", "one"))
    assert(!p.head.runs.head.head.bold && !p.head.runs.head.head.italic)
    assert(p.head.runs(1).map(_.text) == Seq("two", "a b"))
  }

  private def rezip(base: Array[Byte], newDocXml: String): Array[Byte] = {
    import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
    val out = new java.io.ByteArrayOutputStream()
    val zout = new ZipOutputStream(out)
    val zin = new ZipInputStream(new java.io.ByteArrayInputStream(base))
    var e = zin.getNextEntry
    while (e != null) {
      zout.putNextEntry(new ZipEntry(e.getName))
      if (e.getName == "word/document.xml")
        zout.write(newDocXml.getBytes("UTF-8"))
      else {
        val buf = new Array[Byte](8192)
        var n = zin.read(buf)
        while (n > 0) { zout.write(buf, 0, n); n = zin.read(buf) }
      }
      zout.closeEntry()
      e = zin.getNextEntry
    }
    zin.close(); zout.close()
    out.toByteArray
  }

  test("docx -> PDF -> token chain: heading sizes, paragraph blocks, " +
      "run styling and word wrap survive") {
    val rows = DocxReader.parseTokens(4L, fixture)
    val byText = rows.groupBy(_.text)
    // Title style renders 18 pt bold, Heading1 14 pt bold, body 9.5
    assert(byText("Measuring").head.font.font_size.contains(18.0))
    assert(byText("Measuring").head.font.is_bold)
    assert(byText("Introduction").head.font.font_size.contains(14.0))
    assert(byText("Introduction").head.font.is_bold)
    assert(byText("Plain").head.font.font_size.contains(9.5))
    // run styling: bold/italic stretches carry their flags
    assert(byText("bold").head.font.is_bold)
    assert(byText("words").head.font.is_bold)
    assert(byText("italic").head.font.is_italics)
    assert(byText("mixed").head.font.is_bold == false)
    // paragraph gaps segment into blocks: title, author, heading, body
    assert(rows.map(_.block_idx).distinct.sorted == Seq(0, 1, 2, 3))
    assert(byText("Measuring").head.block_idx == 0)
    assert(byText("Alice").head.block_idx == 1)
    assert(byText("Introduction").head.block_idx == 2)
    assert(byText("Plain").head.block_idx == 3)
    // long paragraphs wrap into multiple lines of one block
    val long = DocxReader.buildDocx(Seq(("",
      Seq(Run((1 to 120).map(i => s"w$i").mkString(" "), bold = false,
        italic = false)))))
    val longRows = DocxReader.parseTokens(5L, long)
    assert(longRows.map(_.text) == (1 to 120).map(i => s"w$i"))
    assert(longRows.map(_.line_idx).distinct.length > 1)
    assert(longRows.map(_.block_idx).distinct == Seq(0))
  }

  test("sniffing: isDocx accepts OOXML packages, rejects plain zips, " +
      "PDFs and garbage") {
    assert(DocxReader.isDocx(fixture))
    assert(!DocxReader.isDocx("%PDF-1.4".getBytes))
    assert(!DocxReader.isDocx("garbage".getBytes))
    val plainZip = {
      val out = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(out)
      z.putNextEntry(new java.util.zip.ZipEntry("readme.txt"))
      z.write("hi".getBytes)
      z.closeEntry(); z.close()
      out.toByteArray
    }
    assert(!DocxReader.isDocx(plainZip))
  }

  test("AltoWriter serializes the token table back to ALTO that " +
      "AltoReader parses to the IDENTICAL table") {
    val rows = DocxReader.parseTokens(6L, fixture)
    val alto = AltoWriter.toAlto(rows)
    val back = AltoReader.tokens(Seq((6L, alto)).toDS()).collect().toSeq
    assert(back.length == rows.length, s"${back.length} vs ${rows.length}")
    rows.zip(back).foreach { case (a, b) =>
      assert(a.text == b.text, s"${a.text} vs ${b.text}")
      assert((a.page_idx, a.block_idx, a.line_idx, a.token_idx) ==
        (b.page_idx, b.block_idx, b.line_idx, b.token_idx), a.text)
      assert(a.whitespace == b.whitespace)
      assert(a.font.is_bold == b.font.is_bold, a.text)
      assert(a.font.is_italics == b.font.is_italics, a.text)
      assert(a.font.font_size == b.font.font_size)
      val (ac, bc) = (a.coords.get, b.coords.get)
      assert(math.abs(ac.x - bc.x) < 1e-9 && math.abs(ac.y - bc.y) < 1e-9)
      assert(math.abs(ac.width - bc.width) < 1e-9)
      assert((a.page_width, a.page_height) == (b.page_width, b.page_height))
    }
  }

  test("Spark surface: tokens distributes per doc; quarantine captures " +
      "broken packages") {
    val ds = Seq((1L, fixture), (2L, "PK garbage".getBytes)).toDS()
    val rows = DocxReader.tokens(
      Seq((1L, fixture)).toDS()).collect()
    assert(rows.length > 10 && rows.forall(_.doc_id == 1L))
    val q = DocxReader.quarantine(ds).collect()
    assert(q.length == 1 && q.head.getLong(0) == 2L)
  }

  implicit private class PipeOps[A](private val a: A) {
    def pipe[B](f: A => B): B = f(a)
  }
}
