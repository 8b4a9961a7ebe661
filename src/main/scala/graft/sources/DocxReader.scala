package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.pipeline.TokenRow

/** In-JVM DOCX ingestion — the A3 seam made real for the OOXML half.
  * The reference converts office documents to PDF through a
  * LibreOffice listener and feeds the result to the A1 PDF path
  * (`transformers/doc_converter_wrapper.py`, `app/parser.py:460-483`);
  * this reader keeps the exact same pipeline SHAPE — docx → PDF →
  * token table — but fully in-engine: the OOXML package (a zip) is
  * parsed from the public ECMA-376 `word/document.xml` grammar
  * (paragraphs `w:p`, runs `w:r` with `w:rPr` bold/italic, text
  * `w:t`, `w:tab`/`w:br`), laid out through [[PdfWriter]] (Helvetica
  * metrics, word wrap, heading styles sized like the corpus layout),
  * and read back through [[PdfReader]] so tokens carry real
  * coordinates and fonts. Legacy `.doc`/`.rtf` (OLE binary) stay on
  * the declared LibreOffice subprocess seam
  * ([[Subprocess.officeToPdf]]).
  */
object DocxReader {

  private val W =
    "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

  /** One styled run of text inside a paragraph. */
  final case class Run(text: String, bold: Boolean, italic: Boolean)

  /** One paragraph: style name (e.g. `Title`, `Heading1`) + runs;
    * `w:br`/`w:cr` inside a run splits into a new `lineBreak` group. */
  final case class Para(style: String, runs: Seq[Seq[Run]])

  /** `true` when the bytes look like an OOXML package: zip magic plus
    * a `word/` part (the media-sniffing rule the service applies). */
  def isDocx(bytes: Array[Byte]): Boolean = {
    if (bytes.length < 4 || bytes(0) != 'P' || bytes(1) != 'K') return false
    try {
      val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
      try {
        var e = zin.getNextEntry
        var n = 0
        while (e != null && n < 50) {
          if (e.getName.startsWith("word/")) return true
          e = zin.getNextEntry
          n += 1
        }
        false
      } finally zin.close()
    } catch { case _: Exception => false }
  }

  // ------------------------------------------------------------ parsing

  private val factoryTL: ThreadLocal[javax.xml.stream.XMLInputFactory] =
    ThreadLocal.withInitial { () =>
      val f = javax.xml.stream.XMLInputFactory.newInstance()
      f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
      f.setProperty(
        javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
        false)
      f
    }

  /** Extract `word/document.xml` from the package. */
  private def documentXml(bytes: Array[Byte]): Array[Byte] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (e.getName == "word/document.xml") {
          val out = new java.io.ByteArrayOutputStream(8192)
          val buf = new Array[Byte](8192)
          var n = zin.read(buf)
          while (n > 0) { out.write(buf, 0, n); n = zin.read(buf) }
          return out.toByteArray
        }
        e = zin.getNextEntry
      }
      throw new IllegalArgumentException("no word/document.xml in package")
    } finally zin.close()
  }

  /** Parse the OOXML body into styled paragraphs. */
  def parse(bytes: Array[Byte]): Seq[Para] = {
    val r = factoryTL.get().createXMLStreamReader(
      new ByteArrayInputStream(documentXml(bytes)))
    val paras = ListBuffer.empty[Para]
    var style = ""
    var lines: ListBuffer[ListBuffer[Run]] = null
    var runBold = false
    var runItalic = false
    var inRunProps = false
    var inText = false
    val text = new StringBuilder
    import javax.xml.stream.XMLStreamConstants._
    def flushRun(): Unit = {
      if (text.nonEmpty && lines != null) {
        lines.last += Run(text.toString, runBold, runItalic)
        text.clear()
      }
    }
    while (r.hasNext) {
      r.next() match {
        case START_ELEMENT if r.getNamespaceURI == W =>
          r.getLocalName match {
            case "p" =>
              style = ""
              lines = ListBuffer(ListBuffer.empty[Run])
            case "pStyle" if lines != null =>
              style = Option(r.getAttributeValue(W, "val")).getOrElse("")
            case "r" =>
              // run properties are PER RUN: a run without rPr is plain
              runBold = false; runItalic = false
            case "rPr" => inRunProps = true
            case "b" | "bCs" if inRunProps =>
              runBold = Option(r.getAttributeValue(W, "val"))
                .forall(v => v != "false" && v != "0")
            case "i" | "iCs" if inRunProps =>
              runItalic = Option(r.getAttributeValue(W, "val"))
                .forall(v => v != "false" && v != "0")
            case "t" => inText = true
            case "tab" if lines != null && !inRunProps => text.append(' ')
            case "br" | "cr" if lines != null && !inRunProps =>
              flushRun()
              lines += ListBuffer.empty[Run]
            case _ => ()
          }
        case CHARACTERS | CDATA if inText => text.append(r.getText)
        case END_ELEMENT if r.getNamespaceURI == W =>
          r.getLocalName match {
            case "t" => inText = false
            case "rPr" => inRunProps = false
            case "r" => flushRun()
            case "p" if lines != null =>
              flushRun()
              val ls = lines.map(_.toSeq).filter(_.nonEmpty).toSeq
              if (ls.nonEmpty) paras += Para(style, ls)
              lines = null
            case _ => ()
          }
        case _ => ()
      }
    }
    r.close()
    paras.toList
  }

  // ------------------------------------------------------------- layout

  /** docx → PDF, the in-JVM twin of the LibreOffice conversion: word
    * wrap by the REAL Helvetica advance widths, heading styles sized
    * like the corpus layout (`Title` 18 pt bold, `Heading*` 14 pt
    * bold, body 9.5 pt), 1.4× leading inside a paragraph and 2.2×
    * advance between paragraphs (which the PDF reader's whitespace-gap
    * rule segments back into one block per paragraph), paginating at
    * the page bottom.
    */
  def toPdf(bytes: Array[Byte]): Array[Byte] = {
    val paras = parse(bytes)
    val pageW = 612.0
    val pageH = 792.0
    val left = 50.0
    val right = pageW - 50.0
    val bottom = 760.0
    val pages = ListBuffer(ListBuffer.empty[PdfWriter.PTok])
    var y = 60.0
    paras.foreach { para =>
      val (size, headBold) = para.style match {
        case "Title" => (18.0, true)
        case s if s.startsWith("Heading") => (14.0, true)
        case _ => (9.5, false)
      }
      val leading = size * 1.4
      var any = false
      para.runs.foreach { line =>
        // explode runs into styled words, then wrap
        val words = line.flatMap { run =>
          run.text.split("\\s+").filter(_.nonEmpty)
            .map(w => (w, run.bold || headBold, run.italic))
        }
        var x = left
        var first = true
        words.foreach { case (w, bold, italic) =>
          val bf = (bold, italic) match {
            case (true, _) => "Helvetica-Bold"
            case (false, true) => "Helvetica"
            case _ => "Helvetica"
          }
          val ww = PdfFonts.stringWidth(bf, w, size)
          val sp = PdfFonts.width(bf, ' ') * size / 1000.0
          if (!first && x + ww > right) { x = left; y += leading }
          if (y + size > bottom) {
            pages += ListBuffer.empty[PdfWriter.PTok]
            y = 60.0
            x = left
          }
          pages.last += PdfWriter.PTok(w, x, y, size, bold = bold || headBold,
            italic = italic)
          x += ww + sp
          first = false
          any = true
        }
        if (words.nonEmpty) y += leading
      }
      if (any) y += size * 2.2 - leading // paragraph gap → block break
    }
    PdfWriter.build(pages.map(_.toSeq).toSeq, pageW, pageH)
  }

  /** The full A3 → A1 chain, fully in-JVM: docx bytes → PDF → token
    * table (one row-local conversion+parse per document). */
  def parseTokens(docId: Long, bytes: Array[Byte]): Seq[TokenRow] =
    PdfReader.parseTokens(docId, toPdf(bytes))

  def tokens(docs: Dataset[(Long, Array[Byte])]): Dataset[TokenRow] = {
    import docs.sparkSession.implicits._
    docs.flatMap { case (docId, bytes) => parseTokens(docId, bytes) }
  }

  /** Dead-letter variant (the AltoReader/PdfReader convention). */
  def quarantine(docs: Dataset[(Long, Array[Byte])]): DataFrame = {
    import docs.sparkSession.implicits._
    docs.flatMap { case (docId, bytes) =>
      try { parseTokens(docId, bytes); None }
      catch { case e: Exception =>
        Some((docId,
          s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}"))
      }
    }.toDF("doc_id", "error")
  }

  // ------------------------------------------------------------- writer

  /** Minimal OOXML package writer — the fixture generator: paragraphs
    * of (style, styled runs) → a valid `.docx` zip with
    * `[Content_Types].xml`, the package rels, and
    * `word/document.xml`. */
  def buildDocx(paras: Seq[(String, Seq[Run])]): Array[Byte] = {
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;")
    val body = paras.map { case (style, runs) =>
      val pPr = if (style.nonEmpty)
        s"""<w:pPr><w:pStyle w:val="$style"/></w:pPr>""" else ""
      val rs = runs.map { r =>
        val props = (if (r.bold) "<w:b/>" else "") +
          (if (r.italic) "<w:i/>" else "")
        val rPr = if (props.nonEmpty) s"<w:rPr>$props</w:rPr>" else ""
        s"""<w:r>$rPr<w:t xml:space="preserve">${esc(r.text)}</w:t></w:r>"""
      }.mkString
      s"<w:p>$pPr$rs</w:p>"
    }.mkString
    val doc =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<w:document xmlns:w="$W"><w:body>$body</w:body></w:document>"""
        .stripMargin
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
        |</Types>""".stripMargin
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
        |</Relationships>""".stripMargin
    val out = new java.io.ByteArrayOutputStream()
    val zout = new ZipOutputStream(out)
    Seq(
      "[Content_Types].xml" -> contentTypes,
      "_rels/.rels" -> rels,
      "word/document.xml" -> doc).foreach { case (name, content) =>
      zout.putNextEntry(new ZipEntry(name))
      zout.write(content.getBytes(StandardCharsets.UTF_8))
      zout.closeEntry()
    }
    zout.close()
    out.toByteArray
  }
}
