package graft.sources

import javax.xml.parsers.DocumentBuilderFactory
import javax.xml.XMLConstants

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Coords, FontInfo, GraphicRow, TextNormalization, TokenRow}

/** ALTO v3 XML → exploded token table (+ graphics table).
  *
  * Reference behavior: `sciencebeam_parser/external/pdfalto/parser.py:30-173`
  * (attribute set, font registry, page numbering) followed by
  * `normalize_layout_document` (`app/parser.py:64-79`) = text
  * normalization + retokenization + empty-block removal. The reference
  * parses one document at a time in memory; here parsing is a
  * `flatMap` over (doc_id, xml) rows — each task parses its partition's
  * documents independently, so ingest scales with executors and the
  * shuffle-free output feeds the feature windows directly.
  *
  * PDF ingestion (A1) would wrap this with `spark.read.format
  * ("binaryFile")` + an executor-local `pdfalto` subprocess per
  * partition; kept behind this ALTO entry point so everything
  * downstream is testable without the binary (SURVEY.md §7 step 2).
  */
object AltoReader {

  private val AltoNs = "http://www.loc.gov/standards/alto/ns-v3#"

  /** Parse a corpus of (doc_id, alto_xml) into TokenRows.
    * Retokenizes with the reference delimiter set and drops empty
    * blocks/lines (normalize_layout_document semantics).
    */
  def tokens(docs: Dataset[(Long, String)]): Dataset[TokenRow] = {
    import docs.sparkSession.implicits._
    docs.flatMap { case (docId, xml) => parseTokens(docId, xml) }
  }

  def graphics(docs: Dataset[(Long, String)]): Dataset[GraphicRow] = {
    import docs.sparkSession.implicits._
    docs.flatMap { case (docId, xml) => parseGraphics(docId, xml) }
  }

  /** Convenience: read a directory of .alto.xml files via binaryFile
    * (doc_id = dense rank of file path for determinism).
    */
  def readDirectory(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val raw = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content").cast("string").as("xml"))
    val withId = raw.withColumn("doc_id",
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy("path"))
        .cast("long") - 1)
    tokens(withId.select($"doc_id", $"xml").as[(Long, String)]).toDF()
  }

  // ------------------------------------------------------------ parsing

  private def parseDom(xml: String): org.w3c.dom.Document = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    // harden against XXE — documents are untrusted input
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setAttribute(XMLConstants.ACCESS_EXTERNAL_DTD, "")
    f.setAttribute(XMLConstants.ACCESS_EXTERNAL_SCHEMA, "")
    f.newDocumentBuilder().parse(
      new java.io.ByteArrayInputStream(xml.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }

  private def elems(parent: org.w3c.dom.Element, local: String): Seq[org.w3c.dom.Element] = {
    val nl = parent.getElementsByTagNameNS(AltoNs, local)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[org.w3c.dom.Element])
  }

  private def attr(e: org.w3c.dom.Element, name: String): Option[String] = {
    val v = e.getAttribute(name)
    if (v == null || v.isEmpty) None else Some(v)
  }

  private def parseFonts(root: org.w3c.dom.Element): Map[String, FontInfo] =
    elems(root, "TextStyle").map { n =>
      val styles = attr(n, "FONTSTYLE").getOrElse("").split(' ').toSet
      val id = attr(n, "ID").orNull
      id -> FontInfo(
        font_id = id,
        font_family = attr(n, "FONTFAMILY").orNull,
        font_size = attr(n, "FONTSIZE").map(_.toDouble),
        is_bold = styles("bold"),
        is_italics = styles("italics"),
        is_subscript = styles("subscript"),
        is_superscript = styles("superscript"))
    }.toMap

  private def coordsOf(e: org.w3c.dom.Element, pageNumber: Int): Coords =
    Coords(
      x = attr(e, "HPOS").map(_.toDouble).getOrElse(0.0),
      y = attr(e, "VPOS").map(_.toDouble).getOrElse(0.0),
      width = attr(e, "WIDTH").map(_.toDouble).getOrElse(0.0),
      height = attr(e, "HEIGHT").map(_.toDouble).getOrElse(0.0),
      page_number = pageNumber)

  private[sources] def parseTokens(docId: Long, xml: String): Seq[TokenRow] = {
    val root = parseDom(xml).getDocumentElement
    val fonts = parseFonts(root)
    val out = ListBuffer.empty[TokenRow]
    elems(root, "Page").zipWithIndex.foreach { case (page, pageIdx) =>
      val pageNumber = attr(page, "PHYSICAL_IMG_NR").map(_.toInt).getOrElse(pageIdx + 1)
      val pageW = attr(page, "WIDTH").map(_.toDouble)
      val pageH = attr(page, "HEIGHT").map(_.toDouble)
      var blockIdx = 0
      elems(page, "TextBlock").foreach { block =>
        var lineIdx = 0
        var blockHasTokens = false
        elems(block, "TextLine").foreach { line =>
          val strings = elems(line, "String")
          var tokenIdx = 0
          strings.foreach { s =>
            val rawText = attr(s, "CONTENT").getOrElse("")
            val c = coordsOf(s, pageNumber)
            // normalize + retokenize (B1/B2), pro-rating coordinates
            retokenize(TextNormalization.normalize(rawText), c).foreach {
              case (text, whitespace, tc) =>
                out += TokenRow(docId, pageIdx, blockIdx, lineIdx, tokenIdx,
                  text, whitespace,
                  attr(s, "STYLEREFS").flatMap(fonts.get).getOrElse(FontInfo.empty),
                  Some(tc), pageNumber, pageW, pageH)
                tokenIdx += 1
                blockHasTokens = true
            }
          }
          if (tokenIdx > 0) lineIdx += 1 // drop empty lines (B3)
        }
        if (blockHasTokens) blockIdx += 1 // drop empty blocks (B3)
      }
    }
    out.toList
  }

  private[sources] def parseGraphics(docId: Long, xml: String): Seq[GraphicRow] = {
    val root = parseDom(xml).getDocumentElement
    elems(root, "Page").zipWithIndex.flatMap { case (page, pageIdx) =>
      val pageNumber = attr(page, "PHYSICAL_IMG_NR").map(_.toInt).getOrElse(pageIdx + 1)
      elems(page, "Illustration").map { g =>
        GraphicRow(docId, pageIdx, pageNumber,
          attr(g, "FILEID").orNull, attr(g, "TYPE").orNull,
          Some(coordsOf(g, pageNumber)))
      }
    }
  }

  /** Retokenize one ALTO String token, pro-rating coordinates by char
    * offset (layout_document.py:159-212 `retokenize_layout_token`):
    * whitespace splits attach to the preceding token's `whitespace`.
    */
  private[sources] def retokenize(text: String, c: Coords): Seq[(String, String, Coords)] = {
    if (text.trim.isEmpty) return Nil
    val parts = TextNormalization.tokenize(text, keepWhitespace = true)
    val totalLen = parts.map(_.length).sum.toDouble
    val out = ListBuffer.empty[(String, String, Coords)]
    var pendingText: String = null
    var pendingWs = ""
    var pendingOffset = 0
    var offset = 0
    parts.foreach { p =>
      if (p.trim.isEmpty) {
        pendingWs += p
        offset += p.length
      } else {
        if (pendingText != null) out += ((pendingText, pendingWs, proRate(c, pendingText, pendingOffset, totalLen)))
        pendingText = p
        pendingWs = ""
        pendingOffset = offset
        offset += p.length
      }
    }
    pendingWs += " " // reference default LayoutToken.whitespace = ' '
    if (pendingText != null) out += ((pendingText, pendingWs, proRate(c, pendingText, pendingOffset, totalLen)))
    out.toList
  }

  private def proRate(c: Coords, text: String, offset: Int, totalLen: Double): Coords =
    if (totalLen <= 0) c
    else c.copy(
      x = c.x + c.width * offset / totalLen,
      width = c.width * text.length / totalLen)
}
