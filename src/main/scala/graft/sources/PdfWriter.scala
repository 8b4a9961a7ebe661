package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Minimal PDF writer — the fixture generator and export side of the
  * in-JVM A1 seam (the p22 round-trip discipline: the engine writes
  * REAL files in the container format, then its own reader streams
  * them back). Emits spec-complete PDF 1.4: catalog/page-tree objects,
  * standard-14 Type1 font resources, FlateDecode-compressed content
  * streams positioning text with `BT/Tf/Tm/Tj/ET`, a classic xref
  * table, and a correct `startxref` trailer. Every byte is written
  * from the public ISO 32000 layout.
  */
object PdfWriter {

  /** One positioned token: `y` is TOP-DOWN top edge (ALTO convention);
    * the writer converts to the PDF bottom-up baseline. */
  final case class PTok(text: String, x: Double, y: Double, size: Double,
      bold: Boolean = false, italic: Boolean = false)

  private def fontRes(bold: Boolean, italic: Boolean): (String, String) =
    (bold, italic) match {
      case (false, false) => ("F1", "Helvetica")
      case (true, false) => ("F2", "Helvetica-Bold")
      case (false, true) => ("F3", "Helvetica-Oblique")
      case (true, true) => ("F4", "Helvetica-BoldOblique")
    }

  /** Escape a string for a PDF literal string. Text is normalized
    * first (B2: ligature/quote/dash folding) — ligature code points
    * have no single-byte slot in this subset, and their folded form is
    * exactly what the reader's own normalize pass would produce;
    * remaining code points above 255 map to '?'. */
  private[sources] def escape(raw: String): String = {
    val s = graft.pipeline.TextNormalization.normalize(raw)
    val sb = new StringBuilder(s.length + 8)
    s.foreach { c =>
      c match {
        case '(' => sb.append("\\(")
        case ')' => sb.append("\\)")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case c if c > 255 => sb.append('?')
        case c => sb.append(c)
      }
    }
    sb.toString
  }

  /** Content stream for one page of positioned tokens. */
  private def contentOf(toks: Seq[PTok], pageH: Double): String = {
    val sb = new StringBuilder
    toks.foreach { t =>
      val (res, _) = fontRes(t.bold, t.italic)
      val yBase = pageH - t.y - t.size
      sb.append(s"BT /$res ${fmt(t.size)} Tf 1 0 0 1 ${fmt(t.x)} " +
        s"${fmt(yBase)} Tm (${escape(t.text)}) Tj ET\n")
    }
    sb.toString
  }

  private def fmt(v: Double): String =
    if (v == math.rint(v)) v.toLong.toString
    else BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString

  /** Build a complete PDF from per-page token lists. `compress`
    * Flate-encodes content streams (the real-world default; `false`
    * keeps streams readable for debugging fixtures). */
  def build(pages: Seq[Seq[PTok]], pageW: Double = 612,
      pageH: Double = 792, compress: Boolean = true): Array[Byte] =
    buildRawContent(pages.map(contentOf(_, pageH)), pageW, pageH, compress)

  /** One image placement: top-down box (ALTO convention). The writer
    * embeds an 8-bit DeviceGray image XObject (Flate raw samples) and
    * places it with the standard `q cm /ImN Do Q` sequence. */
  final case class PImage(x: Double, y: Double, width: Double,
      height: Double, pxW: Int = 8, pxH: Int = 8)

  /** [[build]] with per-page image placements. */
  def buildWithImages(pages: Seq[(Seq[PTok], Seq[PImage])],
      pageW: Double = 612, pageH: Double = 792,
      compress: Boolean = true): Array[Byte] = {
    val contents = pages.map { case (toks, imgs) =>
      val text = contentOf(toks, pageH)
      val imgOps = imgs.zipWithIndex.map { case (im, i) =>
        val yBase = pageH - im.y - im.height
        s"q ${fmt(im.width)} 0 0 ${fmt(im.height)} ${fmt(im.x)} " +
          s"${fmt(yBase)} cm /Im${i + 1} Do Q\n"
      }.mkString
      text + imgOps
    }
    buildRawContent(contents, pageW, pageH, compress,
      images = pages.map(_._2))
  }

  /** Build from raw per-page content streams — the spec hook for
    * exercising packed strings, TJ kerning, q/cm state, etc.
    *
    * `pdf15 = true` emits the PDF 1.5+ layout every modern producer
    * ships: catalog/pages/font dicts packed into ONE object stream
    * (`/Type /ObjStm`) and a cross-reference STREAM (`/Type /XRef`,
    * `/W [1 4 2]`, Flate + PNG up-predictor `/DecodeParms
    * << /Predictor 12 /Columns 7 >>`) instead of the classic table —
    * the reader-side support (xref streams, predictors, ObjStm) gets
    * a writer-generated fixture instead of only hand-built bytes. */
  def buildRawContent(contents: Seq[String], pageW: Double = 612,
      pageH: Double = 792, compress: Boolean = true,
      images: Seq[Seq[PImage]] = Seq.empty,
      pdf15: Boolean = false): Array[Byte] = {
    if (pdf15)
      return buildPdf15(contents, pageW, pageH, compress, images)
    val out = new ByteArrayOutputStream(4096)
    def w(s: String): Unit =
      out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Long]
    def beginObj(num: Int): Unit = {
      offsets += out.size().toLong
      w(s"$num 0 obj\n")
    }

    w("%PDF-1.4\n%âãÏÓ\n") // binary-marker comment line
    val nPages = contents.length
    // object numbering: 1 catalog, 2 pages, 3-6 fonts,
    // then per page i: 7+2i page, 8+2i content
    beginObj(1)
    w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    beginObj(2)
    val kids = (0 until nPages).map(i => s"${7 + 2 * i} 0 R").mkString(" ")
    w(s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>\nendobj\n")
    val fontNames = Seq("Helvetica", "Helvetica-Bold", "Helvetica-Oblique",
      "Helvetica-BoldOblique")
    fontNames.zipWithIndex.foreach { case (bf, i) =>
      beginObj(3 + i)
      w(s"<< /Type /Font /Subtype /Type1 /BaseFont /$bf >>\nendobj\n")
    }
    // image XObjects number after the page/content pairs
    var nextObj = 7 + 2 * nPages
    val imageRefs: Seq[Seq[Int]] = contents.indices.map { i =>
      images.lift(i).getOrElse(Seq.empty).map { _ =>
        val n = nextObj; nextObj += 1; n
      }
    }
    contents.zipWithIndex.foreach { case (content, i) =>
      beginObj(7 + 2 * i)
      val xobj =
        if (imageRefs(i).isEmpty) ""
        else " /XObject << " + imageRefs(i).zipWithIndex.map {
          case (ref, k) => s"/Im${k + 1} $ref 0 R" }.mkString(" ") + " >>"
      w(s"<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [ 0 0 ${fmt(pageW)} ${fmt(pageH)} ] " +
        "/Resources << /Font << /F1 3 0 R /F2 4 0 R /F3 5 0 R " +
        s"/F4 6 0 R >>$xobj >> /Contents ${8 + 2 * i} 0 R >>\nendobj\n")
      beginObj(8 + 2 * i)
      val raw = content.getBytes(StandardCharsets.ISO_8859_1)
      val data = if (compress) deflate(raw) else raw
      val filter = if (compress) " /Filter /FlateDecode" else ""
      w(s"<< /Length ${data.length}$filter >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    }
    contents.indices.foreach { i =>
      images.lift(i).getOrElse(Seq.empty).zip(imageRefs(i)).foreach {
        case (im, ref) =>
          beginObj(ref)
          // deterministic gray gradient samples
          val samples = Array.tabulate(im.pxW * im.pxH)(k => (k * 7 % 256).toByte)
          val data = deflate(samples)
          w(s"<< /Type /XObject /Subtype /Image /Width ${im.pxW} " +
            s"/Height ${im.pxH} /ColorSpace /DeviceGray " +
            s"/BitsPerComponent 8 /Filter /FlateDecode " +
            s"/Length ${data.length} >>\nstream\n")
          out.write(data)
          w("\nendstream\nendobj\n")
      }
    }
    val nObjs = nextObj
    val xrefPos = out.size().toLong
    w(s"xref\n0 $nObjs\n")
    w(f"0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size $nObjs /Root 1 0 R >>\nstartxref\n$xrefPos\n%%%%EOF\n")
    out.toByteArray
  }

  /** The PDF 1.5 layout (see [[buildRawContent]]). Object numbering:
    * 1 catalog, 2 pages, 3–6 fonts (all INSIDE the ObjStm), per page
    * i: 7+2i page dict, 8+2i content stream, then images, then the
    * ObjStm, then the xref stream. */
  private def buildPdf15(contents: Seq[String], pageW: Double,
      pageH: Double, compress: Boolean,
      images: Seq[Seq[PImage]]): Array[Byte] = {
    val out = new ByteArrayOutputStream(4096)
    def w(s: String): Unit =
      out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    val nPages = contents.length
    var nextObj = 7 + 2 * nPages
    val imageRefs: Seq[Seq[Int]] = contents.indices.map { i =>
      images.lift(i).getOrElse(Seq.empty).map { _ =>
        val n = nextObj; nextObj += 1; n
      }
    }
    val objStmNum = nextObj
    val xrefNum = nextObj + 1
    val nObjs = nextObj + 2
    // (objNum -> type-1 offset) for top-level, packed set for type-2
    val offsets = scala.collection.mutable.Map.empty[Int, Long]
    def beginObj(num: Int): Unit = {
      offsets(num) = out.size().toLong
      w(s"$num 0 obj\n")
    }
    w("%PDF-1.5\n%âãÏÓ\n")
    // top-level: page dicts + content streams + images
    contents.zipWithIndex.foreach { case (content, i) =>
      beginObj(7 + 2 * i)
      val xobj =
        if (imageRefs(i).isEmpty) ""
        else " /XObject << " + imageRefs(i).zipWithIndex.map {
          case (ref, k) => s"/Im${k + 1} $ref 0 R" }.mkString(" ") + " >>"
      w(s"<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [ 0 0 ${fmt(pageW)} ${fmt(pageH)} ] " +
        "/Resources << /Font << /F1 3 0 R /F2 4 0 R /F3 5 0 R " +
        s"/F4 6 0 R >>$xobj >> /Contents ${8 + 2 * i} 0 R >>\nendobj\n")
      beginObj(8 + 2 * i)
      val raw = content.getBytes(StandardCharsets.ISO_8859_1)
      val data = if (compress) deflate(raw) else raw
      val filter = if (compress) " /Filter /FlateDecode" else ""
      w(s"<< /Length ${data.length}$filter >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    }
    contents.indices.foreach { i =>
      images.lift(i).getOrElse(Seq.empty).zip(imageRefs(i)).foreach {
        case (im, ref) =>
          beginObj(ref)
          val samples = Array.tabulate(im.pxW * im.pxH)(k => (k * 7 % 256).toByte)
          val data = deflate(samples)
          w(s"<< /Type /XObject /Subtype /Image /Width ${im.pxW} " +
            s"/Height ${im.pxH} /ColorSpace /DeviceGray " +
            s"/BitsPerComponent 8 /Filter /FlateDecode " +
            s"/Length ${data.length} >>\nstream\n")
          out.write(data)
          w("\nendstream\nendobj\n")
      }
    }
    // the ObjStm: catalog + pages + the four fonts
    val kids = (0 until nPages).map(i => s"${7 + 2 * i} 0 R").mkString(" ")
    val packed: Seq[(Int, String)] = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>") ++
      Seq("Helvetica", "Helvetica-Bold", "Helvetica-Oblique",
        "Helvetica-BoldOblique").zipWithIndex.map { case (bf, i) =>
        (3 + i) -> s"<< /Type /Font /Subtype /Type1 /BaseFont /$bf >>"
      }
    val bodies = packed.map(_._2 + "\n")
    val offs = bodies.scanLeft(0)(_ + _.length).init
    val header = packed.map(_._1).zip(offs)
      .map { case (n, o) => s"$n $o" }.mkString(" ") + "\n"
    val stmData = deflate(
      (header + bodies.mkString).getBytes(StandardCharsets.ISO_8859_1))
    beginObj(objStmNum)
    w(s"<< /Type /ObjStm /N ${packed.length} /First ${header.length} " +
      s"/Filter /FlateDecode /Length ${stmData.length} >>\nstream\n")
    out.write(stmData)
    w("\nendstream\nendobj\n")
    // the xref STREAM with PNG up-predictor rows (/W [1 4 2] → 7 cols)
    val xrefPos = out.size().toLong
    offsets(xrefNum) = xrefPos
    val rows: Seq[Array[Byte]] = (0 until nObjs).map { n =>
      val row = new Array[Byte](7)
      if (n == 0) { row(0) = 0; row(6) = 0xff.toByte }
      else packed.indexWhere(_._1 == n) match {
        case -1 =>
          row(0) = 1
          val off = offsets(n)
          row(1) = (off >> 24).toByte; row(2) = (off >> 16).toByte
          row(3) = (off >> 8).toByte; row(4) = off.toByte
        case idx =>
          row(0) = 2
          row(1) = (objStmNum >> 24).toByte; row(2) = (objStmNum >> 16).toByte
          row(3) = (objStmNum >> 8).toByte; row(4) = objStmNum.toByte
          row(6) = idx.toByte
      }
      row
    }
    // PNG predictor 2 (up): stored = raw - prevRow, filter byte 2
    val enc = new ByteArrayOutputStream()
    var prev = new Array[Byte](7)
    rows.foreach { r =>
      enc.write(2)
      (0 until 7).foreach(i => enc.write((r(i) - prev(i)) & 0xff))
      prev = r
    }
    val xrefData = deflate(enc.toByteArray)
    w(s"$xrefNum 0 obj\n<< /Type /XRef /Size $nObjs /Root 1 0 R " +
      "/W [ 1 4 2 ] /Filter /FlateDecode " +
      "/DecodeParms << /Predictor 12 /Columns 7 >> " +
      s"/Length ${xrefData.length} >>\nstream\n")
    out.write(xrefData)
    w(s"\nendstream\nendobj\nstartxref\n$xrefPos\n%%%%EOF\n")
    out.toByteArray
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(data.length / 2 + 32)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  // ------------------------------------------------------ corpus layout

  /** Document layout for the p23 round-trip — the PDF twin of the
    * `altoOf` fixture geometry: an 18 pt bold title line (first three
    * tokens), a 9.5 pt author line (next two), then 9.5 pt body lines
    * of twelve tokens at 14 pt leading, paginating at the page bottom.
    * Token x-positions pack by the REAL Helvetica advance widths
    * ([[PdfFonts]]), so the reader's metric-computed geometry is
    * exact, not approximate.
    */
  def documentPdf(text: String): Array[Byte] = {
    val toks = text.split(" ").filter(_.nonEmpty)
    val (titleToks, rest) = toks.splitAt(math.min(3, toks.length))
    val (authorToks, bodyToks) = rest.splitAt(math.min(2, rest.length))
    val pageW = 612.0
    val pageH = 792.0
    val bottom = 760.0
    def lineOf(ts: Seq[String], y: Double, size: Double, bold: Boolean)
        : Seq[PTok] = {
      var x = 50.0
      ts.map { t =>
        val tok = PTok(t, x, y, size, bold = bold)
        val bf = if (bold) "Helvetica-Bold" else "Helvetica"
        x += PdfFonts.stringWidth(bf, t, size) +
          PdfFonts.width(bf, ' ') * size / 1000.0
        tok
      }
    }
    val pages = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[PTok])
    var y = 60.0
    def emit(ts: Seq[String], size: Double, bold: Boolean,
        advance: Double): Unit = {
      if (ts.nonEmpty) {
        if (y + size > bottom) { pages += scala.collection.mutable.ArrayBuffer.empty[PTok]; y = 60.0 }
        pages.last ++= lineOf(ts, y, size, bold)
        y += advance
      }
    }
    emit(titleToks.toIndexedSeq, 18.0, bold = true, advance = 30.0)
    emit(authorToks.toIndexedSeq, 9.5, bold = false, advance = 30.0)
    bodyToks.grouped(12).foreach { ts =>
      emit(ts.toIndexedSeq, 9.5, bold = false, advance = 14.0)
    }
    build(pages.map(_.toSeq).toSeq, pageW, pageH)
  }
}
