package graft.sources

import scala.collection.mutable.ListBuffer

import graft.pipeline.TokenRow

/** ALTO v3 serializer — the inverse of [[AltoReader]]: a token table
  * renders back into the XML layout pdfalto emits (font registry in
  * `Styles`, `Page/TextBlock/TextLine/String` nesting with
  * HPOS/VPOS/WIDTH/HEIGHT). This is what the service's low-level
  * `/api/pdfalto` route returns for PDF (and DOCX) uploads now that
  * the conversion is in-JVM — the reference returns the pdfalto
  * process output for the same route (`app/parser.py:294-339`).
  * AltoReader ∘ AltoWriter is identity on the token table (tokens are
  * already normalized+retokenized, both passes idempotent), pinned by
  * DocxSpec.
  */
object AltoWriter {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def fmt(v: Double): String =
    if (v == math.rint(v)) v.toLong.toString else v.toString

  /** Serialize one document's TokenRows (any order; sorted internally
    * by position key) into ALTO XML. */
  def toAlto(tokens: Seq[TokenRow]): String = {
    val sorted = tokens.sortBy(t =>
      (t.page_idx, t.block_idx, t.line_idx, t.token_idx))
    // font registry: one TextStyle per distinct font signature
    val fonts = sorted.map(_.font).distinct.zipWithIndex.map {
      case (f, i) => f -> s"font$i"
    }.toMap
    val styles = fonts.toSeq.sortBy(_._2).map { case (f, id) =>
      val styleFlags = Seq(
        if (f.is_bold) Some("bold") else None,
        if (f.is_italics) Some("italics") else None,
        if (f.is_subscript) Some("subscript") else None,
        if (f.is_superscript) Some("superscript") else None).flatten
      s"""<TextStyle ID="$id"""" +
        Option(f.font_family).map(v => s""" FONTFAMILY="${esc(v)}"""")
          .getOrElse("") +
        f.font_size.map(v => s""" FONTSIZE="${fmt(v)}"""").getOrElse("") +
        s""" FONTSTYLE="${styleFlags.mkString(" ")}"/>"""
    }.mkString("\n")
    val pages = sorted.groupBy(_.page_idx).toSeq.sortBy(_._1).map {
      case (_, pageToks) =>
        val head = pageToks.head
        val blocks = pageToks.groupBy(_.block_idx).toSeq.sortBy(_._1).map {
          case (_, blockToks) =>
            val lines = blockToks.groupBy(_.line_idx).toSeq.sortBy(_._1)
              .map { case (_, lineToks) =>
                // Invert retokenize: consecutive tokens with empty
                // trailing whitespace came from ONE source String
                // ("a,b" → a/,/b with ws "") — merge them back so the
                // re-parse splits and pro-rates identically. The
                // merged box is the union, which is exactly the
                // original box (pro-rating partitions it fully).
                val ordered = lineToks.sortBy(_.token_idx)
                val groups = ListBuffer(ListBuffer.empty[TokenRow])
                ordered.foreach { t =>
                  groups.last += t
                  if (t.whitespace != "") groups += ListBuffer.empty[TokenRow]
                }
                val strings = groups.filter(_.nonEmpty).map { g =>
                  val content = g.map(_.text).mkString
                  val c = g.head.coords.map { first =>
                    val x1 = g.flatMap(_.coords).map(c => c.x + c.width).max
                    val y0 = g.flatMap(_.coords).map(_.y).min
                    val h = g.flatMap(_.coords).map(c => c.y + c.height).max - y0
                    (first.x, y0, x1 - first.x, h)
                  }
                  s"""<String CONTENT="${esc(content)}"""" +
                    c.map { case (x, y, w, h) =>
                      s""" HPOS="${fmt(x)}" VPOS="${fmt(y)}"""" +
                        s""" WIDTH="${fmt(w)}" HEIGHT="${fmt(h)}""""
                    }.getOrElse("") +
                    s""" STYLEREFS="${fonts(g.head.font)}"/>"""
                }.mkString
                s"<TextLine>$strings</TextLine>"
              }.mkString
            s"<TextBlock>$lines</TextBlock>"
        }.mkString
        s"""<Page PHYSICAL_IMG_NR="${head.page_number}"""" +
          head.page_width.map(v => s""" WIDTH="${fmt(v)}"""").getOrElse("") +
          head.page_height.map(v => s""" HEIGHT="${fmt(v)}"""").getOrElse("") +
          s"><PrintSpace>$blocks</PrintSpace></Page>"
    }.mkString("\n")
    s"""<alto xmlns="http://www.loc.gov/standards/alto/ns-v3#">
       |<Styles>
       |$styles
       |</Styles>
       |<Layout>
       |$pages
       |</Layout></alto>""".stripMargin
  }
}
