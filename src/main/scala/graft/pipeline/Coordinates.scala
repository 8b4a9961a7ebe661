package graft.pipeline

import java.util.Locale

/** Page-coordinate merging and the TEI `coords` attribute format
  * (reference `document/layout_document.py:65-98` get_merged_with /
  * get_merged_coordinates_list and `document/tei/common.py:87-101`
  * format_coordinates / format_coordinates_list).
  *
  * The merge folds an ordered coordinate list pairwise: a pending box
  * absorbs the next one while they share a page (union bbox), a page
  * change flushes the pending box. Tokens arrive in reading order, so
  * the result is one box per visited page, in visit order.
  */
object Coordinates {

  /** Union bbox of two same-page boxes (layout_document.py:65-77). */
  def union(a: Coords, b: Coords): Coords = {
    require(a.page_number == b.page_number,
      "cannot merge coordinates on different pages")
    val x = math.min(a.x, b.x)
    val y = math.min(a.y, b.y)
    Coords(x, y,
      math.max(a.x + a.width, b.x + b.width) - x,
      math.max(a.y + a.height, b.y + b.height) - y,
      a.page_number)
  }

  /** Pairwise ordered merge (layout_document.py:80-98). */
  def merge(cs: Seq[Coords]): Seq[Coords] = {
    val out = scala.collection.mutable.ListBuffer.empty[Coords]
    var pending: Coords = null
    cs.foreach { c =>
      if (pending == null) pending = c
      else if (c.page_number != pending.page_number) {
        out += pending; pending = c
      } else pending = union(pending, c)
    }
    if (pending != null) out += pending
    out.toList
  }

  /** "%d,%.2f,%.2f,%.2f,%.2f" (tei/common.py:87-94). */
  def format(c: Coords): String =
    "%d,%.2f,%.2f,%.2f,%.2f".formatLocal(Locale.ROOT,
      c.page_number, c.x, c.y, c.width, c.height)

  /** ';'-joined list (tei/common.py:97-101); null when empty so a
    * missing attribute and an absent coordinate list are the same. */
  def formatList(cs: Seq[Coords]): String =
    if (cs.isEmpty) null else cs.map(format).mkString(";")

  /** Merge an ordered token-coordinate stream straight to the
    * attribute string (tokens without coordinates are skipped, as the
    * reference's `if token.coordinates` does). */
  def formatMerged(cs: Seq[Coords]): String = formatList(merge(cs))

  /** Inverse of [[formatList]] — lets derived elements (a `<p>`
    * fragment, a figure wrapper) re-merge their children's already
    * formatted coords without threading raw boxes through every node. */
  def parse(s: String): Seq[Coords] =
    if (s == null || s.isEmpty) Nil
    else s.split(";").toSeq.map { part =>
      val f = part.split(",")
      Coords(f(1).toDouble, f(2).toDouble, f(3).toDouble, f(4).toDouble,
        f(0).toInt)
    }

  /** Re-merge formatted child coords into a parent attribute value
    * (null-safe: children without coords contribute nothing; null when
    * nothing contributes). */
  def mergeFormatted(ss: Seq[String]): String =
    formatList(merge(ss.filter(s => s != null && s.nonEmpty).flatMap(parse)))
}

/** Shared span assembly: ordered tokens → (text, coords, styles), the
  * single source of truth for BOTH span forms ([[LocalLabelers.spansLocal]]
  * streams through it per span; [[BioSpans.spans]] applies it to the
  * collected token array) so the window/local parity pin covers all
  * three fields by construction. */
object SpanAssembly {

  final case class SpanTok(text: String, whitespace: String,
      coords: Option[Coords], font: FontInfo)

  private def styleMask(f: FontInfo): Int =
    (if (f != null && f.is_bold) 1 else 0) |
      (if (f != null && f.is_italics) 2 else 0) |
      (if (f != null && f.is_subscript) 4 else 0) |
      (if (f != null && f.is_superscript) 8 else 0)

  /** text + whitespace reassembly with trailing-blank trim, merged
    * page boxes, and styled runs (same-style neighbours merge with the
    * joining whitespace inside; boundary whitespace stays plain —
    * tei/common.py:115-151). */
  def assemble(toks: Seq[SpanTok]): (String, String, String) = {
    val sb = new StringBuilder
    val boxes = scala.collection.mutable.ListBuffer.empty[Coords]
    val runs = scala.collection.mutable.ListBuffer.empty[(Int, Int, Int)]
    var runStart = 0
    var runEnd = 0
    var runMask = 0
    def closeRun(): Unit = {
      if (runMask != 0 && runEnd > runStart) runs += ((runStart, runEnd, runMask))
      runMask = 0
    }
    toks.foreach { t =>
      // concat_ws skips the element when concat(text, whitespace) is null
      if (t.text != null && t.whitespace != null) {
        val mask = styleMask(t.font)
        if (mask != runMask) { closeRun(); runStart = sb.length; runMask = mask }
        sb.append(t.text)
        runEnd = sb.length
        sb.append(t.whitespace)
      }
      t.coords.foreach { c =>
        if (boxes.nonEmpty && boxes.last.page_number == c.page_number)
          boxes(boxes.length - 1) = Coordinates.union(boxes.last, c)
        else boxes += c
      }
    }
    var end = sb.length
    while (end > 0 && sb.charAt(end - 1) <= ' ') end -= 1
    closeRun()
    val styles = runs.collect {
      case (s, e, m) if s < end => s"$s,${math.min(e, end)},$m"
    }
    (sb.substring(0, end), Coordinates.formatList(boxes.toList),
      if (styles.isEmpty) null else styles.mkString(";"))
  }
}

/** Styled token runs over a span/node text, encoded `start,end,mask`
  * (';'-joined; mask bits 1=bold 2=italic 4=subscript 8=superscript —
  * the tei/common.py:61-71 style order). The TEI sink renders them as
  * nested `<hi rend="…">` wrappers; folds that cut or shift a node's
  * text re-base the runs with [[slice]]. */
object StyleRuns {

  def parse(s: String): Seq[(Int, Int, Int)] =
    if (s == null || s.isEmpty) Nil
    else s.split(";").toSeq.map { r =>
      val f = r.split(",")
      (f(0).toInt, f(1).toInt, f(2).toInt)
    }

  def format(runs: Seq[(Int, Int, Int)]): String =
    if (runs.isEmpty) null
    else runs.map { case (a, b, m) => s"$a,$b,$m" }.mkString(";")

  /** Runs for `text.substring(from, until)`, re-based to 0; runs
    * falling outside the window are clipped or dropped. */
  def slice(s: String, from: Int, until: Int): String =
    format(parse(s).flatMap { case (a, b, m) =>
      val a2 = math.max(a, from)
      val b2 = math.min(b, until)
      if (b2 > a2) Some((a2 - from, b2 - from, m)) else None
    })
}
