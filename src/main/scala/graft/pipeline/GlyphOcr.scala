package graft.pipeline

import java.awt.{Color, Font, RenderingHints}
import java.awt.image.BufferedImage

/** In-JVM optical character recognition behind the D6 seam — the
  * ONNX/CRF precedent applied to the engine's last injected-only seam.
  * The reference binds tesseract (`ocr_models/tesserocr_ocr_model.py:
  * 32-71`); this container ships no OCR binary, so the engine
  * implements template-correlation OCR from first principles:
  *
  *  - GLYPH TEMPLATES render once per JVM with `java.awt` (monospaced
  *    logical font, antialiasing off for crisp ink) inside an `"Hg"`
  *    anchor line that fixes the ascender–descender band, and
  *    normalize to a fixed binary grid plus the glyph's relative
  *    vertical position within the band;
  *  - an INPUT image decodes through ImageIO, downscales to the
  *    reference's OCR resolution cap (`get_image_with_max_resolution`,
  *    `utils/image.py:4-17`; `DEFAULT_OCR_MAX_RESOLUTION = 1024`,
  *    `graphic_matching.py:565`), binarizes by luma, and segments into
  *    line bands (row ink projection) and glyph boxes (column ink
  *    projection; a gap wider than ~45% of the band height emits a
  *    space);
  *  - each glyph box resamples to the template grid and scores pixel
  *    agreement minus a vertical-position penalty against every
  *    template — argmax wins.
  *
  * Template matching recovers machine-RENDERED text (figure labels,
  * axis captions — exactly what the F4 matcher consumes); scanned
  * noise and handwriting are out of scope, as they effectively are for
  * the reference's `SPARSE_TEXT` psm default. Undecodable bytes read
  * as empty text, the reference's behavior for an unreadable graphic.
  */
object GlyphOcr {

  /** Recognizable characters. Excludes glyphs that segment into
    * disconnected column runs in a line scan (`"`) and pairs that are
    * indistinguishable after bounding-box normalization (`_` vs `-`). */
  val Charset: String =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz" +
      "0123456789.,:;()-+=/"

  private val GridW = 12
  private val GridH = 18
  private val PosWeight = 0.8

  /** One template: the normalized ink grid and the glyph's vertical
    * extent in BASELINE units — `(row − capsTop) / (baseline −
    * capsTop)`, the frame an input line reconstructs from its own
    * glyph bottoms, so lines without descenders (where the band bottom
    * IS the baseline) and lines with them score identically. */
  private final case class Template(c: Char, grid: Array[Float],
      topRel: Float, botRel: Float)

  private lazy val templates: IndexedSeq[Template] = {
    val size = 48
    val font = new Font(Font.MONOSPACED, Font.PLAIN, size)
    // metrics probe
    val probe = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    val pg = probe.createGraphics()
    pg.setFont(font)
    val fm = pg.getFontMetrics
    val adv = fm.charWidth('M')
    val ascent = fm.getAscent
    val height = fm.getHeight
    pg.dispose()
    Charset.map { c =>
      val img = new BufferedImage(adv * 4, height * 2,
        BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setRenderingHint(RenderingHints.KEY_TEXT_ANTIALIASING,
        RenderingHints.VALUE_TEXT_ANTIALIAS_OFF)
      g.setColor(Color.WHITE)
      g.fillRect(0, 0, img.getWidth, img.getHeight)
      g.setColor(Color.BLACK)
      g.setFont(font)
      g.drawString("Hg" + c, 0, ascent)
      g.dispose()
      val ink = binarize(img)
      val (bandTop, bandBot) = rowExtent(ink, 0, img.getWidth)
        .getOrElse((0, img.getHeight - 1))
      // the 'H' anchor (first advance slot) fixes caps-top + baseline
      val hBot = rowExtent(ink, 0, adv).map(_._2).getOrElse(bandBot)
      val unit = math.max(1, hBot - bandTop)
      // the char occupies the third advance slot; its ink bbox there
      val x0 = 2 * adv
      val x1 = math.min(3 * adv, img.getWidth)
      val (cl, cr) = colExtent(ink, x0, x1, bandTop, bandBot)
        .getOrElse((x0, x1 - 1))
      val (ct, cb) = rowExtent(ink, cl, cr + 1).getOrElse((bandTop, bandBot))
      Template(c, resample(ink, cl, cr, ct, cb),
        ((ct - bandTop).toFloat / unit), ((cb - bandTop).toFloat / unit))
    }
  }

  // -------------------------------------------------------- image plumbing

  /** luma < 160 → ink (true). One bulk pixel grab, not per-pixel
    * getRGB calls. */
  private def binarize(img: BufferedImage): Array[Array[Boolean]] = {
    val h = img.getHeight
    val w = img.getWidth
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val out = Array.ofDim[Boolean](h, w)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = px(y * w + x)
        val luma = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
          (rgb & 0xFF) * 114) / 1000
        out(y)(x) = luma < 160
        x += 1
      }
      y += 1
    }
    out
  }

  /** First/last ink row within the column range (and optional row
    * window — REQUIRED inside a line band, or a glyph's extent bleeds
    * into the neighboring line's rows in the same columns), if any. */
  private def rowExtent(ink: Array[Array[Boolean]], x0: Int,
      x1: Int, yFrom: Int = 0, yTo: Int = Int.MaxValue): Option[(Int, Int)] = {
    var top = -1
    var bot = -1
    var y = yFrom
    val yEnd = math.min(ink.length.toLong, yTo.toLong + 1).toInt
    while (y < yEnd) {
      var x = x0
      var has = false
      while (x < x1 && !has) { has = ink(y)(x); x += 1 }
      if (has) { if (top < 0) top = y; bot = y }
      y += 1
    }
    if (top < 0) None else Some((top, bot))
  }

  /** First/last ink column within the row+column window, if any. */
  private def colExtent(ink: Array[Array[Boolean]], x0: Int, x1: Int,
      y0: Int, y1: Int): Option[(Int, Int)] = {
    var l = -1
    var r = -1
    var x = x0
    while (x < x1) {
      var y = y0
      var has = false
      while (y <= y1 && !has) { has = ink(y)(x); y += 1 }
      if (has) { if (l < 0) l = x; r = x }
      x += 1
    }
    if (l < 0) None else Some((l, r))
  }

  /** Area-average the binarized region onto the fixed grid. */
  private def resample(ink: Array[Array[Boolean]], x0: Int, x1: Int,
      y0: Int, y1: Int): Array[Float] = {
    val out = new Array[Float](GridW * GridH)
    val w = x1 - x0 + 1
    val h = y1 - y0 + 1
    var gy = 0
    while (gy < GridH) {
      val sy = y0 + gy * h / GridH
      val ey = math.max(sy + 1, y0 + (gy + 1) * h / GridH)
      var gx = 0
      while (gx < GridW) {
        val sx = x0 + gx * w / GridW
        val ex = math.max(sx + 1, x0 + (gx + 1) * w / GridW)
        var s = 0
        var n = 0
        var y = sy
        while (y < ey) {
          var x = sx
          while (x < ex) { if (ink(y)(x)) s += 1; n += 1; x += 1 }
          y += 1
        }
        out(gy * GridW + gx) = s.toFloat / n
        gx += 1
      }
      gy += 1
    }
    out
  }

  /** `get_image_with_max_resolution` (utils/image.py:4-17), the
    * reference's rounding. */
  private[pipeline] def withMaxResolution(img: BufferedImage,
      maxResolution: Int): BufferedImage = {
    val (w, h) = (img.getWidth, img.getHeight)
    if (math.max(w, h) <= maxResolution) img
    else {
      val (tw, th) =
        if (w > h) (maxResolution,
          math.max(1, math.round(h.toDouble / w * maxResolution).toInt))
        else (math.max(1, math.round(w.toDouble / h * maxResolution).toInt),
          maxResolution)
      val out = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, tw, th, null)
      g.dispose()
      out
    }
  }

  // ---------------------------------------------------------- recognition

  /** OCR over encoded image bytes — the D6 production closure for
    * [[GraphicMatching.ocrLines]]. Undecodable bytes → "". */
  def recognize(bytes: Array[Byte], maxResolution: Int = 1024): String = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) "" else recognizeImage(withMaxResolution(img, maxResolution))
  }

  def recognizeImage(img: BufferedImage): String = {
    val ink = binarize(img)
    val h = img.getHeight
    val w = img.getWidth
    // line bands: maximal runs of rows containing ink
    val rowHasInk = Array.tabulate(h) { y =>
      var x = 0
      var has = false
      while (x < w && !has) { has = ink(y)(x); x += 1 }
      has
    }
    val bands = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var y = 0
    while (y < h) {
      if (rowHasInk(y)) {
        val s = y
        while (y < h && rowHasInk(y)) y += 1
        bands += ((s, y - 1))
      } else y += 1
    }
    bands.iterator.map { case (top, bot) => recognizeBand(ink, w, top, bot) }
      .mkString("\n")
  }

  private def recognizeBand(ink: Array[Array[Boolean]], w: Int,
      top: Int, bot: Int): String = {
    val bandH = math.max(1, bot - top)
    // glyph runs: maximal runs of columns containing ink in the band
    val colHasInk = Array.tabulate(w) { x =>
      var y = top
      var has = false
      while (y <= bot && !has) { has = ink(y)(x); y += 1 }
      has
    }
    val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var x = 0
    while (x < w) {
      if (colHasInk(x)) {
        val s = x
        while (x < w && colHasInk(x)) x += 1
        runs += ((s, x - 1))
      } else x += 1
    }
    val spaceGap = 0.45 * bandH
    // baseline = the most common glyph bottom (most glyphs sit on it;
    // ties resolve downward). Rel positions are measured in
    // (baseline − band top) units, the template frame.
    val extents = runs.map { case (l, r) =>
      rowExtent(ink, l, r + 1, top, bot).getOrElse((top, bot))
    }
    val baseline =
      if (extents.isEmpty) bot
      else extents.groupBy(_._2).maxBy { case (b, xs) => (xs.size, b) }._1
    val unit = math.max(1, baseline - top)
    val sb = new StringBuilder
    var prevEnd = -1
    runs.zip(extents).foreach { case ((l, r), (ct, cb)) =>
      if (prevEnd >= 0 && l - prevEnd - 1 > spaceGap) sb.append(' ')
      prevEnd = r
      val grid = resample(ink, l, r, ct, cb)
      val topRel = (ct - top).toFloat / unit
      val botRel = (cb - top).toFloat / unit
      var best = ' '
      var bestScore = Double.NegativeInfinity
      templates.foreach { t =>
        var agree = 0.0
        var i = 0
        while (i < grid.length) {
          agree += 1.0 - math.abs(grid(i) - t.grid(i))
          i += 1
        }
        val score = agree / grid.length -
          PosWeight * (math.abs(topRel - t.topRel) + math.abs(botRel - t.botRel))
        if (score > bestScore) { bestScore = score; best = t.c }
      }
      sb.append(best)
    }
    sb.toString
  }

  // ------------------------------------------------------------- fixtures

  /** Render text lines to PNG bytes with the SAME logical font the
    * templates use — the fixture generator for specs and the
    * multimodal pipeline entries (a machine-rendered figure label, the
    * exact input class the reference OCRs). */
  def renderTextImage(lines: Seq[String], fontSize: Int = 24,
      pad: Int = 8): Array[Byte] = {
    val font = new Font(Font.MONOSPACED, Font.PLAIN, fontSize)
    val probe = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    val pg = probe.createGraphics()
    pg.setFont(font)
    val fm = pg.getFontMetrics
    val adv = fm.charWidth('M')
    val lineH = fm.getHeight
    val ascent = fm.getAscent
    pg.dispose()
    val w = math.max(1, lines.map(_.length).maxOption.getOrElse(0)) * adv +
      2 * pad
    val h = lines.size * (lineH + pad) + 2 * pad
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setRenderingHint(RenderingHints.KEY_TEXT_ANTIALIASING,
      RenderingHints.VALUE_TEXT_ANTIALIAS_OFF)
    g.setColor(Color.WHITE)
    g.fillRect(0, 0, w, h)
    g.setColor(Color.BLACK)
    g.setFont(font)
    lines.zipWithIndex.foreach { case (line, i) =>
      g.drawString(line, pad, pad + i * (lineH + pad) + ascent)
    }
    g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }
}
