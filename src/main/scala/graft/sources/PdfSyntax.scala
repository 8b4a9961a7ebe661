package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** PDF object syntax — the COS layer of the public PDF 1.x
  * specification (ISO 32000): tokens, objects, classic xref tables,
  * cross-reference streams, and stream filters. This is the in-JVM
  * replacement for the parsing half of the reference's `pdfalto`
  * subprocess seam (`external/pdfalto/wrapper.py:20-48`): everything
  * here is written from the published file format, no external binary.
  *
  * Scope (declared subset): FlateDecode (+ PNG/TIFF predictors) and
  * ASCIIHexDecode filters, classic xref chains via /Prev, xref streams
  * (/Type /XRef with /W field widths and /Index), literal/hex strings,
  * and a full-file `N G obj` rebuild scan as the recovery path for
  * documents with broken xref offsets — the same tolerance class
  * pdfalto applies. Object streams (/Type /ObjStm) are supported so
  * PDF 1.5+ writers parse. Encrypted documents are out of scope and
  * fail loudly (the reference also rejects them).
  */
private[sources] object PdfSyntax {

  sealed trait PdfObj
  final case class PNum(v: Double) extends PdfObj {
    def int: Int = v.toInt
    def long: Long = v.toLong
  }
  final case class PStr(bytes: Array[Byte]) extends PdfObj {
    def text: String = new String(bytes, StandardCharsets.ISO_8859_1)
  }
  final case class PName(v: String) extends PdfObj
  final case class PArr(items: Vector[PdfObj]) extends PdfObj
  final case class PDict(m: Map[String, PdfObj]) extends PdfObj {
    def get(k: String): Option[PdfObj] = m.get(k)
  }
  final case class PRef(num: Int, gen: Int) extends PdfObj
  final case class PBool(v: Boolean) extends PdfObj
  case object PNull extends PdfObj
  final case class PStream(dict: PDict, raw: Array[Byte]) extends PdfObj

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  /** Positioned recursive-descent parser over the raw bytes. Also used
    * for content streams, where bare keywords are operators —
    * [[Lexer.nextToken]] surfaces them as [[Op]].
    */
  final case class Op(name: String)

  final class Lexer(val bytes: Array[Byte], var pos: Int = 0) {

    def atEnd: Boolean = pos >= bytes.length

    def skipWs(): Unit = {
      while (pos < bytes.length &&
          (isWs(bytes(pos) & 0xff) || bytes(pos) == '%')) {
        if (bytes(pos) == '%') {
          while (pos < bytes.length && bytes(pos) != '\n' && bytes(pos) != '\r')
            pos += 1
        } else pos += 1
      }
    }

    private def bareToken(): String = {
      val start = pos
      while (pos < bytes.length && !isWs(bytes(pos) & 0xff) &&
          !isDelim(bytes(pos) & 0xff)) pos += 1
      new String(bytes, start, pos - start, StandardCharsets.ISO_8859_1)
    }

    /** Next object OR operator keyword (content-stream mode). */
    def nextToken(): Any = {
      skipWs()
      if (atEnd) return null
      val c = bytes(pos) & 0xff
      c match {
        case '/' => parseName()
        case '(' => parseLiteralString()
        case '[' =>
          pos += 1
          val items = Vector.newBuilder[PdfObj]
          var t = nextToken()
          while (t != Op("]")) {
            require(t != null, "EOF inside array")
            items += t.asInstanceOf[PdfObj]
            t = nextToken()
          }
          PArr(items.result())
        case ']' => pos += 1; Op("]")
        case '<' =>
          if (pos + 1 < bytes.length && bytes(pos + 1) == '<') parseDict()
          else parseHexString()
        case '>' =>
          require(pos + 1 < bytes.length && bytes(pos + 1) == '>',
            "stray '>'")
          pos += 2; Op(">>")
        case '{' => pos += 1; Op("{")
        case '}' => pos += 1; Op("}")
        case ')' => throw new IllegalArgumentException("stray ')'")
        case _ if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          parseNumberOrRef()
        case _ =>
          bareToken() match {
            case "true" => PBool(true)
            case "false" => PBool(false)
            case "null" => PNull
            case "" => pos += 1; nextToken() // unexpected delimiter; skip
            case kw => Op(kw)
          }
      }
    }

    /** Next PDF OBJECT (document mode — operators are an error). */
    def nextObj(): PdfObj = nextToken() match {
      case o: PdfObj => o
      case Op(kw) => throw new IllegalArgumentException(
        s"expected object, got keyword '$kw' at $pos")
      case null => throw new IllegalArgumentException("EOF, expected object")
    }

    private def parseName(): PName = {
      pos += 1 // '/'
      val sb = new StringBuilder
      while (pos < bytes.length && !isWs(bytes(pos) & 0xff) &&
          !isDelim(bytes(pos) & 0xff)) {
        val c = bytes(pos) & 0xff
        if (c == '#' && pos + 2 < bytes.length) {
          val h = Integer.parseInt(
            new String(bytes, pos + 1, 2, StandardCharsets.ISO_8859_1), 16)
          sb.append(h.toChar)
          pos += 3
        } else { sb.append(c.toChar); pos += 1 }
      }
      PName(sb.toString)
    }

    private def parseLiteralString(): PStr = {
      pos += 1 // '('
      val out = new ByteArrayOutputStream(32)
      var depth = 1
      while (depth > 0) {
        require(pos < bytes.length, "EOF inside string")
        val c = bytes(pos) & 0xff
        pos += 1
        c match {
          case '\\' =>
            require(pos < bytes.length, "EOF after backslash")
            val e = bytes(pos) & 0xff
            pos += 1
            e match {
              case 'n' => out.write('\n')
              case 'r' => out.write('\r')
              case 't' => out.write('\t')
              case 'b' => out.write('\b')
              case 'f' => out.write('\f')
              case '(' => out.write('(')
              case ')' => out.write(')')
              case '\\' => out.write('\\')
              case '\r' => // line continuation
                if (pos < bytes.length && bytes(pos) == '\n') pos += 1
              case '\n' => ()
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'
                var k = 0
                while (k < 2 && pos < bytes.length &&
                    bytes(pos) >= '0' && bytes(pos) <= '7') {
                  v = v * 8 + (bytes(pos) - '0')
                  pos += 1; k += 1
                }
                out.write(v & 0xff)
              case other => out.write(other) // spec: backslash ignored
            }
          case '(' => depth += 1; out.write('(')
          case ')' =>
            depth -= 1
            if (depth > 0) out.write(')')
          case other => out.write(other)
        }
      }
      PStr(out.toByteArray)
    }

    private def parseHexString(): PStr = {
      pos += 1 // '<'
      val out = new ByteArrayOutputStream(32)
      var hi = -1
      var stop = false
      while (!stop) {
        require(pos < bytes.length, "EOF inside hex string")
        val c = bytes(pos) & 0xff
        pos += 1
        if (c == '>') {
          if (hi >= 0) out.write(hi << 4) // odd count: pad with 0
          stop = true
        } else if (!isWs(c)) {
          val v = Character.digit(c, 16)
          require(v >= 0, s"bad hex digit '${c.toChar}'")
          if (hi < 0) hi = v
          else { out.write((hi << 4) | v); hi = -1 }
        }
      }
      PStr(out.toByteArray)
    }

    private def parseDict(): PdfObj = {
      pos += 2 // '<<'
      val m = Map.newBuilder[String, PdfObj]
      var t = nextToken()
      while (t != Op(">>")) {
        require(t != null, "EOF inside dict")
        val key = t match {
          case PName(n) => n
          case other => throw new IllegalArgumentException(
            s"dict key must be a name, got $other")
        }
        m += key -> nextObj()
        t = nextToken()
      }
      PDict(m.result())
    }

    /** `12 0 R` needs two-token lookahead from a number. */
    private def parseNumberOrRef(): PdfObj = {
      val n1 = parseNumber()
      if (n1.v != math.floor(n1.v) || n1.v < 0) return n1
      val save = pos
      skipWs()
      if (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        val n2 = parseNumber()
        if (n2.v == math.floor(n2.v) && n2.v >= 0) {
          skipWs()
          if (pos < bytes.length && bytes(pos) == 'R' &&
              (pos + 1 >= bytes.length || isWs(bytes(pos + 1) & 0xff) ||
                isDelim(bytes(pos + 1) & 0xff))) {
            pos += 1
            return PRef(n1.int, n2.int)
          }
        }
      }
      pos = save // not a ref — rewind so following tokens re-parse
      n1
    }

    def parseNumber(): PNum = {
      skipWs()
      val start = pos
      if (pos < bytes.length && (bytes(pos) == '+' || bytes(pos) == '-'))
        pos += 1
      while (pos < bytes.length &&
          ((bytes(pos) >= '0' && bytes(pos) <= '9') || bytes(pos) == '.'))
        pos += 1
      require(pos > start, s"expected number at $start")
      PNum(new String(bytes, start, pos - start,
        StandardCharsets.ISO_8859_1).toDouble)
    }

    /** Consume an expected bare keyword. */
    def expectKeyword(kw: String): Unit = {
      skipWs()
      val got = bareToken()
      require(got == kw, s"expected '$kw', got '$got' at $pos")
    }

    def readLineRaw(): String = {
      val start = pos
      while (pos < bytes.length && bytes(pos) != '\n' && bytes(pos) != '\r')
        pos += 1
      val s = new String(bytes, start, pos - start, StandardCharsets.ISO_8859_1)
      if (pos < bytes.length && bytes(pos) == '\r') pos += 1
      if (pos < bytes.length && bytes(pos) == '\n') pos += 1
      s
    }
  }

  // -------------------------------------------------------------- filters

  def flateDecode(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new ByteArrayOutputStream(math.max(64, data.length * 4))
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) {
          if (inf.needsDictionary())
            throw new IllegalArgumentException("flate needs dictionary")
          if (inf.needsInput()) return out.toByteArray // truncated: keep what decoded
        }
        out.write(buf, 0, n)
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"bad flate data: ${e.getMessage}")
    } finally inf.end()
    out.toByteArray
  }

  def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length / 2)
    var hi = -1
    var i = 0
    var stop = false
    while (i < data.length && !stop) {
      val c = data(i) & 0xff
      if (c == '>') {
        if (hi >= 0) out.write(hi << 4)
        stop = true
      } else if (!isWs(c)) {
        val v = Character.digit(c, 16)
        require(v >= 0, s"bad hex digit in ASCIIHexDecode")
        if (hi < 0) hi = v else { out.write((hi << 4) | v); hi = -1 }
      }
      i += 1
    }
    out.toByteArray
  }

  /** PNG (predictors 10–15) / TIFF (2) predictor post-pass for Flate
    * streams — required by real-world xref streams, which near-
    * universally ship `/DecodeParms << /Predictor 12 /Columns n >>`. */
  def applyPredictor(data: Array[Byte], predictor: Int, colors: Int,
      bpc: Int, columns: Int): Array[Byte] = {
    if (predictor <= 1) return data
    val bpp = math.max(1, colors * bpc / 8)
    val rowLen = (columns * colors * bpc + 7) / 8
    if (predictor == 2) { // TIFF horizontal differencing (8-bit only)
      require(bpc == 8, "TIFF predictor supported for 8-bit components")
      val out = data.clone()
      var r = 0
      while (r * rowLen < out.length) {
        val base = r * rowLen
        var i = bpp
        while (i < rowLen && base + i < out.length) {
          out(base + i) = ((out(base + i) + out(base + i - bpp)) & 0xff).toByte
          i += 1
        }
        r += 1
      }
      return out
    }
    // PNG: each row prefixed by a filter-type byte
    val stride = rowLen + 1
    val nRows = data.length / stride
    val out = new Array[Byte](nRows * rowLen)
    val prev = new Array[Byte](rowLen)
    var r = 0
    while (r < nRows) {
      val ft = data(r * stride) & 0xff
      val row = new Array[Byte](rowLen)
      System.arraycopy(data, r * stride + 1, row, 0, rowLen)
      var i = 0
      while (i < rowLen) {
        val left = if (i >= bpp) row(i - bpp) & 0xff else 0
        val up = prev(i) & 0xff
        val ul = if (i >= bpp) prev(i - bpp) & 0xff else 0
        val raw = row(i) & 0xff
        val rec = ft match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case other =>
            throw new IllegalArgumentException(s"bad PNG filter type $other")
        }
        row(i) = (rec & 0xff).toByte
        i += 1
      }
      System.arraycopy(row, 0, out, r * rowLen, rowLen)
      System.arraycopy(row, 0, prev, 0, rowLen)
      r += 1
    }
    out
  }

  /** Decode a stream's data through its /Filter chain. */
  def decodeStream(s: PStream, resolve: PdfObj => PdfObj): Array[Byte] = {
    val filters = resolve(s.dict.get("Filter").getOrElse(PNull)) match {
      case PName(n) => Seq(n)
      case PArr(items) => items.map { case PName(n) => n
        case other => throw new IllegalArgumentException(s"bad filter $other") }
      case PNull => Seq.empty
      case other => throw new IllegalArgumentException(s"bad /Filter $other")
    }
    val parmsList: Seq[Option[PDict]] =
      resolve(s.dict.get("DecodeParms").getOrElse(PNull)) match {
        case d: PDict => Seq(Some(d))
        case PArr(items) => items.map(resolve).map {
          case d: PDict => Some(d)
          case _ => None
        }
        case _ => Seq.fill(filters.length)(None)
      }
    var data = s.raw
    filters.zipWithIndex.foreach { case (f, i) =>
      val parms = parmsList.lift(i).flatten
      def pInt(k: String, dflt: Int) = parms.flatMap(_.get(k)).map {
        case PNum(v) => v.toInt
        case _ => dflt
      }.getOrElse(dflt)
      data = f match {
        case "FlateDecode" | "Fl" =>
          applyPredictor(flateDecode(data), pInt("Predictor", 1),
            pInt("Colors", 1), pInt("BitsPerComponent", 8),
            pInt("Columns", 1))
        case "ASCIIHexDecode" | "AHx" => asciiHexDecode(data)
        case other =>
          throw new IllegalArgumentException(s"unsupported filter /$other")
      }
    }
    data
  }
}
