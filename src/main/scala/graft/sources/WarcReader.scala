package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) source — the container format the
  * public web crawls ship (Common Crawl's `crawl-data` layout: ~1 GB
  * `.warc.gz` archives, every record its own gzip member), i.e. the
  * raw input of an LLM pretraining pipeline. Implemented from the
  * PUBLIC WARC 1.0/1.1 specification: a record is
  *
  * {{{
  *   WARC/1.1 CRLF
  *   <Name: value header lines> CRLF
  *   CRLF
  *   <Content-Length bytes of block> CRLF CRLF
  * }}}
  *
  * Scale shape: reading is STREAMING per archive —
  * `sc.binaryFiles` hands each file as a `PortableDataStream`, records
  * iterate straight off the (multi-member) gzip stream, and no archive
  * ever materializes in memory. Parallelism is file-granular, the
  * standard crawl-processing shape: a 100 TB crawl is ~100k archives
  * spread across executors, and `minPartitions` keeps small file
  * counts from under-splitting. Malformed framing follows the JSONL
  * quarantine convention: the file's remaining records land in ONE
  * error row instead of failing the job at archive 97k of 100k —
  * every parsed record before the corruption is kept.
  *
  * The writer produces the same layout (each record an independent
  * gzip member, `warcinfo` first) — the export side of an archival
  * pipeline and the fixture generator for specs/p22.
  */
object WarcReader {

  /** One parsed record; `error` is null for good records and carries
    * the quarantine reason on a file's terminal error row. */
  final case class WarcRecord(file: String, warc_type: String,
      url: String, date: String, record_id: String, content_type: String,
      body: Array[Byte], truncated: Boolean, error: String)

  /** Parse every `.warc`/`.warc.gz` under `path`. Bodies larger than
    * `maxBodyBytes` are truncated to the cap (and flagged) — the
    * crawl-side convention for oversized payloads; the stream still
    * advances past the full block so following records parse. */
  def records(spark: SparkSession, path: String,
      maxBodyBytes: Int = 4 << 20, minPartitions: Int = 1): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path, minPartitions)
      .flatMap { case (file, pds) =>
        val raw = pds.open()
        recordIterator(file, raw, maxBodyBytes)
      }
      .toDF()
  }

  /** Streaming record iterator off one archive's raw stream — the
    * shared core of the RDD path and the byte-array path (structured-
    * streaming binaryFile batches deliver whole archives as bytes). */
  private def recordIterator(file: String, raw: InputStream,
      maxBodyBytes: Int): Iterator[WarcRecord] = {
    val in = new BufferedInputStream(
      if (file.endsWith(".gz"))
        new java.util.zip.GZIPInputStream(raw)
      else raw, 1 << 16)
    new Iterator[WarcRecord] {
      private var done = false
      private var pending: WarcRecord = null
      private def advance(): Unit = {
        if (pending == null && !done) {
          pending =
            try parseRecord(in, file, maxBodyBytes).orNull
            catch {
              case scala.util.control.NonFatal(e) =>
                WarcRecord(file, null, null, null, null, null,
                  Array.empty, truncated = false,
                  error = s"malformed WARC framing: ${e.getMessage}")
            }
          if (pending == null || pending.error != null) done = true
          if (pending == null) raw.close()
        }
      }
      override def hasNext: Boolean = { advance(); pending != null }
      override def next(): WarcRecord = {
        advance()
        val r = pending
        pending = null
        if (done) raw.close()
        r
      }
    }
  }

  /** Parse one in-memory archive (a streaming binaryFile batch row). */
  def recordsOfBytes(file: String, bytes: Array[Byte],
      maxBodyBytes: Int = 4 << 20): Seq[WarcRecord] =
    recordIterator(file, new java.io.ByteArrayInputStream(bytes),
      maxBodyBytes).toList

  /** (path, content) binaryFile rows → the [[records]] schema — the
    * foreachBatch bridge for streaming crawl ingestion: each archive
    * parses row-locally off its batch bytes. */
  def recordsFromBinary(batch: DataFrame,
      maxBodyBytes: Int = 4 << 20): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    batch.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        recordsOfBytes(file, bytes, maxBodyBytes) }
      .toDF()
  }

  /** Response records → the engine's documents shape: `doc_id` is the
    * row-local xxhash64 of (url, date) — the crawl convention, stable
    * across re-reads — `text` is the boilerplate-stripped payload of
    * the HTTP response ([[htmlToText]]); non-HTML responses and error
    * statuses are filtered (the pretraining ingest rule). Everything
    * is row-local: one streaming pass, no shuffle at any crawl size. */
  def textDocuments(records: DataFrame): DataFrame =
    textDocumentsAll(records)
      .filter(col("text").isNotNull && col("text") =!= "")

  /** [[textDocuments]] WITHOUT the final text filter: one row per
    * RESPONSE record, `text` null for non-HTML/error-status payloads —
    * the single-scan shape for pipelines that need both the response
    * count and the extraction (q125's ingest report reads both off one
    * cached frame instead of re-streaming the archives). */
  def textDocumentsAll(records: DataFrame): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    records
      .filter(col("error").isNull && col("warc_type") === "response")
      .select(col("file"), col("url"), col("date"), col("body"),
        col("truncated"))
      .as[(String, String, String, Array[Byte], Boolean)]
      .map { case (file, url, date, body, truncated) =>
        val (status, ctype, payload) = httpParts(body)
        val html = ctype == null || ctype.contains("text/html") ||
          ctype.contains("application/xhtml")
        val text = if (status == 200 && html)
          htmlToText(new String(payload, charsetOf(ctype))) else null
        (file, url, date, status, text, truncated)
      }
      .toDF("file", "url", "date", "http_status", "text", "truncated")
      .select(
        pmod(xxhash64(col("url"), col("date")), lit(Long.MaxValue))
          .as("doc_id"),
        col("url"), col("date"), col("http_status").cast("int"),
        col("text"), length(col("text")).cast("long").as("n_chars"),
        col("truncated"))
  }

  /** Charset from a `Content-Type` header's `charset=` parameter;
    * UTF-8 when absent, unknown, or unsupported in this JVM — crawl
    * pages declare ISO-8859-1/GBK/Shift_JIS routinely and decoding
    * them as UTF-8 would admit mojibake into the corpus. */
  private[graft] def charsetOf(ctype: String): java.nio.charset.Charset = {
    if (ctype == null) return StandardCharsets.UTF_8
    val m = "(?i)charset\\s*=\\s*\"?([A-Za-z0-9_.:\\-]+)\"?".r
      .findFirstMatchIn(ctype)
    m.map(_.group(1)).map { name =>
      try java.nio.charset.Charset.forName(name)
      catch { case _: Exception => StandardCharsets.UTF_8 }
    }.getOrElse(StandardCharsets.UTF_8)
  }

  // ------------------------------------------------------------- parsing

  /** None at clean EOF; throws on broken framing (caller quarantines). */
  private def parseRecord(in: InputStream, file: String,
      maxBodyBytes: Int): Option[WarcRecord] = {
    val first = firstNonEmptyLine(in)
    if (first == null) return None
    require(first.startsWith("WARC/"),
      s"expected WARC/x.y version line, got '${first.take(40)}'")
    var warcType: String = null
    var url: String = null
    var date: String = null
    var id: String = null
    var ctype: String = null
    var len = -1L
    var line = readLine(in)
    while (line != null && line.nonEmpty) {
      val colon = line.indexOf(':')
      require(colon > 0, s"malformed header line '${line.take(40)}'")
      val k = line.substring(0, colon).trim.toLowerCase
      val v = line.substring(colon + 1).trim
      k match {
        case "warc-type" => warcType = v
        case "warc-target-uri" => url = v
        case "warc-date" => date = v
        case "warc-record-id" => id = v
        case "content-type" => ctype = v
        case "content-length" => len = v.toLong
        case _ => ()
      }
      line = readLine(in)
    }
    require(line != null, "EOF inside WARC headers")
    require(len >= 0, "missing Content-Length")
    val keep = math.min(len, maxBodyBytes.toLong).toInt
    val body = new Array[Byte](keep)
    var off = 0
    while (off < keep) {
      val n = in.read(body, off, keep - off)
      if (n < 0) throw new EOFException("EOF inside WARC block")
      off += n
    }
    skipFully(in, len - keep)
    // the two CRLF record separators
    val s1 = readLine(in)
    val s2 = readLine(in)
    require(s1 != null && s1.isEmpty && s2 != null && s2.isEmpty,
      "missing CRLF CRLF record separator")
    Some(WarcRecord(file, warcType, url, date, id, ctype, body,
      truncated = len > keep, error = null))
  }

  private def skipFully(in: InputStream, n0: Long): Unit = {
    var n = n0
    while (n > 0) {
      val s = in.skip(n)
      if (s > 0) n -= s
      else if (in.read() < 0) throw new EOFException("EOF inside WARC block")
      else n -= 1
    }
  }

  /** CRLF (or bare LF) terminated line; null at EOF before any byte. */
  private def readLine(in: InputStream): String = {
    val buf = new java.io.ByteArrayOutputStream(96)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      if (c != '\r') buf.write(c)
      c = in.read()
    }
    new String(buf.toByteArray, StandardCharsets.UTF_8)
  }

  private def firstNonEmptyLine(in: InputStream): String = {
    var l = readLine(in)
    while (l != null && l.isEmpty) l = readLine(in)
    l
  }

  /** Split an `application/http` block into (status, content-type,
    * payload). A block with no HTTP header (a raw resource record)
    * passes through as status 200 payload. */
  private[sources] def httpParts(body: Array[Byte]): (Int, String, Array[Byte]) = {
    val headEnd = indexOfDoubleCrlf(body)
    if (headEnd < 0 || !startsWithHttp(body)) return (200, null, body)
    val head = new String(body, 0, headEnd, StandardCharsets.UTF_8)
    val lines = head.split("\r\n|\n")
    val status = lines.head.split(" ").lift(1).flatMap(_.toIntOption)
      .getOrElse(0)
    val ctype = lines.iterator.drop(1)
      .map(_.split(":", 2))
      .collectFirst { case Array(k, v)
        if k.trim.equalsIgnoreCase("content-type") => v.trim }
      .orNull
    val payloadStart = headEnd +
      (if (body(headEnd) == '\r') 4 else 2)
    (status, ctype,
      java.util.Arrays.copyOfRange(body, math.min(payloadStart, body.length),
        body.length))
  }

  private def startsWithHttp(body: Array[Byte]): Boolean =
    body.length >= 5 &&
      new String(body, 0, 5, StandardCharsets.US_ASCII) == "HTTP/"

  private def indexOfDoubleCrlf(body: Array[Byte]): Int = {
    var i = 0
    while (i < body.length - 1) {
      if (body(i) == '\r' && i + 3 < body.length && body(i + 1) == '\n' &&
        body(i + 2) == '\r' && body(i + 3) == '\n') return i
      if (body(i) == '\n' && body(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  // --------------------------------------------------------- html → text

  /** Boilerplate-stripping text extraction for machine-generated HTML
    * (the deterministic core of a trafilatura-class extractor):
    * `<script>`/`<style>`/comments drop with their content, block tags
    * emit newlines, inline tags vanish, basic + numeric entities
    * decode, whitespace collapses per line. */
  def htmlToText(html: String): String = {
    val noScript = "(?is)<(script|style)[^>]*>.*?</\\1>".r
      .replaceAllIn(html, " ")
    val noComment = "(?s)<!--.*?-->".r.replaceAllIn(noScript, " ")
    val blocks = "(?i)</?(p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|title|head|body|html|section|article|nav|header|footer|blockquote|pre)[^>]*>".r
      .replaceAllIn(noComment, "\n")
    val noTags = "(?s)<[^>]*>".r.replaceAllIn(blocks, " ")
    val decoded = decodeEntities(noTags)
    decoded.split("\n").iterator
      .map(_.replaceAll("[\\s\\u00a0]+", " ").trim)
      .filter(_.nonEmpty)
      .mkString("\n")
  }

  private def decodeEntities(s: String): String = {
    val named = s.replace("&nbsp;", " ").replace("&lt;", "<")
      .replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&apos;", "'")
    // Malformed/out-of-range refs ('&#3f;' decimal, '&#x110000;',
    // surrogate code points) fall back to the literal text — one bad
    // entity in crawl HTML must never fail the record, let alone the
    // archive (the file-level quarantine only covers WARC framing).
    val out = "&#x?([0-9a-fA-F]+);".r.replaceAllIn(named, m => {
      val hex = m.group(0).charAt(2) == 'x' || m.group(0).charAt(2) == 'X'
      val decoded =
        try {
          val cp = Integer.parseInt(m.group(1), if (hex) 16 else 10)
          if (cp < 0 || cp > Character.MAX_CODE_POINT ||
            (cp >= Character.MIN_SURROGATE && cp <= Character.MAX_SURROGATE))
            m.group(0)
          else new String(Character.toChars(cp))
        } catch { case _: NumberFormatException => m.group(0) }
      scala.util.matching.Regex.quoteReplacement(decoded)
    })
    out.replace("&amp;", "&") // last, so &amp;lt; decodes to &lt; literal
  }

  // -------------------------------------------------------------- writer

  /** Serialize raw members into one `.warc.gz` byte array — every
    * record its own gzip member (the crawl layout; members concatenate
    * into a valid multi-member stream). Each member is (WARC headers,
    * block bytes); Content-Length is appended automatically. */
  def buildWarcGzRaw(
      members: Seq[(Seq[(String, String)], Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { case (headers, block) =>
      val gz = new java.util.zip.GZIPOutputStream(out)
      val head = new StringBuilder("WARC/1.1\r\n")
      headers.foreach { case (k, v) => head.append(s"$k: $v\r\n") }
      head.append(s"Content-Length: ${block.length}\r\n\r\n")
      gz.write(head.toString.getBytes(StandardCharsets.UTF_8))
      gz.write(block)
      gz.write("\r\n\r\n".getBytes(StandardCharsets.US_ASCII))
      gz.finish()
    }
    out.toByteArray
  }

  /** An HTTP response member's (headers, block) pair. */
  def httpResponseMember(url: String, date: String, html: String,
      status: Int = 200,
      contentType: String = "text/html; charset=utf-8")
      : (Seq[(String, String)], Array[Byte]) = {
    val payload = html.getBytes(StandardCharsets.UTF_8)
    val http = (s"HTTP/1.1 $status OK\r\nContent-Type: $contentType\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8)
    (Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> url,
      "WARC-Date" -> date,
      "WARC-Record-ID" -> s"<urn:uuid:${url.hashCode}>",
      "Content-Type" -> "application/http; msgtype=response"),
      http ++ payload)
  }

  /** The standard archive: `warcinfo` first, then 200/text-html
    * responses — what [[records]] reads back and what p22 round-trips. */
  def buildWarcGz(fileName: String,
      responses: Seq[(String, String, String)]): Array[Byte] = {
    val info = s"software: graft\r\nisPartOf: $fileName\r\n"
      .getBytes(StandardCharsets.UTF_8)
    val infoMember = (Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "WARC-Record-ID" -> s"<urn:uuid:warcinfo-$fileName>",
      "Content-Type" -> "application/warc-fields"), info)
    buildWarcGzRaw(infoMember +: responses.map { case (url, date, html) =>
      httpResponseMember(url, date, html)
    })
  }

  /** Minimal HTML escape for payload text (round-trips through
    * [[htmlToText]]'s entity decode). */
  def htmlEscape(t: String): String =
    t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
}
