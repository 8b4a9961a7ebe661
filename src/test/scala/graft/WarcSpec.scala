package graft

import org.apache.spark.sql.functions._

import graft.sources.WarcReader

/** The WARC source (ISO 28500 / Common Crawl layout): record framing
  * round-trips through real multi-member `.warc.gz` bytes, streaming
  * parse off the gzip stream, body truncation, per-file quarantine of
  * broken framing, the HTTP/HTML extraction chain, and the p22
  * corpus round-trip.
  */
class WarcSpec extends SparkSuite {
  import spark.implicits._

  private def writeTmp(name: String, bytes: Array[Byte]): java.io.File = {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc").toFile
    val f = new java.io.File(dir, name)
    java.nio.file.Files.write(f.toPath, bytes)
    f
  }

  test("multi-member .warc.gz round-trip: warcinfo + responses parse " +
      "with exact fields and bodies") {
    val bytes = WarcReader.buildWarcGz("t", Seq(
      ("https://a.example/x", "2026-01-02T00:00:00Z",
        "<html><body><p>hello &amp; goodbye</p></body></html>"),
      ("https://a.example/y", "2026-01-03T00:00:00Z",
        "<html><body><p>second</p></body></html>")))
    val f = writeTmp("t.warc.gz", bytes)
    try {
      val recs = WarcReader.records(spark, f.getPath)
        .orderBy("record_id").collect()
      assert(recs.length == 3)
      assert(recs.map(_.getAs[String]("warc_type")).count(_ == "response") == 2)
      val info = recs.find(_.getAs[String]("warc_type") == "warcinfo").get
      assert(new String(info.getAs[Array[Byte]]("body"), "UTF-8")
        .contains("software: graft"))
      assert(recs.forall(_.getAs[String]("error") == null))
      assert(recs.forall(!_.getAs[Boolean]("truncated")))
      val x = recs.find(r => r.getAs[String]("url") == "https://a.example/x").get
      val body = new String(x.getAs[Array[Byte]]("body"), "UTF-8")
      assert(body.startsWith("HTTP/1.1 200"), body.take(30))
      assert(body.endsWith("<html><body><p>hello &amp; goodbye</p></body></html>"))
      // extraction: status parse, content-type gate, entity decode
      val docs = WarcReader.textDocuments(WarcReader.records(spark, f.getPath))
        .orderBy("url").collect()
      assert(docs.length == 2)
      assert(docs.head.getAs[String]("text") == "hello & goodbye")
      assert(docs.head.getAs[Int]("http_status") == 200)
      assert(docs.head.getAs[Long]("doc_id") >= 0L)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(f.getParentFile)
  }

  test("oversized bodies truncate at the cap and framing still advances " +
      "to the next record") {
    val big = "x" * 5000
    val bytes = WarcReader.buildWarcGz("t", Seq(
      ("https://a.example/big", "2026-01-02T00:00:00Z", big),
      ("https://a.example/after", "2026-01-03T00:00:00Z",
        "<p>still here</p>")))
    val f = writeTmp("t.warc.gz", bytes)
    try {
      val recs = WarcReader.records(spark, f.getPath, maxBodyBytes = 256)
        .filter(col("warc_type") === "response").orderBy("url").collect()
      assert(recs.length == 2)
      val bigRec = recs.find(_.getAs[String]("url").endsWith("/big")).get
      assert(bigRec.getAs[Boolean]("truncated"))
      assert(bigRec.getAs[Array[Byte]]("body").length == 256)
      val after = recs.find(_.getAs[String]("url").endsWith("/after")).get
      assert(!after.getAs[Boolean]("truncated"))
      assert(new String(after.getAs[Array[Byte]]("body"), "UTF-8")
        .endsWith("<p>still here</p>"))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(f.getParentFile)
  }

  test("broken framing quarantines the file's remainder as ONE error " +
      "row; records before the corruption are kept") {
    val good = WarcReader.buildWarcGz("t", Seq(
      ("https://a.example/ok", "2026-01-02T00:00:00Z", "<p>fine</p>")))
    val garbage = {
      val out = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write("NOT A WARC RECORD AT ALL\r\n\r\n".getBytes("UTF-8"))
      gz.finish()
      out.toByteArray
    }
    val f = writeTmp("t.warc.gz", good ++ garbage)
    try {
      val recs = WarcReader.records(spark, f.getPath).collect()
      val errs = recs.filter(_.getAs[String]("error") != null)
      assert(errs.length == 1, recs.mkString("\n"))
      assert(errs.head.getAs[String]("error")
        .contains("malformed WARC framing"))
      assert(recs.count(_.getAs[String]("warc_type") == "response") == 1)
      assert(recs.count(_.getAs[String]("warc_type") == "warcinfo") == 1)
      // the extraction path simply skips the quarantine row
      assert(WarcReader.textDocuments(
        WarcReader.records(spark, f.getPath)).count() == 1)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(f.getParentFile)
  }

  test("non-200 statuses and non-HTML content types are filtered by " +
      "textDocuments; raw resource blocks pass through") {
    val members = Seq(
      WarcReader.httpResponseMember("https://a.example/ok",
        "2026-01-02T00:00:00Z", "<p>keep</p>"),
      WarcReader.httpResponseMember("https://a.example/missing",
        "2026-01-02T00:00:00Z", "<p>gone</p>", status = 404),
      WarcReader.httpResponseMember("https://a.example/img",
        "2026-01-02T00:00:00Z", "binarypayload", contentType = "image/png"))
    val f = writeTmp("t.warc.gz", WarcReader.buildWarcGzRaw(members))
    try {
      val docs = WarcReader.textDocuments(WarcReader.records(spark, f.getPath))
        .collect()
      assert(docs.length == 1, docs.mkString("\n"))
      assert(docs.head.getAs[String]("url") == "https://a.example/ok")
      assert(docs.head.getAs[String]("text") == "keep")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(f.getParentFile)
  }

  test("htmlToText: script/style/comments drop with content, block tags " +
      "break lines, entities decode, whitespace collapses") {
    val html =
      """<html><head><title>T</title><style>p { color: red }</style>
        |<script>if (1 < 2) { alert("x"); }</script></head>
        |<!-- secret comment --><body>
        |<h1>Head&nbsp;line</h1>
        |<p>alpha <b>beta</b>   gamma &amp; delta &#65;&#x42;</p>
        |<ul><li>one</li><li>two</li></ul>
        |</body></html>""".stripMargin
    val got = WarcReader.htmlToText(html)
    assert(got == "T\nHead line\nalpha beta gamma & delta AB\none\ntwo", got)
    // escape round-trip: htmlEscape -> htmlToText is identity on text
    val t = "a < b & c > d"
    assert(WarcReader.htmlToText(s"<p>${WarcReader.htmlEscape(t)}</p>") == t)
  }

  test("malformed numeric character references fall back to literal " +
      "text instead of failing the record") {
    // '&#3f;' is an invalid DECIMAL ref (NumberFormatException before
    // the fix); '&#x110000;' is beyond MAX_CODE_POINT; '&#xD800;' is a
    // surrogate — all three must survive as literals, valid refs still
    // decode, and the whole string round-trips without throwing.
    val got = WarcReader.htmlToText(
      "<p>a &#3f; b &#x110000; c &#xD800; d &#65; e</p>")
    assert(got == "a &#3f; b &#x110000; c &#xD800; d A e", got)
    // and end-to-end: one garbage entity in one page must not fail the
    // extraction job for the archive
    val f = writeTmp("t.warc.gz", WarcReader.buildWarcGz("t", Seq(
      ("https://a.example/bad", "2026-01-02T00:00:00Z",
        "<p>pre &#x110000; post</p>"),
      ("https://a.example/ok", "2026-01-03T00:00:00Z", "<p>fine</p>"))))
    try {
      val docs = WarcReader.textDocuments(WarcReader.records(spark, f.getPath))
        .orderBy("url").collect()
      assert(docs.length == 2)
      assert(docs.head.getAs[String]("text") == "pre &#x110000; post")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(f.getParentFile)
  }

  test("Content-Type charset drives body decoding (ISO-8859-1 pages " +
      "don't enter the corpus as mojibake); unknown charsets fall back " +
      "to UTF-8") {
    import java.nio.charset.{Charset, StandardCharsets}
    val latinText = "café naïve" // é/ï are single bytes in latin-1
    val latinHtml = s"<p>$latinText</p>"
    def member(url: String, ctype: String, charset: Charset) = {
      val payload = latinHtml.getBytes(charset)
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n")
        .getBytes(StandardCharsets.UTF_8)
      (Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> url,
        "WARC-Date" -> "2026-01-02T00:00:00Z",
        "WARC-Record-ID" -> s"<urn:uuid:${url.hashCode}>",
        "Content-Type" -> "application/http; msgtype=response"),
        http ++ payload)
    }
    val f = writeTmp("t.warc.gz", WarcReader.buildWarcGzRaw(Seq(
      member("https://a.example/latin",
        "text/html; charset=ISO-8859-1", StandardCharsets.ISO_8859_1),
      member("https://a.example/utf8",
        "text/html; charset=utf-8", StandardCharsets.UTF_8),
      member("https://a.example/unknown",
        "text/html; charset=x-no-such-charset", StandardCharsets.UTF_8))))
    try {
      val docs = WarcReader.textDocuments(WarcReader.records(spark, f.getPath))
        .orderBy("url").collect()
      assert(docs.length == 3)
      assert(docs.forall(_.getAs[String]("text") == latinText),
        docs.map(_.getAs[String]("text")).mkString("|"))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(f.getParentFile)
    // the header parser itself
    assert(WarcReader.charsetOf("text/html; charset=ISO-8859-1")
      == StandardCharsets.ISO_8859_1)
    assert(WarcReader.charsetOf("text/html; charset=\"utf-8\"")
      == StandardCharsets.UTF_8)
    assert(WarcReader.charsetOf("text/html") == StandardCharsets.UTF_8)
    assert(WarcReader.charsetOf(null) == StandardCharsets.UTF_8)
    assert(WarcReader.charsetOf("text/html; charset=bogus!!!")
      == StandardCharsets.UTF_8)
  }

  test("textDocuments propagates the truncated flag so ingest can " +
      "filter cut-off payloads") {
    val bytes = WarcReader.buildWarcGz("t", Seq(
      ("https://a.example/big", "2026-01-02T00:00:00Z",
        "<p>" + ("word " * 2000) + "</p>"),
      ("https://a.example/small", "2026-01-03T00:00:00Z", "<p>ok</p>")))
    val f = writeTmp("t.warc.gz", bytes)
    try {
      val docs = WarcReader.textDocuments(
        WarcReader.records(spark, f.getPath, maxBodyBytes = 512))
        .orderBy("url").collect()
      assert(docs.length == 2)
      assert(docs.find(_.getAs[String]("url").endsWith("/big")).get
        .getAs[Boolean]("truncated"))
      assert(!docs.find(_.getAs[String]("url").endsWith("/small")).get
        .getAs[Boolean]("truncated"))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(f.getParentFile)
  }

  test("p22 corpus round-trip: every document survives export to real " +
      "multi-member archives and streaming re-ingestion") {
    val got = graft.queries.PipelineOps.p22(spark, sf("0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val nDocs = graft.Tables(spark, sf("0.001")).documents.count()
    assert(got.length == nDocs, s"${got.length} of $nDocs docs extracted")
    assert(got.forall(_._2 == 1L),
      s"mismatched docs: ${got.filter(_._2 != 1L).take(5).mkString(",")}")
  }
}
