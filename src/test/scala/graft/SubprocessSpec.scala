package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{BioSpans, Features, WapitiLabeler}
import graft.sources.Subprocess

/** The external-binary seams exercised with real processes — stand-in
  * commands (`cp`, shell scripts) in place of pdfalto/wapiti, driving
  * the identical calling conventions.
  */
class SubprocessSpec extends SparkSuite {
  import spark.implicits._

  test("conversionRunner: file-based convert with {in}/{out} substitution") {
    val run = Subprocess.conversionRunner(Seq("cp", "{in}", "{out}"), ".pdf", ".xml")
    assert(new String(run("hello".getBytes)) == "hello")
  }

  test("conversionRunner: nonzero exit raises") {
    val run = Subprocess.conversionRunner(Seq("false"), ".a", ".b")
    intercept[RuntimeException](run("x".getBytes))
  }

  test("pdfTokens: binaryFile corpus -> stand-in converter -> token table") {
    // the "PDF" files already contain ALTO; `cp` stands in for pdfalto
    val dir = java.nio.file.Files.createTempDirectory("graft-pdf").toFile
    val xml = new PipelineSpec().altoXml
    java.nio.file.Files.write(new java.io.File(dir, "a.pdf").toPath, xml.getBytes)
    java.nio.file.Files.write(new java.io.File(dir, "b.pdf").toPath, xml.getBytes)
    try {
      val toks = Subprocess.pdfTokens(spark, dir.getPath,
        pdfaltoCommand = Seq("cp", "{in}", "{out}"))
      assert(toks.count() == 8) // 4 tokens × 2 docs
      assert(toks.select("doc_id").distinct().count() == 2)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("changeExt: extension swap with .gz unwrapping") {
    assert(Subprocess.changeExt("paper.docx", ".pdf") == "paper.pdf")
    assert(Subprocess.changeExt("paper.docx.gz", ".pdf") == "paper.pdf")
    assert(Subprocess.changeExt("noext", ".pdf") == "noext.pdf")
    assert(Subprocess.changeExt("a.dir/noext", ".pdf") == "a.dir/noext.pdf")
  }

  test("officeToPdfRunner: soffice --outdir convention resolves basename.pdf") {
    val run = Subprocess.officeToPdfRunner(
      Seq("/bin/sh", "-c", "cp {in} {outDir}/doc.pdf"))
    assert(new String(run("fake-docx".getBytes)) == "fake-docx")
    // a converter that produces nothing fails loudly
    val bad = Subprocess.officeToPdfRunner(Seq("/bin/sh", "-c", "true"))
    intercept[RuntimeException](bad("x".getBytes))
  }

  test("officeTokens: docx -> pdf -> alto two-hop chain to the token table") {
    // stand-ins: the "docx" already contains ALTO; soffice hop copies it
    // into the outdir under the converted name, pdfalto hop copies again
    val dir = java.nio.file.Files.createTempDirectory("graft-office").toFile
    val xml = new PipelineSpec().altoXml
    java.nio.file.Files.write(new java.io.File(dir, "a.docx").toPath, xml.getBytes)
    try {
      val toks = Subprocess.officeTokens(spark, dir.getPath,
        sofficeCommand = Seq("/bin/sh", "-c", "cp {in} {outDir}/doc.pdf"),
        pdfaltoCommand = Seq("cp", "{in}", "{out}"))
      assert(toks.count() == 4) // the fixture's 4 tokens
      assert(toks.select("doc_id").distinct().count() == 1)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("renderPageImages: one PDF -> numbered page images (pdftoppm shape)") {
    val pdfs = Seq((7L, "pagecontent".getBytes)).toDS()
    val images = Subprocess.renderPageImages(pdfs,
      Seq("/bin/sh", "-c", "cp {in} {out}-1.png && cp {in} {out}-2.png"))
    val rows = images.collect()
      .map(r => (r.getLong(0), r.getInt(1), new String(r.getAs[Array[Byte]](2))))
      .sortBy(_._2)
    assert(rows.toSeq == Seq((7L, 1, "pagecontent"), (7L, 2, "pagecontent")))
  }

  test("renderPageImagesBatched: one process per partition over a manifest dir") {
    val pdfs = Seq((7L, "seven".getBytes), (8L, "eight".getBytes),
      (9L, "nine".getBytes)).toDS().repartition(2)
    val images = Subprocess.renderPageImagesBatched(pdfs,
      Seq("/bin/sh", "-c",
        "for f in {inDir}/*.pdf; do b=$(basename $f .pdf); " +
          "cp $f {outDir}/$b-1.png; cp $f {outDir}/$b-2.png; done"))
    val rows = images.collect()
      .map(r => (r.getLong(0), r.getInt(1), new String(r.getAs[Array[Byte]](2))))
      .sortBy(r => (r._1, r._2))
    assert(rows.toSeq == Seq((7L, 1, "seven"), (7L, 2, "seven"),
      (8L, 1, "eight"), (8L, 2, "eight"), (9L, 1, "nine"), (9L, 2, "nine")))
  }

  test("WapitiLabeler: >64KB per-partition payload does not deadlock the pipes") {
    // An eagerly-echoing tagger + a payload far beyond both OS pipe
    // buffers: the old write-all-then-read implementation deadlocks
    // here (tagger blocks writing stdout while we still write stdin);
    // the writer-thread/lockstep implementation must stream through.
    val script = java.nio.file.Files.createTempFile("fake-wapiti-big", ".sh")
    java.nio.file.Files.write(script,
      """#!/bin/sh
        |while IFS= read -r line; do
        |  if [ -n "$line" ]; then printf '%s\tO\n' "$line"; fi
        |done""".stripMargin.getBytes)
    script.toFile.setExecutable(true)
    try {
      val pad = "f" * 120 // ~128 bytes/line x 4000 lines ~ 500KB each way
      val rows = (0 until 4).flatMap { doc =>
        (0 until 1000).map(i => (doc.toLong, 0, 0, i, 0, s"t$i", " ", s"t$i $pad"))
      }
      val df = rows.toDF("doc_id", "page_idx", "block_idx", "line_idx",
        "token_idx", "text", "whitespace", "features").repartition(1)
      val labeled = new WapitiLabeler(Seq("/bin/sh", script.toString)).label(df)
      assert(labeled.count() == 4000)
      assert(labeled.filter(col("label") === "O").count() == 4000)
    } finally java.nio.file.Files.deleteIfExists(script)
  }

  test("WapitiLabeler: persistent per-partition tagger via stdin/stdout protocol") {
    // stand-in tagger: echoes each non-empty line with a label derived
    // from the first field (wapiti's output shape: line TAB label)
    val script = java.nio.file.Files.createTempFile("fake-wapiti", ".sh")
    java.nio.file.Files.write(script,
      """#!/bin/sh
        |while IFS= read -r line; do
        |  if [ -n "$line" ]; then
        |    first=${line%% *}
        |    case "$first" in
        |      Title|A) printf '%s\tI-<title>\n' "$line";;
        |      *) printf '%s\tO\n' "$line";;
        |    esac
        |  fi
        |done""".stripMargin.getBytes)
    script.toFile.setExecutable(true)
    try {
      val xml = new PipelineSpec().altoXml
      val tokens = graft.sources.AltoReader.tokens(Seq((0L, xml)).toDS()).toDF()
      val withFeatures = Features.headerFeatures(tokens)
      val labeler = new WapitiLabeler(Seq("/bin/sh", script.toString))
      val labeled = labeler.label(withFeatures)
      val byText = labeled.select("text", "label").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(byText("A") == "I-<title>" && byText("Title") == "I-<title>")
      assert(byText("Jane") == "O" && byText("Doe") == "O")
      // and the labels flow into span grouping downstream
      val spans = BioSpans.spans(labeled)
      assert(spans.filter(col("tag") === "<title>").count() == 1)
    } finally java.nio.file.Files.deleteIfExists(script)
  }
}
