package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.TimeUnit

import org.apache.spark.sql.{DataFrame, Dataset}

/** Executor-local subprocess integration (SURVEY.md §7 hard part #1).
  *
  * The reference shells out at three boundaries: pdfalto for PDF→ALTO
  * (`external/pdfalto/wrapper.py:20-48`), LibreOffice for office→PDF
  * (`transformers/doc_converter_wrapper.py`), and a persistent Wapiti
  * process for CRF tagging (`models/wapiti_model_impl.py:25-164`).
  * The Spark shape for all three is the same: `mapPartitions`, binary
  * resolved on the executor (spark-submit `--files` / container image),
  * one process (or one persistent process) per partition so process
  * startup amortizes over the partition's rows — never per row, never
  * on the driver.
  *
  * The runners below are generic over the command, so the seam is fully
  * testable in this binary-less container with stand-in commands
  * (`cat`, `tr`, …); pdfalto/wapiti slot in as configuration.
  */
object Subprocess {

  /** File-based conversion: bytes → `cmd in out` → bytes (the pdfalto
    * calling convention: `pdfalto -noImageInline -fullFontName
    * <pdf> <out.xml>`). One process per row, processes per partition run
    * sequentially in the task thread; `timeoutSeconds` kills hangs
    * (Spark task retry replaces the reference's retry loop).
    */
  def conversionRunner(
      command: Seq[String],
      inputSuffix: String,
      outputSuffix: String,
      timeoutSeconds: Long = 600L): Array[Byte] => Array[Byte] = { input =>
    val inFile = Files.createTempFile("graft-conv-in", inputSuffix)
    val outFile = Files.createTempFile("graft-conv-out", outputSuffix)
    try {
      Files.write(inFile, input)
      val cmd = command.map(
        _.replace("{in}", inFile.toString).replace("{out}", outFile.toString))
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      val proc = pb.start()
      proc.getOutputStream.close()
      val finished = proc.waitFor(timeoutSeconds, TimeUnit.SECONDS)
      if (!finished) {
        proc.destroyForcibly()
        throw new RuntimeException(s"subprocess timed out: ${cmd.mkString(" ")}")
      }
      if (proc.exitValue() != 0)
        throw new RuntimeException(
          s"subprocess failed (${proc.exitValue()}): ${cmd.mkString(" ")}")
      Files.readAllBytes(outFile)
    } finally {
      Files.deleteIfExists(inFile)
      Files.deleteIfExists(outFile)
    }
  }

  /** Convert a binary corpus with an executor-local tool.
    * @param binary (id, content) rows, e.g. from
    *   `spark.read.format("binaryFile")`
    * @return (id, converted-bytes)
    */
  def convert(binary: Dataset[(Long, Array[Byte])], command: Seq[String],
      inputSuffix: String, outputSuffix: String): Dataset[(Long, Array[Byte])] = {
    import binary.sparkSession.implicits._
    binary.mapPartitions { it =>
      val run = conversionRunner(command, inputSuffix, outputSuffix)
      it.map { case (id, content) => (id, run(content)) }
    }
  }

  /** A9: render a PDF's pages to images — the pdftoppm calling
    * convention (`cmd … {in} {out}` where `{out}` is the output file
    * PREFIX; the tool writes `{out}-<n>.png` per page, which is what
    * pdf2image drives in the reference,
    * `processors/document_page_image.py:19-57`). Page numbers are
    * parsed from the trailing digits of each output filename.
    */
  def pageImageRunner(
      command: Seq[String],
      inputSuffix: String = ".pdf",
      timeoutSeconds: Long = 600L): Array[Byte] => Seq[(Int, Array[Byte])] = { input =>
    val inFile = Files.createTempFile("graft-render-in", inputSuffix)
    val outDir = Files.createTempDirectory("graft-render-out")
    try {
      Files.write(inFile, input)
      val prefix = outDir.resolve("page").toString
      val cmd = command.map(
        _.replace("{in}", inFile.toString).replace("{out}", prefix))
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      val proc = pb.start()
      proc.getOutputStream.close()
      val finished = proc.waitFor(timeoutSeconds, TimeUnit.SECONDS)
      if (!finished) {
        proc.destroyForcibly()
        throw new RuntimeException(s"render timed out: ${cmd.mkString(" ")}")
      }
      if (proc.exitValue() != 0)
        throw new RuntimeException(
          s"render failed (${proc.exitValue()}): ${cmd.mkString(" ")}")
      val Num = ".*?(\\d+)\\.[A-Za-z]+$".r
      val listed = Files.list(outDir)
      try {
        import scala.jdk.CollectionConverters._
        listed.iterator().asScala.toSeq
          .sortBy(_.getFileName.toString)
          .flatMap { p =>
            p.getFileName.toString match {
              case Num(n) => Some((n.toInt, Files.readAllBytes(p)))
              case _ => None
            }
          }
      } finally listed.close()
    } finally {
      Files.deleteIfExists(inFile)
      import scala.jdk.CollectionConverters._
      val leftover = Files.list(outDir)
      try leftover.iterator().asScala.foreach(p => Files.deleteIfExists(p))
      finally leftover.close()
      Files.deleteIfExists(outDir)
    }
  }

  /** A9 distributed stage: PDF corpus → (doc_id, page_number, image).
    * One render process per document, sequential within the task — the
    * page-pruning gates (G5/G6/I1/I2) should select the documents/pages
    * BEFORE this runs; rendering is the expensive stage being gated.
    */
  def renderPageImages(pdfs: Dataset[(Long, Array[Byte])],
      command: Seq[String]): DataFrame = {
    import pdfs.sparkSession.implicits._
    pdfs.mapPartitions { it =>
      val run = pageImageRunner(command)
      it.flatMap { case (id, bytes) =>
        run(bytes).map { case (pn, img) => (id, pn, img) }
      }
    }.toDF("doc_id", "page_number", "image")
  }

  /** A9 batched variant: ONE render process per partition over a
    * manifest directory — `{inDir}` holds `<doc_id>.pdf` files, the
    * tool writes `<doc_id>-<page>.<ext>` into `{outDir}` (the wrapper
    * loop one ships around pdftoppm). Amortizes process startup over
    * the whole partition — per-document spawn costs dominate the
    * per-doc runner when the corpus is large relative to page work
    * (measured here: ~0.4 s/spawn sandboxed, 32 s for 833 docs at
    * sf0.1 vs ~1 s batched). Tradeoff vs [[renderPageImages]]: a
    * timeout/crash fails the whole partition (Spark retries it), not
    * one document — acceptable because rendering is gated on pruned
    * candidates.
    */
  def renderPageImagesBatched(pdfs: Dataset[(Long, Array[Byte])],
      command: Seq[String], timeoutSeconds: Long = 600L): DataFrame = {
    import pdfs.sparkSession.implicits._
    pdfs.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val inDir = Files.createTempDirectory("graft-render-batch-in")
        val outDir = Files.createTempDirectory("graft-render-batch-out")
        try {
          it.foreach { case (id, bytes) =>
            Files.write(inDir.resolve(s"$id.pdf"), bytes)
          }
          val cmd = command.map(
            _.replace("{inDir}", inDir.toString).replace("{outDir}", outDir.toString))
          val pb = new ProcessBuilder(cmd: _*)
          pb.redirectErrorStream(true)
          val proc = pb.start()
          proc.getOutputStream.close()
          val finished = proc.waitFor(timeoutSeconds, TimeUnit.SECONDS)
          if (!finished) {
            proc.destroyForcibly()
            throw new RuntimeException(s"batch render timed out: ${cmd.mkString(" ")}")
          }
          if (proc.exitValue() != 0)
            throw new RuntimeException(
              s"batch render failed (${proc.exitValue()}): ${cmd.mkString(" ")}")
          val Num = "(\\d+)-(\\d+)\\.[A-Za-z]+$".r
          val listed = Files.list(outDir)
          val rows = try {
            import scala.jdk.CollectionConverters._
            listed.iterator().asScala.toSeq
              .sortBy(_.getFileName.toString)
              .flatMap { p =>
                p.getFileName.toString match {
                  case Num(id, pn) => Some((id.toLong, pn.toInt, Files.readAllBytes(p)))
                  case _ => None
                }
              }
          } finally listed.close()
          rows.iterator
        } finally {
          import scala.jdk.CollectionConverters._
          Seq(inDir, outDir).foreach { dir =>
            val leftover = Files.list(dir)
            try leftover.iterator().asScala.foreach(p => Files.deleteIfExists(p))
            finally leftover.close()
            Files.deleteIfExists(dir)
          }
        }
      }
    }.toDF("doc_id", "page_number", "image")
  }

  /** `change_ext` port (`transformers/doc_converter_wrapper.py:23-31`):
    * swap a filename's extension, unwrapping a trailing `.gz` first
    * (`paper.docx.gz` → `paper.pdf`).
    */
  def changeExt(path: String, newExt: String): String = {
    val degz = if (path.endsWith(".gz")) path.dropRight(3) else path
    val dot = degz.lastIndexOf('.')
    val slash = degz.lastIndexOf('/')
    if (dot > slash) degz.substring(0, dot) + newExt else degz + newExt
  }

  /** A3: office document → PDF, the LibreOffice headless convention —
    * `soffice --headless --convert-to pdf --outdir {outDir} {in}`,
    * where the tool derives the output name from the input basename
    * ([[changeExt]] semantics), so the runner resolves
    * `<basename>.pdf` in the out dir. The reference drives the same
    * conversion through a persistent UNO listener + pyuno script with
    * restart-on-max-uptime and connection retry
    * (`transformers/doc_converter_wrapper.py:98-231`); here the
    * process-lifetime management maps onto Spark's execution model —
    * one process invocation per document inside `mapPartitions`, task
    * retry replacing the wrapper's retry loop.
    */
  def officeToPdfRunner(
      command: Seq[String],
      inputSuffix: String = ".docx",
      timeoutSeconds: Long = 600L): Array[Byte] => Array[Byte] = { input =>
    val inDir = Files.createTempDirectory("graft-office-in")
    val outDir = Files.createTempDirectory("graft-office-out")
    val inFile = inDir.resolve(s"doc$inputSuffix")
    try {
      Files.write(inFile, input)
      val cmd = command.map(
        _.replace("{in}", inFile.toString).replace("{outDir}", outDir.toString))
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      val proc = pb.start()
      proc.getOutputStream.close()
      val finished = proc.waitFor(timeoutSeconds, TimeUnit.SECONDS)
      if (!finished) {
        proc.destroyForcibly()
        throw new RuntimeException(s"office convert timed out: ${cmd.mkString(" ")}")
      }
      if (proc.exitValue() != 0)
        throw new RuntimeException(
          s"office convert failed (${proc.exitValue()}): ${cmd.mkString(" ")}")
      val outFile = outDir.resolve(changeExt(inFile.getFileName.toString, ".pdf"))
      if (!Files.exists(outFile))
        throw new RuntimeException(s"office convert produced no ${outFile.getFileName}")
      Files.readAllBytes(outFile)
    } finally {
      import scala.jdk.CollectionConverters._
      Seq(inDir, outDir).foreach { dir =>
        val leftover = Files.list(dir)
        try leftover.iterator().asScala.foreach(p => Files.deleteIfExists(p))
        finally leftover.close()
        Files.deleteIfExists(dir)
      }
    }
  }

  /** A3 distributed stage: office-doc corpus → PDF bytes. */
  def officeToPdf(docs: Dataset[(Long, Array[Byte])], command: Seq[String],
      inputSuffix: String = ".docx"): Dataset[(Long, Array[Byte])] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { it =>
      val run = officeToPdfRunner(command, inputSuffix)
      it.map { case (id, content) => (id, run(content)) }
    }
  }

  /** A3 → A1 chain: office-document corpus → PDF (soffice convention)
    * → ALTO (pdfalto convention) → token table — the reference's
    * DOC/DOCX ingestion path (`app/parser.py` media-type routing into
    * `doc_to_pdf` then the PDF pipeline).
    */
  def officeTokens(spark: org.apache.spark.sql.SparkSession, path: String,
      sofficeCommand: Seq[String] =
        Seq("soffice", "--headless", "--convert-to", "pdf",
          "--outdir", "{outDir}", "{in}"),
      pdfaltoCommand: Seq[String] =
        Seq("pdfalto", "-noImageInline", "-fullFontName", "-noLineNumbers",
          "{in}", "{out}"),
      inputSuffix: String = ".docx"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val raw = spark.read.format("binaryFile").load(path)
      .select(xxhash64(col("path")).as("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
    val pdfs = officeToPdf(raw, sofficeCommand, inputSuffix)
    val alto = convert(pdfs, pdfaltoCommand, ".pdf", ".xml")
      .map { case (id, bytes) => (id, new String(bytes, StandardCharsets.UTF_8)) }
    AltoReader.tokens(alto).toDF()
  }

  /** PDF corpus → token table, pdfalto convention: reads a directory of
    * PDFs via binaryFile, converts per partition, parses the resulting
    * ALTO. `pdfaltoCommand` defaults to the real binary's argument
    * shape; tests substitute a stand-in. (A1; the office-doc → PDF hop
    * (A3) chains another `convert` in front.)
    */
  def pdfTokens(spark: org.apache.spark.sql.SparkSession, path: String,
      pdfaltoCommand: Seq[String] =
        Seq("pdfalto", "-noImageInline", "-fullFontName", "-noLineNumbers",
          "{in}", "{out}")): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // doc_id = xxhash64(path): map-side, shuffle-free id assignment (a
    // global row_number window would single-task the whole corpus).
    val raw = spark.read.format("binaryFile").load(path)
      .select(xxhash64(col("path")).as("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
    val alto = convert(raw, pdfaltoCommand, ".pdf", ".xml")
      .map { case (id, bytes) => (id, new String(bytes, StandardCharsets.UTF_8)) }
    AltoReader.tokens(alto).toDF()
  }
}
