package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The library facade end-to-end: directory of ALTO files in,
  * TEI + JATS + training data out — the reference's parser-session
  * surface (`app/parser.py`) as Spark stages.
  */
class GraftFacadeSpec extends SparkSuite {
  import spark.implicits._

  test("readAlto -> process -> toTei/toJats round trip; parse() joins both") {
    val dir = Files.createTempDirectory("graft-facade").toFile
    try {
      val xml = new PipelineSpec().altoXml
      Files.write(new java.io.File(dir, "a.alto.xml").toPath, xml.getBytes)
      Files.write(new java.io.File(dir, "bad.alto.xml").toPath,
        xml.take(xml.length / 3).getBytes)

      // strict read fails on the corrupt file; permissive skips it
      val tokens = Graft.readAlto(spark, dir.getPath, permissive = true)
      assert(tokens.select("doc_id").distinct().count() == 1)
      val bad = Graft.quarantine(spark, dir.getPath).collect()
      assert(bad.length == 1 && bad(0).getString(1).contains("Exception"))

      val out = Graft.parse(tokens).collect()
      assert(out.length == 1)
      val row = out.head
      val tei = row.getAs[String]("tei")
      val jats = row.getAs[String]("jats")
      assert(tei.contains("""<title level="a" type="main" """ +
        """coords="1,100.00,60.00,66.00,18.00">""" +
        """<hi rend="bold">A Title</hi></title>"""))
      assert(jats.contains("<article-title>A Title</article-title>"))

      val train = Graft.headerTrainingData(tokens).collect()
      assert(train.length == 1 &&
        train.head.getString(1).contains("<docTitle><titlePart>A Title"))
      val segTrain = Graft.segmentationTrainingData(tokens).collect()
      assert(segTrain.length == 1 && segTrain.head.getString(1).contains("<front>"))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("facade composes with the corpus operators") {
    val docs = Seq((0L, "the quick brown fox"), (1L, "the quick brown fox"))
      .toDF("doc_id", "text")
    // dedup over the same frame shape the pipeline's documents use
    val kept = graft.operators.Dedup.deduplicate(docs).collect()
    assert(kept.length == 1 && kept.head.getLong(0) == 0L)
  }
}
