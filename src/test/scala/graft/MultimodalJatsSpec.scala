package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sinks.Jats
import graft.sources.Lexicon

class MultimodalJatsSpec extends SparkSuite {
  import spark.implicits._

  test("multimodal: binary media rows → batched features, deterministic") {
    val media = Multimodal.mediaFromDocuments(
      Tables(spark, sf("0.001")).documents.limit(50))
    val feats = Multimodal.imageFeatures(media, dim = 8, batchSize = 16)
    val rows = feats.collect()
    assert(rows.length == 50)
    assert(rows.forall(r => r.width >= 64 && r.height >= 64 &&
      r.channels >= 1 && r.embedding.length == 8))
    // determinism across runs
    val again = Multimodal.imageFeatures(media, dim = 8, batchSize = 7).collect()
    assert(rows.sortBy(_.doc_id).map(_.embedding.toSeq).toSeq ==
      again.sortBy(_.doc_id).map(_.embedding.toSeq).toSeq)
  }

  test("multimodal: frame sampling explodes deterministic digests") {
    val video = Seq((0L, Array.fill[Byte](5000)(7))).toDF("doc_id", "content")
    val frames = Multimodal.sampleFrames(video).select("doc_id", "frame_idx", "frame_digest")
    assert(frames.count() == 3) // ceil(5000/1024)=5 frames, every 2nd: 0,2,4
  }

  test("JATS: XSLT maps TEI title/authors/abstract") {
    val tei = """<TEI xmlns="http://www.tei-c.org/ns/1.0"><teiHeader><fileDesc>""" +
      """<titleStmt><title level="a" type="main">A Title</title></titleStmt>""" +
      """<sourceDesc><biblStruct><analytic><author><persName>""" +
      """<forename type="first">Jane</forename><surname>Doe</surname>""" +
      """</persName></author></analytic></biblStruct></sourceDesc></fileDesc>""" +
      """<profileDesc><abstract><p>An abstract.</p></abstract></profileDesc>""" +
      """</teiHeader><text><body/><back/></text></TEI>"""
    val jats = Jats.transform(tei)
    assert(jats.contains("<article-title>A Title</article-title>"))
    assert(jats.contains("<surname>Doe</surname>"))
    assert(jats.contains("<given-names>Jane</given-names>"))
    assert(jats.contains("<abstract><p>An abstract.</p></abstract>"))

    val df = Jats.serialize(Seq((0L, tei)).toDF("doc_id", "tei"))
    assert(df.collect().head.getString(1).contains("<article-title>A Title</article-title>"))
  }

  test("lexicon membership via broadcast join flag") {
    val toks = Seq((0L, "France"), (1L, "banana"), (2L, "GERMANY"))
      .toDF("id", "text")
    val lex = Seq("france", "germany").toDF("word")
    val flagged = Lexicon.membershipFlag(toks, lex)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("in_lexicon")).toMap
    assert(flagged == Map(0L -> "1", 1L -> "0", 2L -> "1"))
  }
}
