package graft

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets

import javax.xml.parsers.DocumentBuilderFactory

import graft.queries.PipelineOps
import graft.sinks.{Jats, Tei}
import graft.sources.AltoReader

/** Every rendered TEI and JATS document must be WELL-FORMED XML — the
  * sinks build strings, so escaping/nesting bugs (raw `&`/`<` in
  * content, unbalanced styled-run wrappers, attribute quoting) only
  * surface when the output is actually parsed. The reference emits
  * through lxml and cannot produce malformed output by construction
  * (`document/tei/common.py` TEI_E); this suite holds the string
  * sinks to the same bar, over the sf0.001 corpus and over
  * adversarial token text.
  */
class XmlValiditySpec extends SparkSuite {
  import spark.implicits._

  private def parseXml(xml: String): Either[String, org.w3c.dom.Document] = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    // the builders print to stderr by default; fail loud instead
    val b = f.newDocumentBuilder()
    b.setErrorHandler(new org.xml.sax.helpers.DefaultHandler())
    try Right(b.parse(new ByteArrayInputStream(
      xml.getBytes(StandardCharsets.UTF_8))))
    catch { case e: Exception => Left(s"${e.getMessage}\n$xml") }
  }

  private def assertAllParse(rows: Array[(Long, String)], label: String): Unit = {
    val bad = rows.flatMap { case (id, xml) =>
      parseXml(xml).left.toOption.map(m => s"$label doc $id: $m")
    }
    assert(bad.isEmpty, bad.take(2).mkString("\n---\n"))
    assert(rows.nonEmpty, s"$label produced no documents")
  }

  test("TEI and JATS are well-formed over the sf0.001 corpus") {
    val tei = PipelineOps.queries("p04_header_tei")(spark, sf("0.001"))
      .as[(Long, String)].collect()
    assertAllParse(tei, "TEI")
    val jats = PipelineOps.queries("p06_jats")(spark, sf("0.001"))
      .as[(Long, String)].collect()
    assertAllParse(jats, "JATS")
  }

  test("training TEI is well-formed over the sf0.001 corpus") {
    import org.apache.spark.sql.functions.col
    val docs = Tables(spark, sf("0.001")).documents
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => (id, PipelineOps.altoOf(id, t)) }
    val labeled = new graft.pipeline.RuleLabeler()
      .label(AltoReader.tokens(docs).toDF())
    val xml = graft.pipeline.TrainingData.headerTrainingXml(labeled)
      .select(col("doc_id"), col("training_tei"))
      .as[(Long, String)].collect()
    assertAllParse(xml, "training-TEI")
  }

  test("permissive ALTO parse: random truncations never throw; every " +
      "input lands in tokens or quarantine") {
    // a StAX walk over byte-truncated XML must fail CLEANLY per
    // document (quarantined), not hang or poison the partition
    val base = PipelineOps.altoOf(0L, "plain words fill the body line " +
      "so every view has content here and more beyond")
    val rnd = new scala.util.Random(7)
    val docs = (1 to 24).map { i =>
      val cut = 1 + rnd.nextInt(base.length - 1)
      (i.toLong, base.take(cut))
    } :+ (0L, base)
    val ds = docs.toDS()
    val okIds = AltoReader.tokensPermissive(ds).collect().map(_.doc_id).toSet
    val badIds = AltoReader.quarantine(ds).collect().map(_.getLong(0)).toSet
    assert(okIds(0L))
    // no doc is silently lost: parsed and quarantined cover all inputs
    // (a truncation can still be well-formed up to the cut, so the two
    // sets may overlap only for docs whose prefix parses)
    assert((okIds ++ badIds) == docs.map(_._1).toSet,
      s"lost: ${docs.map(_._1).toSet -- okIds -- badIds}")
  }

  test("TEI and JATS survive XML-special and non-ASCII token text") {
    // tokens exercising every escaping path: bare specials, entity
    // look-alikes, CDATA terminator, quotes, accents, CJK, and a
    // token that is ONLY specials
    val nasty = Seq(
      "a&b", "<tag>", "x\"y", "it's", "]]>", "&amp;", "café",
      "漢字", "<&>", "A&B<C>D")
    val text = (nasty ++ Seq("plain", "words", "fill", "the", "body",
      "line", "so", "every", "view", "has", "content")).mkString(" ")
    val alto = Seq((0L, PipelineOps.altoOf(0L, text))).toDS()
    val tokens = AltoReader.tokens(alto).toDF()
    val tei = graft.pipeline.Processor.documentTei(tokens)
      .as[(Long, String)].collect()
    assertAllParse(tei, "TEI-adversarial")
    // the special characters round-trip as text content
    val doc = parseXml(tei.head._2).toOption.get
    val all = doc.getDocumentElement.getTextContent
    assert(all.contains("a&b"), all)
    assert(all.contains("<tag>"), all)
    assert(all.contains("café"), all)
    val jats = Jats.serialize(tei.toSeq.toDF("doc_id", "tei"))
      .as[(Long, String)].collect()
    assertAllParse(jats, "JATS-adversarial")
  }
}
