package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** TEI XML serialization (SURVEY.md A6; reference
  * `document/tei_document.py:47-165` + the `document/tei` package).
  *
  * One TEI string per document, produced by a per-doc fold over the
  * collected semantic-node rows (nodes per doc are small — the heavy
  * token work happened upstream). Output is `(doc_id, tei)` ready for
  * `df.write.text`/partitioned file sinks; JATS (A7) chains an XSLT
  * transform (javax) on the same column.
  */
object Tei {

  private def esc(s: String): String =
    if (s == null) ""
    else s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Minimal author split (name-model-lite): first token → forename,
    * rest → surname. The full name-model fold
    * (models/name/extract.py:126-193) replaces this per-model.
    */
  private def authorXml(raw: String): String = {
    val toks = raw.trim.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) ""
    else if (toks.length == 1)
      s"<author><persName><surname>${esc(toks(0))}</surname></persName></author>"
    else {
      val forename = toks.head
      val surname = toks.tail.mkString(" ")
      "<author><persName>" +
        s"""<forename type="first">${esc(forename)}</forename>""" +
        s"<surname>${esc(surname)}</surname></persName></author>"
    }
  }

  /** Build one TEI document from semantic nodes (fields: node_type,
    * text), FIXTURES.md §5 structure. */
  def buildTei(nodes: Seq[(String, String)]): String = {
    val title = nodes.collectFirst { case ("title", t) => t }
    val abstractText = nodes.collectFirst { case ("abstract", t) => t }
    val authors = nodes.collect { case ("raw_authors", t) => t }
    val sb = new StringBuilder
    sb ++= """<TEI xmlns="http://www.tei-c.org/ns/1.0">"""
    sb ++= "<teiHeader><fileDesc>"
    sb ++= "<titleStmt>"
    title.foreach(t => sb ++= s"""<title level="a" type="main">${esc(t)}</title>""")
    sb ++= "</titleStmt>"
    sb ++= "<sourceDesc><biblStruct><analytic>"
    authors.foreach(a => sb ++= authorXml(a))
    sb ++= "</analytic></biblStruct></sourceDesc>"
    sb ++= "</fileDesc>"
    abstractText.filter(_.nonEmpty).foreach { t =>
      sb ++= s"<profileDesc><abstract><p>${esc(t)}</p></abstract></profileDesc>"
    }
    sb ++= "</teiHeader>"
    sb ++= "<text><body/><back/></text>"
    sb ++= "</TEI>"
    sb.toString
  }

  /** Semantic-node DataFrame → (doc_id, tei) strings. */
  def serialize(nodes: DataFrame): DataFrame = {
    val sparkSession = nodes.sparkSession
    import sparkSession.implicits._
    nodes.select(col("doc_id"), col("node_id"), col("node_type"), col("text"))
      .as[(Long, Long, String, String)]
      .groupByKey(_._1)
      .mapGroups { (docId, it) =>
        val ordered = it.toSeq.sortBy(_._2).map(r => (r._3, r._4))
        (docId, buildTei(ordered))
      }
      .toDF("doc_id", "tei")
  }
}
