package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lexicon loading (SURVEY.md A4; reference `lookup/loader.py` loads
  * country/first-name/last-name word lists and probes membership per
  * token, feature C14).
  *
  * Two scale regimes:
  * - small lexica (countries): literal `isin` — folded into codegen,
  *   zero distribution cost (`Features.lexiconFlag`);
  * - large lexica (name lists, millions of rows): a broadcast left-semi
  *   join flag — the lexicon ships once per executor, the token table
  *   never shuffles.
  */
object Lexicon {

  /** Load a one-word-per-line text file (blank lines and `#` comments
    * skipped, lowercased) — the reference's word-list format. */
  def fromTextFile(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(lower(trim(col("value"))).as("word"))
      .filter(col("word") =!= "" && !col("word").startsWith("#"))
      .distinct()

  /** Load a GROBID-style TEI-XML lexicon (lookup/xml_lookup.py:22-31:
    * every `<cell>` text content anywhere in the document becomes an
    * entry, lowercased — the country-table format where a row holds
    * a2code/a3code/name cells). Reads whole files so the XML parses
    * intact; multi-file lexicon directories distribute per file. */
  def fromTeiXmlFile(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path).as[String]
      .flatMap { xml =>
        val words = scala.collection.mutable.ListBuffer.empty[String]
        val f = javax.xml.stream.XMLInputFactory.newInstance()
        f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
        f.setProperty("javax.xml.stream.isSupportingExternalEntities", false)
        val r = f.createXMLStreamReader(new java.io.StringReader(xml))
        // a stack of builders: nested cells each collect their own
        // subtree text, like lxml's per-node text content over the
        // //tei:cell node set (outer AND inner both become entries)
        val open = scala.collection.mutable.Stack.empty[StringBuilder]
        import javax.xml.stream.XMLStreamConstants._
        while (r.hasNext) {
          r.next() match {
            case START_ELEMENT if r.getLocalName == "cell" =>
              open.push(new StringBuilder)
            case CHARACTERS | CDATA if open.nonEmpty =>
              open.foreach(_ ++= r.getText)
            case END_ELEMENT if r.getLocalName == "cell" && open.nonEmpty =>
              val w = open.pop().toString.trim.toLowerCase
              if (w.nonEmpty) words += w
            case _ => ()
          }
        }
        r.close()
        words.toList
      }
      .toDF("word").distinct()
  }

  /** MergedTextLookUp analog (lookup/__init__.py:19-31): membership in
    * any of the given lexica. */
  def merged(lexica: Seq[DataFrame]): DataFrame =
    lexica.reduceLeft(_ unionByName _).distinct()

  /** Add a '1'/'0' membership flag column via broadcast semi-join
    * (left join + presence flag keeps all token rows). */
  def membershipFlag(tokens: DataFrame, lexicon: DataFrame,
      tokenCol: String = "text", flagCol: String = "in_lexicon"): DataFrame =
    tokens
      .join(broadcast(lexicon.withColumn("_present", lit(1))),
        lower(col(tokenCol)) === col("word"), "left")
      .withColumn(flagCol, when(col("_present").isNotNull, "1").otherwise("0"))
      .drop("word", "_present")
}
