package graft.sinks

import java.io.{StringReader, StringWriter}
import javax.xml.transform.{TransformerFactory, OutputKeys}
import javax.xml.transform.stream.{StreamResult, StreamSource}

import org.apache.spark.sql.DataFrame

/** TEI → JATS transformation (SURVEY.md A7; reference
  * `transformers/xslt.py:1-67` applies an XSLT stylesheet the same
  * way — the stylesheet here is graft's own minimal mapping for the
  * TEI subset graft emits, not a copy).
  *
  * The compiled `Templates` is created once per partition inside
  * `mapPartitions` (javax `Transformer`s are not thread-safe, and
  * compiling per row would dominate) — the executor-local-init pattern
  * used for every external-tool seam in this engine.
  */
object Jats {

  private val Stylesheet =
    """<?xml version="1.0"?>
      |<xsl:stylesheet version="1.0"
      |    xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
      |    xmlns:tei="http://www.tei-c.org/ns/1.0">
      |  <xsl:output method="xml" omit-xml-declaration="yes"/>
      |  <!-- tei-to-jats.xsl:12-13 — styled runs unwrap by default,
      |       opt-in <b>/<i> via parameters -->
      |  <xsl:param name="output_bold" select="'false'"/>
      |  <xsl:param name="output_italic" select="'false'"/>
      |  <xsl:template match="/tei:TEI">
      |    <article>
      |      <front>
      |        <article-meta>
      |          <title-group>
      |            <article-title>
      |              <xsl:value-of select="tei:teiHeader/tei:fileDesc/tei:titleStmt/tei:title"/>
      |            </article-title>
      |          </title-group>
      |          <contrib-group>
      |            <!-- header authors ONLY: an unscoped .//tei:author would
      |                 also sweep up the back-matter bibliography persons -->
      |            <xsl:for-each select="tei:teiHeader//tei:author">
      |              <contrib contrib-type="author">
      |                <name>
      |                  <surname><xsl:value-of select="tei:persName/tei:surname"/></surname>
      |                  <given-names>
      |                    <xsl:value-of select="tei:persName/tei:forename[@type='first']"/>
      |                  </given-names>
      |                </name>
      |              </contrib>
      |            </xsl:for-each>
      |          </contrib-group>
      |          <xsl:if test=".//tei:abstract">
      |            <abstract><p><xsl:value-of select=".//tei:abstract/tei:p"/></p></abstract>
      |          </xsl:if>
      |        </article-meta>
      |      </front>
      |      <body>
      |        <xsl:apply-templates select="tei:text/tei:body/tei:div"/>
      |        <xsl:if test="tei:text/tei:body/tei:figure">
      |          <sec id="figures">
      |            <title>Figures</title>
      |            <xsl:apply-templates select="tei:text/tei:body/tei:figure"/>
      |          </sec>
      |        </xsl:if>
      |      </body>
      |      <back>
      |        <!-- acknowledgement -> <ack>, annex divs -> plain secs
      |             (tei-to-jats.xsl:209-240 default targets) -->
      |        <xsl:if test="tei:text/tei:back/tei:div[@type='acknowledgement']">
      |          <ack>
      |            <xsl:apply-templates
      |              select="tei:text/tei:back/tei:div[@type='acknowledgement']"/>
      |          </ack>
      |        </xsl:if>
      |        <xsl:for-each select="tei:text/tei:back/tei:div[@type='annex']">
      |          <xsl:apply-templates select="tei:div"/>
      |          <xsl:if test="tei:figure">
      |            <sec id="annex_figures">
      |              <title>Annex Figures</title>
      |              <xsl:apply-templates select="tei:figure"/>
      |            </sec>
      |          </xsl:if>
      |        </xsl:for-each>
      |        <xsl:if test="tei:text/tei:back//tei:listBibl">
      |          <ref-list>
      |            <xsl:for-each select="tei:text/tei:back//tei:listBibl/tei:biblStruct">
      |              <ref>
      |                <xsl:attribute name="id"><xsl:value-of select="@xml:id"/></xsl:attribute>
      |                <element-citation>
      |                  <xsl:if test="tei:analytic/tei:author">
      |                    <person-group person-group-type="author">
      |                      <xsl:for-each select="tei:analytic/tei:author">
      |                        <name>
      |                          <surname><xsl:value-of select="tei:persName/tei:surname"/></surname>
      |                          <given-names>
      |                            <xsl:value-of select="tei:persName/tei:forename[@type='first']"/>
      |                          </given-names>
      |                        </name>
      |                      </xsl:for-each>
      |                    </person-group>
      |                  </xsl:if>
      |                  <article-title><xsl:value-of select="tei:analytic/tei:title"/></article-title>
      |                  <xsl:for-each select="tei:monogr/tei:title[@level='j']">
      |                    <source><xsl:value-of select="."/></source>
      |                  </xsl:for-each>
      |                  <xsl:for-each select="tei:monogr/tei:imprint/tei:date[@type='published']">
      |                    <year><xsl:value-of select="@when"/></year>
      |                  </xsl:for-each>
      |                  <xsl:for-each select="tei:monogr/tei:imprint/tei:biblScope[@unit='volume']">
      |                    <volume><xsl:value-of select="."/></volume>
      |                  </xsl:for-each>
      |                  <xsl:for-each select="tei:monogr/tei:imprint/tei:biblScope[@unit='page']">
      |                    <fpage><xsl:value-of select="@from"/></fpage>
      |                    <lpage><xsl:value-of select="@to"/></lpage>
      |                  </xsl:for-each>
      |                </element-citation>
      |              </ref>
      |            </xsl:for-each>
      |          </ref-list>
      |        </xsl:if>
      |      </back>
      |    </article>
      |  </xsl:template>
      |  <!-- body structure (tei-to-jats.xsl:202-207,387-399): div -> sec,
      |       head -> title, p -> p with inline xrefs -->
      |  <xsl:template match="tei:div">
      |    <sec>
      |      <xsl:apply-templates select="tei:head"/>
      |      <xsl:apply-templates select="tei:p"/>
      |      <xsl:apply-templates select="tei:figure"/>
      |    </sec>
      |  </xsl:template>
      |  <xsl:template match="tei:head">
      |    <title><xsl:apply-templates select="node()"/></title>
      |  </xsl:template>
      |  <xsl:template match="tei:p">
      |    <p><xsl:apply-templates select="node()"/></p>
      |  </xsl:template>
      |  <!-- citation markers -> typed xrefs (tei-to-jats.xsl:355-385) -->
      |  <xsl:template match="tei:ref[@target]">
      |    <xref>
      |      <xsl:attribute name="ref-type">
      |        <xsl:choose>
      |          <xsl:when test="@type='figure'">fig</xsl:when>
      |          <xsl:otherwise><xsl:value-of select="@type"/></xsl:otherwise>
      |        </xsl:choose>
      |      </xsl:attribute>
      |      <xsl:attribute name="rid">
      |        <xsl:value-of select="substring-after(@target, '#')"/>
      |      </xsl:attribute>
      |      <xsl:value-of select="."/>
      |    </xref>
      |  </xsl:template>
      |  <!-- figures / tables (tei-to-jats.xsl:160-200) -->
      |  <xsl:template match="tei:figure[not(@type='table')]">
      |    <fig>
      |      <xsl:attribute name="id"><xsl:value-of select="@xml:id"/></xsl:attribute>
      |      <object-id><xsl:value-of select="@xml:id"/></object-id>
      |      <label><xsl:value-of select="tei:head"/></label>
      |      <caption>
      |        <xsl:apply-templates select="tei:head"/>
      |        <p><xsl:value-of select="tei:figDesc"/></p>
      |      </caption>
      |    </fig>
      |  </xsl:template>
      |  <xsl:template match="tei:figure[@type='table']">
      |    <table-wrap>
      |      <xsl:attribute name="id"><xsl:value-of select="@xml:id"/></xsl:attribute>
      |      <label><xsl:value-of select="tei:head"/></label>
      |      <caption>
      |        <xsl:apply-templates select="tei:head"/>
      |        <p><xsl:value-of select="tei:figDesc"/></p>
      |      </caption>
      |      <table><tbody><tr><td><xsl:apply-templates
      |        select="node()[not(self::tei:head|self::tei:label|self::tei:figDesc)]"/></td></tr></tbody></table>
      |    </table-wrap>
      |  </xsl:template>
      |  <!-- tei-to-jats.xsl:401-422 -->
      |  <xsl:template match="tei:hi[@rend='italic']">
      |    <xsl:choose>
      |      <xsl:when test="$output_italic = 'true'">
      |        <i><xsl:apply-templates select="node()"/></i>
      |      </xsl:when>
      |      <xsl:otherwise><xsl:apply-templates select="node()"/></xsl:otherwise>
      |    </xsl:choose>
      |  </xsl:template>
      |  <xsl:template match="tei:hi[@rend='bold']">
      |    <xsl:choose>
      |      <xsl:when test="$output_bold = 'true'">
      |        <b><xsl:apply-templates select="node()"/></b>
      |      </xsl:when>
      |      <xsl:otherwise><xsl:apply-templates select="node()"/></xsl:otherwise>
      |    </xsl:choose>
      |  </xsl:template>
      |</xsl:stylesheet>""".stripMargin

  def transform(tei: String,
      params: Map[String, String] = Map.empty): String = {
    val factory = TransformerFactory.newInstance()
    val t = factory.newTemplates(new StreamSource(new StringReader(Stylesheet)))
      .newTransformer()
    t.setOutputProperty(OutputKeys.OMIT_XML_DECLARATION, "yes")
    params.foreach { case (k, v) => t.setParameter(k, v) }
    val out = new StringWriter()
    t.transform(new StreamSource(new StringReader(tei)), new StreamResult(out))
    out.toString
  }

  /** (doc_id, tei) → (doc_id, jats); stylesheet compiled once per
    * partition. */
  def serialize(teiDf: DataFrame): DataFrame = {
    val sparkSession = teiDf.sparkSession
    import sparkSession.implicits._
    teiDf.select("doc_id", "tei").as[(Long, String)]
      .mapPartitions { it =>
        val templates = TransformerFactory.newInstance()
          .newTemplates(new StreamSource(new StringReader(Stylesheet)))
        // one Transformer per partition: not thread-safe, but a
        // partition iterator is single-threaded and sequential reuse is
        // part of the javax.xml.transform contract — per-row
        // newTransformer() was measurable at 5k docs/partition scale
        val t = templates.newTransformer()
        t.setOutputProperty(OutputKeys.OMIT_XML_DECLARATION, "yes")
        it.map { case (id, tei) =>
          val out = new StringWriter()
          t.transform(new StreamSource(new StringReader(tei)), new StreamResult(out))
          (id, out.toString)
        }
      }
      .toDF("doc_id", "jats")
  }
}
