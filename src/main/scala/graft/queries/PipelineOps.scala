package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.{BioSpans, Extractors, Features, RuleLabeler}
import graft.sinks.Tei
import graft.sources.AltoReader

/** Document-pipeline operators as declared queries (SURVEY.md §2.A /
  * §3's Spark lifecycle): ALTO → token table → features → labels →
  * BIO spans → semantic fold → TEI.
  *
  * The driver's corpus has no ALTO files, so a deterministic ALTO
  * document is synthesized per `documents` row (title block = first
  * tokens at a larger font; body block = the rest), which lets the
  * full pipeline run — and be benchmarked — at every scale factor.
  * Rows-only checks (no SQL equivalent by construction); value-level
  * pipeline correctness is covered by the ScalaTest golden/fixture
  * suites.
  */
object PipelineOps {
  type Q = (SparkSession, String) => DataFrame

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Deterministic per-row ALTO synthesis (one page: title block,
    * author block, body block — the segmentation labeler's header
    * region is the first two blocks). */
  private[queries] def altoOf(docId: Long, text: String): String = {
    val toks = text.split(" ").filter(_.nonEmpty)
    val (titleToks, rest) = toks.splitAt(math.min(3, toks.length))
    val (authorToks, bodyToks) = rest.splitAt(math.min(2, rest.length))
    def line(ts: Seq[String], y: Int, font: String): String =
      if (ts.isEmpty) ""
      else {
        val strings = ts.zipWithIndex.map { case (t, i) =>
          s"""<String CONTENT="${xmlEscape(t)}" HPOS="${50 + i * 40}" VPOS="$y" WIDTH="36" HEIGHT="12" STYLEREFS="$font"/>"""
        }.mkString
        s"<TextBlock><TextLine>$strings</TextLine></TextBlock>"
      }
    // body split into lines of 12 tokens inside one block
    val bodyLines = bodyToks.grouped(12).zipWithIndex.map { case (ts, li) =>
      val strings = ts.zipWithIndex.map { case (t, i) =>
        s"""<String CONTENT="${xmlEscape(t)}" HPOS="${50 + i * 40}" VPOS="${120 + li * 14}" WIDTH="36" HEIGHT="10" STYLEREFS="font1"/>"""
      }.mkString
      s"<TextLine>$strings</TextLine>"
    }.mkString
    s"""<alto xmlns="http://www.loc.gov/standards/alto/ns-v3#">
       |<Styles>
       |<TextStyle ID="font0" FONTFAMILY="Times" FONTSIZE="18.0" FONTSTYLE="bold"/>
       |<TextStyle ID="font1" FONTFAMILY="Times" FONTSIZE="9.5" FONTSTYLE=""/>
       |</Styles>
       |<Layout><Page PHYSICAL_IMG_NR="1" WIDTH="612" HEIGHT="792"><PrintSpace>
       |${line(titleToks.toIndexedSeq, 60, "font0")}
       |${line(authorToks.toIndexedSeq, 90, "font1")}
       |<TextBlock>$bodyLines</TextBlock>
       |</PrintSpace></Page></Layout></alto>""".stripMargin
  }

  private def altoCorpus(s: SparkSession, d: String): Dataset[(Long, String)] = {
    import s.implicits._
    Tables(s, d).documents.select(col("doc_id"), col("text"))
      .as[(Long, String)].map { case (id, t) => (id, altoOf(id, t)) }
  }

  private def tokenTable(s: SparkSession, d: String): DataFrame =
    AltoReader.tokens(altoCorpus(s, d)).toDF()

  /** P01 ALTO scan + parse + retokenize → token counts per doc. */
  def p01(s: SparkSession, d: String): DataFrame =
    tokenTable(s, d).groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("block_idx")).as("n_blocks"))
      .orderBy("doc_id")

  /** P02 CRF feature generation: exact 32-feature header-model token
    * vectors (doc-partitioned windows). */
  def p02(s: SparkSession, d: String): DataFrame =
    graft.pipeline.HeaderFeatures.dataLines(tokenTable(s, d))
      .filter(col("doc_id") <= 5)
      .select(col("doc_id"), col("page_idx"), col("block_idx"),
        col("line_idx"), col("token_idx"), col("data_line"))
      .orderBy("doc_id", "page_idx", "block_idx", "line_idx", "token_idx")

  /** P03 label → BIO span table (rule labeler, D4 span grouping). */
  def p03(s: SparkSession, d: String): DataFrame =
    BioSpans.spans(new RuleLabeler().label(tokenTable(s, d)))
      .orderBy("doc_id", "span_id")

  /** P04 full slice: segmentation → header view (header fold +
    * name/affiliation passes) + body view (fulltext fold) → TEI with
    * body sections (the reference's complete processor DAG). */
  def p04(s: SparkSession, d: String): DataFrame =
    Tei.serialize(
      graft.pipeline.Processor.documentPipeline(tokenTable(s, d)).toDF())
      .orderBy("doc_id")

  /** P05 multimodal: binary media column → batched stub decode →
    * typed features (rows-only; decode is a deterministic fake, the
    * Spark plumbing is the artifact under test). */
  def p05(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.imageFeatures(
        Multimodal.mediaFromDocuments(Tables(s, d).documents))
      .toDF()
      .select(col("doc_id"), col("width"), col("height"), col("channels"),
        col("n_bytes"))
      .orderBy("doc_id")
  }

  /** P06 JATS: TEI strings → JATS via XSLT (A7). */
  def p06(s: SparkSession, d: String): DataFrame =
    graft.sinks.Jats.serialize(p04(s, d)).orderBy("doc_id")

  /** P07 segmentation data lines: the exact 34-feature per-line CRF
    * input vector (C6/C15/C16/C17). */
  def p07(s: SparkSession, d: String): DataFrame =
    graft.pipeline.SegmentationFeatures.dataLines(tokenTable(s, d))
      .filter(col("doc_id") <= 20)
      .orderBy("doc_id", "page_idx", "block_idx", "line_idx")

  /** P08 references pipeline: reference-segmenter fold (E6) chained
    * into the citation model fold (E3) per raw reference — the
    * processor's reference-list path (`processor.py:529-622`) — over a
    * synthesized references section per document. Outputs per-doc
    * reference statistics (rows-only).
    */
  def p08(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.pipeline.{Extractors, ModelExtractors, SemanticNode}
    val nodes = Tables(s, d).documents.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty)
        // synthetic references section: label + reference line per 6 tokens
        val spans = toks.grouped(6).zipWithIndex.flatMap { case (ts, i) =>
          Seq(Extractors.Span(2L * i, "<label>", s"${i + 1}."),
            Extractors.Span(2L * i + 1, "<reference>", ts.mkString(" ") + " (2020)"))
        }.toSeq
        val segNodes = ModelExtractors.referenceSegmenterFold(id, spans)
        var nextId = segNodes.map(_.node_id).maxOption.getOrElse(-1L) + 1
        val textByParent = segNodes.filter(_.node_type == "raw_reference_text")
          .groupBy(_.parent_id)
        val citNodes = segNodes.filter(_.node_type == "raw_reference").flatMap { r =>
          textByParent.getOrElse(r.node_id, Nil).flatMap { t =>
            val ts = t.text.split(" ")
            val citSpans = Seq(
              Extractors.Span(0L, "<author>", ts.take(2).mkString(" ")),
              Extractors.Span(1L, "<title>", ts.slice(2, ts.length - 1).mkString(" ")),
              Extractors.Span(2L, "<date>", ts.last))
            val folded = ModelExtractors.citationFold(id, citSpans, r.content_id)
            val offset = nextId
            nextId += folded.size
            folded.map(n => n.copy(
              node_id = n.node_id + offset,
              parent_id = if (n.parent_id < 0) -1L else n.parent_id + offset))
          }
        }
        segNodes ++ citNodes
      }
    nodes.toDF()
      .groupBy("doc_id")
      .agg(
        sum(when(col("node_type") === "raw_reference", 1).otherwise(0)).as("n_raw_refs"),
        sum(when(col("node_type") === "reference", 1).otherwise(0)).as("n_parsed_refs"),
        sum(when(col("node_type") === "invalid_reference", 1).otherwise(0)).as("n_invalid"),
        sum(when(col("node_type") === "date", 1).otherwise(0)).as("n_dates"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "p01_alto_tokens" -> p01,
    "p02_features" -> p02,
    "p03_bio_spans" -> p03,
    "p04_header_tei" -> p04,
    "p05_multimodal" -> p05,
    "p06_jats" -> p06,
    "p07_segmentation_lines" -> p07,
    "p08_references" -> p08,
  )
}
