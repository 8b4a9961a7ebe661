package graft.pipeline

import org.apache.spark.sql.DataFrame

/** TEI training-data generation (reference per-model
  * `models/&lt;model&gt;/training_data.py` + `utils/xml_writer.py`):
  * the labeled token stream serialized into
  * GROBID-style training XML — the artifact a user regenerates to
  * retrain a model. Each label maps to an element path under the
  * model's root; the writer walks the stream opening/closing elements
  * as the label changes, emits `<lb/>` at line ends, starts a fresh
  * element on every `B-` prefix, and falls back to
  * `note[@type="<label>"]` for unmapped labels
  * (`training_data.py:117-118,216-313`).
  *
  * The reference builds an lxml tree; since `require_path_or_below`
  * only ever moves UP to the common prefix (`utils/xml_writer.py:
  * 139-142`) and appends always target the current element's end, the
  * serialization is forward-only — this port writes the string
  * directly, one pass per document, embarrassingly parallel over the
  * corpus.
  */
object TrainingData {

  /** training_data.py:33 */
  private val OtherLabels = Set("<other>", "O")

  /** models/header/training_data.py:19-52 (incl. the alias block). */
  val HeaderRoot: Seq[String] = Seq("text", "front")
  val HeaderPaths: Map[String, Seq[String]] = Map(
    "<title>" -> (HeaderRoot ++ Seq("docTitle", "titlePart")),
    "<author>" -> (HeaderRoot ++ Seq("byline", "docAuthor")),
    "<address>" -> (HeaderRoot :+ "address"),
    "<date>" -> (HeaderRoot :+ "date"),
    "<page>" -> (HeaderRoot :+ "page"),
    "<publisher>" -> (HeaderRoot :+ "publisher"),
    "<journal>" -> (HeaderRoot :+ "journal"),
    "<affiliation>" -> (HeaderRoot ++ Seq("byline", "affiliation")),
    "<note>" -> HeaderRoot,
    "<abstract>" -> (HeaderRoot :+ """div[@type="abstract"]"""),
    "<email>" -> (HeaderRoot :+ "email"),
    "<pubnum>" -> (HeaderRoot :+ "idno"),
    "<keyword>" -> (HeaderRoot :+ "keyword"),
    "<phone>" -> (HeaderRoot :+ "phone"),
    "<web>" -> (HeaderRoot :+ """ptr[@type="web"]"""),
    "<meeting>" -> (HeaderRoot :+ "meeting"),
    "<submission>" -> (HeaderRoot :+ """note[@type="submission"]"""),
    "<reference>" -> (HeaderRoot :+ "reference"),
    "<copyright>" -> (HeaderRoot :+ """note[@type="copyright"]"""),
    "<funding>" -> (HeaderRoot :+ """note[@type="funding"]"""),
    "<doctype>" -> (HeaderRoot :+ """note[@type="doctype"]"""),
    "<group>" -> (HeaderRoot :+ """note[@type="group"]"""),
    "<location>" -> (HeaderRoot :+ "address"),
    "<institution>" -> (HeaderRoot ++ Seq("byline", "affiliation")))

  /** models/citation/training_data.py:22-44. */
  val CitationRoot: Seq[String] = Seq("text", "back", "listBibl", "bibl")
  val CitationPaths: Map[String, Seq[String]] = Map(
    "<title>" -> (CitationRoot :+ """title[@level="a"]"""),
    "<author>" -> (CitationRoot :+ "author"),
    "<editor>" -> (CitationRoot :+ "editor"),
    "<institution>" -> (CitationRoot :+ "orgName"),
    "<collaboration>" -> (CitationRoot :+ """orgName[@type="collaboration"]"""),
    "<journal>" -> (CitationRoot :+ """title[@level="j"]"""),
    "<series>" -> (CitationRoot :+ """title[@level="s"]"""),
    "<booktitle>" -> (CitationRoot :+ """title[@level="m"]"""),
    "<date>" -> (CitationRoot :+ "date"),
    "<volume>" -> (CitationRoot :+ """biblScope[@unit="volume"]"""),
    "<issue>" -> (CitationRoot :+ """biblScope[@unit="issue"]"""),
    "<pages>" -> (CitationRoot :+ """biblScope[@unit="page"]"""),
    "<publisher>" -> (CitationRoot :+ "publisher"),
    "<location>" -> (CitationRoot :+ "pubPlace"),
    "<tech>" -> (CitationRoot :+ """note[@type="report"]"""),
    "<web>" -> (CitationRoot :+ """ptr[@type="web"]"""),
    "<pubnum>" -> (CitationRoot :+ "idno"),
    "<note>" -> (CitationRoot :+ "note"))

  /** models/name/training_data.py:26-39. */
  val NameRoot: Seq[String] = Seq("teiHeader", "fileDesc", "sourceDesc",
    "biblStruct", "analytic", "author", "persName")
  val NamePaths: Map[String, Seq[String]] = Map(
    "<marker>" -> (NameRoot :+ "marker"),
    "<title>" -> (NameRoot :+ "roleName"),
    "<forename>" -> (NameRoot :+ "forename"),
    "<middlename>" -> (NameRoot :+ "middlename"),
    "<surname>" -> (NameRoot :+ "surname"),
    "<suffix>" -> (NameRoot :+ "suffix"))

  /** models/affiliation_address/training_data.py:17-36. */
  val AffiliationRoot: Seq[String] = Seq("teiHeader", "fileDesc", "sourceDesc",
    "biblStruct", "analytic", "author", "affiliation")
  val AffiliationPaths: Map[String, Seq[String]] = Map(
    "<marker>" -> (AffiliationRoot :+ "marker"),
    "<institution>" -> (AffiliationRoot :+ """orgName[@type="institution"]"""),
    "<department>" -> (AffiliationRoot :+ """orgName[@type="department"]"""),
    "<laboratory>" -> (AffiliationRoot :+ """orgName[@type="laboratory"]"""),
    "<addrLine>" -> (AffiliationRoot ++ Seq("address", "addrLine")),
    "<postCode>" -> (AffiliationRoot ++ Seq("address", "postCode")),
    "<postBox>" -> (AffiliationRoot ++ Seq("address", "postBox")),
    "<region>" -> (AffiliationRoot ++ Seq("address", "region")),
    "<settlement>" -> (AffiliationRoot ++ Seq("address", "settlement")),
    "<country>" -> (AffiliationRoot ++ Seq("address", "country")))

  /** models/reference_segmenter/training_data.py:17-26 — a B-`<label>`
    * resets to the root so every labeled reference opens a fresh
    * `<bibl>`. */
  val ReferenceSegmenterRoot: Seq[String] = Seq("text", "listBibl")
  val ReferenceSegmenterPaths: Map[String, Seq[String]] = Map(
    "<reference>" -> (ReferenceSegmenterRoot :+ "bibl"),
    "<label>" -> (ReferenceSegmenterRoot ++ Seq("bibl", "label")))
  val ReferenceSegmenterResets: Map[String, Seq[String]] = Map(
    "<label>" -> ReferenceSegmenterRoot)

  /** models/segmentation/training_data.py:31-48 (line-level labels). */
  val SegmentationRoot: Seq[String] = Seq("text")
  val SegmentationPaths: Map[String, Seq[String]] = Map(
    "<other>" -> SegmentationRoot,
    "O" -> SegmentationRoot,
    "<header>" -> (SegmentationRoot :+ "front"),
    "<headnote>" -> (SegmentationRoot :+ """note[@place="headnote"]"""),
    "<footnote>" -> (SegmentationRoot :+ """note[@place="footnote"]"""),
    "<marginnote>" -> (SegmentationRoot :+ """note[@place="marginnote"]"""),
    "<page>" -> (SegmentationRoot :+ "page"),
    "<references>" -> (SegmentationRoot :+ "listBibl"),
    "<body>" -> (SegmentationRoot :+ "body"),
    "<cover>" -> (SegmentationRoot :+ "titlePage"),
    "<toc>" -> (SegmentationRoot :+ """div[@type="toc"]"""),
    "<annex>" -> (SegmentationRoot :+ """div[@type="annex"]"""),
    "<acknowledgement>" -> (SegmentationRoot :+ """div[@type="acknowledgement"]"""))

  /** models/fulltext/training_data.py:24-41. */
  val FulltextRoot: Seq[String] = Seq("text")
  val FulltextPaths: Map[String, Seq[String]] = Map(
    "<other>" -> (FulltextRoot :+ """note[@type="other"]"""),
    "<section>" -> (FulltextRoot :+ "head"),
    "<paragraph>" -> (FulltextRoot :+ "p"),
    "<citation_marker>" -> (FulltextRoot ++ Seq("p", """ref[@type="biblio"]""")),
    "<figure_marker>" -> (FulltextRoot ++ Seq("p", """ref[@type="figure"]""")),
    "<table_marker>" -> (FulltextRoot ++ Seq("p", """ref[@type="table"]""")),
    "<equation_marker>" -> (FulltextRoot ++ Seq("p", """ref[@type="formula"]""")),
    "<section_marker>" -> (FulltextRoot ++ Seq("p", """ref[@type="section"]""")),
    "<figure>" -> (FulltextRoot :+ "figure"),
    "<table>" -> (FulltextRoot :+ """figure[@type="table"]"""),
    "<equation>" -> (FulltextRoot :+ "formula"),
    "<equation_label>" -> (FulltextRoot ++ Seq("formula", "label")),
    "<item>" -> (FulltextRoot :+ "item"))

  // element spec "div[@type=\"abstract\"]" (utils/xml_writer.py:28-38)
  private val SpecRe = """^([^\[]+)(?:\[@?([^=]+)="(.+)"\])?$""".r

  private def esc(s: String): String =
    if (s == null) ""
    else s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def openTag(spec: String): String = spec match {
    case SpecRe(tag, null, _) => s"<$tag>"
    case SpecRe(tag, a, v) => s"""<$tag $a="$v">"""
    case _ => throw new IllegalArgumentException(s"invalid tag expression: $spec")
  }

  private def closeTag(spec: String): String = s"</${spec.takeWhile(_ != '[')}>"

  private def commonPath(a: Seq[String], b: Seq[String]): Seq[String] =
    a.zip(b).takeWhile { case (x, y) => x == y }.map(_._1)

  /** current is the same path as target or one of its ancestors. */
  private def isSameOrParent(current: Seq[String], target: Seq[String]): Boolean =
    current == target.take(current.size)

  private final class Writer(sb: java.lang.StringBuilder) {
    private var path = Vector.empty[String]
    def current: Seq[String] = path
    def requirePath(target: Seq[String]): Unit = {
      val common = commonPath(path, target)
      while (path.size > common.size) {
        sb.append(closeTag(path.last)); path = path.init
      }
      target.drop(common.size).foreach { s =>
        sb.append(openTag(s)); path = path :+ s
      }
    }
    def requirePathOrBelow(target: Seq[String]): Unit =
      requirePath(commonPath(path, target))
    def text(s: String): Unit = sb.append(esc(s))
    def lb(): Unit = sb.append("<lb/>")
  }

  private def splitPrefix(prefixed: String): (String, String) =
    if (prefixed == null || prefixed.isEmpty) ("", "")
    else if (prefixed.startsWith("B-")) ("B", prefixed.substring(2))
    else if (prefixed.startsWith("I-")) ("I", prefixed.substring(2))
    else ("", prefixed)

  /** One document: lines of (text, whitespace, prefixed label) →
    * training XML body (port of
    * `write_xml_for_model_data_with_instructions_iterable`,
    * training_data.py:254-313). */
  def trainingXmlBody(lines: Seq[Seq[(String, String, String)]],
      root: Seq[String], paths: Map[String, Seq[String]],
      resets: Map[String, Seq[String]] = Map.empty): String = {
    val entityPaths = paths.collect {
      case (l, p) if !OtherLabels(l) && p != root => p
    }.toSet
    // a mapped '<other>' (e.g. fulltext's note[@type="other"]) takes
    // precedence for other-labeled tokens (training_data.py:224-226)
    val otherPath = paths.get("<other>")
    def pathFor(label: String, cur: Seq[String]): Seq[String] =
      if (label.isEmpty || OtherLabels(label)) {
        if (label.nonEmpty && otherPath.isDefined) otherPath.get
        else if (entityPaths(cur)) cur.dropRight(1) else cur
      } else paths.getOrElse(label,
        root :+ s"""note[@type="${label.stripPrefix("<").stripSuffix(">")}"]""")
    val sb = new java.lang.StringBuilder
    val w = new Writer(sb)
    w.requirePath(root)
    var pendingWs = ""
    var prevLabel = ""
    lines.foreach { line =>
      line.foreach { case (text, ws, prefixedLabel) =>
        val (prefix, label) = splitPrefix(prefixedLabel)
        val p = pathFor(label, w.current)
        // reset path on B- (training_data.py:245-252): close all the
        // way out so the next entity opens a fresh container element
        val resetPath = if (prefix == "B") resets.get(label) else None
        if (resetPath.isDefined)
          w.requirePath(resetPath.get)
        else if (!OtherLabels(prevLabel) && pendingWs.nonEmpty &&
            !isSameOrParent(w.current, p))
          w.requirePath(w.current.dropRight(1))
        else if (prefix == "B" && !OtherLabels(label) && label.nonEmpty)
          w.requirePath(p.dropRight(1))
        w.requirePathOrBelow(p)
        w.text(pendingWs)
        w.requirePath(p)
        w.text(text)
        pendingWs = ws
        prevLabel = label
      }
      w.lb()
      pendingWs = "\n"
    }
    w.requirePath(root)
    w.text(pendingWs)
    w.requirePath(Seq.empty)
    sb.toString
  }

  /** Labeled token table → one training-TEI string per document.
    * `rootTag`/`xmlns` follow the per-model generators ("tei" without
    * namespace for header, "TEI" with the TEI namespace for citation —
    * header/training_data.py:14, citation/training_data.py:53-57).
    */
  def trainingXml(labeled: DataFrame, root: Seq[String],
      paths: Map[String, Seq[String]], rootTag: String,
      xmlns: Option[String],
      resets: Map[String, Seq[String]] = Map.empty): DataFrame = {
    val sparkSession = labeled.sparkSession
    import sparkSession.implicits._
    import org.apache.spark.sql.functions.col
    val nsAttr = xmlns.map(n => s""" xmlns="$n"""").getOrElse("")
    labeled.select(col("doc_id"), col("page_idx"), col("block_idx"),
        col("line_idx"), col("token_idx"), col("text"), col("whitespace"),
        col("label"))
      .as[(Long, Int, Int, Int, Int, String, String, String)]
      .groupByKey(_._1)
      .mapGroups { (docId, it) =>
        val rows = it.toSeq.sortBy(r => (r._2, r._3, r._4, r._5))
        val lines = rows.foldLeft(Vector.empty[Vector[(String, String, String)]] ->
            Option.empty[(Int, Int, Int)]) { case ((acc, prevKey), r) =>
          val key = (r._2, r._3, r._4)
          val tok = (r._6, r._7, r._8)
          if (prevKey.contains(key)) (acc.init :+ (acc.last :+ tok), Some(key))
          else (acc :+ Vector(tok), Some(key))
        }._1
        val body = trainingXmlBody(lines, root, paths, resets)
        (docId, s"<$rootTag$nsAttr>$body</$rootTag>")
      }
      .toDF("doc_id", "training_tei")
  }

  def headerTrainingXml(labeled: DataFrame): DataFrame =
    trainingXml(labeled, HeaderRoot, HeaderPaths, "tei", None)

  def citationTrainingXml(labeled: DataFrame): DataFrame =
    trainingXml(labeled, CitationRoot, CitationPaths, "TEI",
      Some("http://www.tei-c.org/ns/1.0"))

  def nameTrainingXml(labeled: DataFrame): DataFrame =
    trainingXml(labeled, NameRoot, NamePaths, "TEI",
      Some("http://www.tei-c.org/ns/1.0"))

  def affiliationTrainingXml(labeled: DataFrame): DataFrame =
    trainingXml(labeled, AffiliationRoot, AffiliationPaths, "TEI",
      Some("http://www.tei-c.org/ns/1.0"))

  def referenceSegmenterTrainingXml(labeled: DataFrame): DataFrame =
    trainingXml(labeled, ReferenceSegmenterRoot, ReferenceSegmenterPaths,
      "tei", None, ReferenceSegmenterResets)

  def segmentationTrainingXml(labeled: DataFrame): DataFrame =
    trainingXml(labeled, SegmentationRoot, SegmentationPaths, "tei", None)

  def fulltextTrainingXml(labeled: DataFrame): DataFrame =
    trainingXml(labeled, FulltextRoot, FulltextPaths, "tei", None)

  // ------------------------------------------------ DELFT data export

  /** IOB → GROBID tag translation
    * (`training/cli/generate_delft_data.py:76-89`
    * `translate_tags_IOB_to_grobid`): `O` → `<other>`, `B-x` → `I-x`,
    * `I-x` → bare `x` — the convention the wapiti/DELFT training
    * readers expect. */
  private def grobidTag(label: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val stripped = substring(label, 3, Int.MaxValue)
    when(label.isNull || label === "O", "<other>")
      .when(label.startsWith("B-"), concat(lit("I-"), stripped))
      .when(label.startsWith("I-"), stripped)
      .otherwise(label)
  }

  /** DELFT training data (the reference's SECOND training format,
    * `training/cli/generate_delft_data.py:172-228`): one line per
    * token — the model's CRF feature line with the translated GROBID
    * tag as the final field — one block per document (the writer
    * separates documents with a blank line,
    * `tag_formatter` DATA semantics).
    *
    * Input is a labeled data-line table (a model's `dataLines` output
    * with a `label` column, e.g. `RuleLabeler().label(
    * HeaderFeatures.dataLines(tokens))`) — the engine generates
    * features and labels in one lineage, where the reference re-parses
    * its training TEI back to labeled tokens. The `data_line` ends
    * with the generator's constant dummy-label field, which this
    * replaces. One aggregation per document; document-parallel.
    */
  def delftData(labeledDataLines: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    labeledDataLines
      .withColumn("_dl", concat(
        expr("substring(data_line, 1, length(data_line) - 1)"),
        grobidTag(col("label"))))
      .groupBy("doc_id")
      .agg(concat_ws("\n", transform(
        array_sort(collect_list(struct(
          col("page_idx"), col("block_idx"), col("line_idx"),
          col("token_idx"), col("_dl").as("l")))),
        t => t.getField("l"))).as("delft_data"))
  }
}
