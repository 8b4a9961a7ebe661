package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.pipeline.Extractors.Span

/** FullTextProcessor analog (SURVEY.md §3.1 step 4; reference
  * `processors/fulltext/processor.py:180-274`): the fixed DAG of model
  * passes gated by config flags (J2 operator pruning — disabled stages
  * are simply never added to the plan, so Catalyst never reads their
  * inputs).
  *
  * Second-stage models (name, affiliation) run on the *text* of raw
  * nodes produced by the header fold — at scale each stage is one
  * `groupByKey(doc_id)` fold over a small node set, all document-
  * parallel. Without trained models, deterministic rule stand-ins
  * produce the tagged span streams the folds expect (the
  * `model_mocks.py` pattern); a Wapiti/ONNX labeler slots into the same
  * seams.
  */
object Processor {

  final case class Config(
      extractAuthors: Boolean = true,
      extractAffiliations: Boolean = true,
      // reference defaults: citation authors on, editors off
      // (processors/fulltext/config.py:39-40)
      extractCitationAuthors: Boolean = true,
      extractCitationEditors: Boolean = false,
      // graphic asset extraction: graphic ids double as A8 zip entry
      // names and TEI <graphic url=...> (graphic.py:37-39; reference
      // default off, processors/fulltext/config.py extract_graphic_assets)
      extractGraphicAssets: Boolean = false)

  /** Rule stand-in for the name model: alternate forename/surname over
    * word tokens, skipping "and"/comma delimiters, digits as markers —
    * produces exactly the tag stream `ModelExtractors.nameFold`
    * consumes (authors then split on the second forename).
    */
  private[pipeline] def nameSpansOf(text: String): Seq[Span] = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    val out = scala.collection.mutable.ListBuffer.empty[Span]
    var i = 0L
    var expectForename = true
    toks.foreach { t =>
      val bare = t.replaceAll("[,;]", "")
      if (bare.equalsIgnoreCase("and") || bare.isEmpty) {
        // delimiter — no span
      } else if (bare.forall(_.isDigit)) {
        out += Span(i, "<marker>", bare); i += 1
      } else {
        val tag = if (expectForename) "<forename>" else "<surname>"
        // keep the trailing comma visible to the marker-after-comma rule
        out += Span(i, tag, t); i += 1
        expectForename = !expectForename
      }
    }
    out.toList
  }

  /** Rule stand-in for the citation model over one raw reference's
    * text: first two tokens → `<author>`, a trailing 4-digit-year token
    * → `<date>`, everything between → `<title>` — exactly the tag
    * stream [[ModelExtractors.citationFold]] consumes.
    */
  private[pipeline] def citationSpansOf(text: String): Seq[Span] = {
    val toks = text.split("\\s+").filter(_.nonEmpty).toIndexedSeq
    if (toks.isEmpty) return Nil
    val (authors, rest0) = toks.splitAt(math.min(2, toks.length))
    val (rest, date) =
      if (rest0.nonEmpty && rest0.last.replaceAll("[^0-9]", "").matches("[0-9]{4}"))
        (rest0.dropRight(1), Some(rest0.last))
      else (rest0, None)
    val out = scala.collection.mutable.ListBuffer.empty[Span]
    var i = 0L
    if (authors.nonEmpty) { out += Span(i, "<author>", authors.mkString(" ")); i += 1 }
    if (rest.nonEmpty) { out += Span(i, "<title>", rest.mkString(" ")); i += 1 }
    date.foreach { d => out += Span(i, "<date>", d); i += 1 }
    out.toList
  }

  /** Citation model pass over reference-segmenter output (reference
    * `processors/fulltext/processor.py:529-622`
    * `_extract_semantic_content_from_raw_references`): each
    * `raw_reference`'s `raw_reference_text` child is parsed by the
    * citation model and the typed reference — sharing the raw
    * reference's `b<n>` content id, so citation markers resolve to
    * either — appended to the node list. Pure per-document function.
    */
  private[pipeline] def citationPass(docId: Long,
      segNodes: Seq[SemanticNode]): Seq[SemanticNode] = {
    var nextId = segNodes.map(_.node_id).maxOption.getOrElse(-1L) + 1
    val textByParent = segNodes.filter(_.node_type == "raw_reference_text")
      .groupBy(_.parent_id)
    val citNodes = segNodes.filter(_.node_type == "raw_reference").flatMap { r =>
      textByParent.getOrElse(r.node_id, Nil).flatMap { t =>
        val folded = ModelExtractors.citationFold(docId,
          citationSpansOf(t.text), r.content_id)
        val offset = nextId
        nextId += folded.size
        folded.map(n => n.copy(node_id = n.node_id + offset,
          parent_id = if (n.parent_id < 0) -1L else n.parent_id + offset))
      }
    }
    segNodes ++ citNodes
  }

  /** Rule stand-in for the affiliation model: raw affiliation text →
    * `<institution>`, raw address text → `<addrLine>`. */
  private[pipeline] def affiliationSpansOf(
      children: Seq[(String, String)]): Seq[Span] =
    children.zipWithIndex.map {
      case (("raw_affiliation", text), i) => Span(i.toLong, "<institution>", text)
      case (("raw_address", text), i) => Span(i.toLong, "<addrLine>", text)
      case ((_, text), i) => Span(i.toLong, "O", text)
    }

  /** Rule stand-in for the figure/table model
    * (`models/figure/extract.py:24-44` label set): leading
    * `Figure|Fig.|Table` + number tokens → `<label>`, a `:`/`.`/`-`
    * delimiter is dropped, the remainder → `<figDesc>`.
    */
  private[pipeline] def figureSpansOf(text: String): Seq[Span] = {
    val toks = text.split("\\s+").filter(_.nonEmpty).toIndexedSeq
    var i = 0
    if (i < toks.length && toks(i).matches("(?i)(figure|fig\\.?|table)")) i += 1
    if (i < toks.length && toks(i).matches("[0-9]+[.,:)]?")) i += 1
    val label = toks.take(i).mkString(" ")
    val rest = toks.drop(i).dropWhile(t => t == ":" || t == "." || t == "-")
    val out = scala.collection.mutable.ListBuffer.empty[Span]
    if (label.nonEmpty) out += Span(0L, "<label>", label)
    if (rest.nonEmpty) out += Span(1L, "<figDesc>", rest.mkString(" "))
    out.toList
  }

  /** Figure/table model pass over fulltext-fold output
    * (`processors/fulltext/processor.py:747-807`
    * `_extract_semantic_content_from_raw_content`): each
    * `raw_figure`/`raw_table` node is parsed by the figure/table model
    * stand-in and replaced in place by the [[Extractors.figureFold]]
    * result (figure node + label/caption children). Existing node ids
    * are multiplied by 8 to open id slots for the grafted children, so
    * document order — and therefore `fig_0…`/`tab_0…` assignment order —
    * is preserved without renumbering the whole tree.
    */
  private[pipeline] def figureTablePass(docId: Long,
      nodes: Seq[SemanticNode]): Seq[SemanticNode] = {
    val out = scala.collection.mutable.ListBuffer.empty[SemanticNode]
    def mapParent(p: Long): Long = if (p < 0) -1L else p * 8
    nodes.sortBy(_.node_id).foreach { n =>
      val base = n.node_id * 8
      n.node_type match {
        case "raw_figure" | "raw_table" =>
          val kind = if (n.node_type == "raw_figure") "figure" else "table"
          val folded = Extractors.figureFold(docId, figureSpansOf(n.text), kind)
          if (folded.isEmpty)
            out += n.copy(node_id = base, parent_id = mapParent(n.parent_id))
          else folded.foreach { f =>
            out += f.copy(node_id = base + f.node_id,
              parent_id = if (f.parent_id < 0) mapParent(n.parent_id)
                else base + f.parent_id)
          }
        case _ =>
          out += n.copy(node_id = base, parent_id = mapParent(n.parent_id))
      }
    }
    out.toList
  }

  /** Local (per-document) matcher with [[RefMatching.matchContentIds]]
    * semantics (reference `processors/ref_matching.py:19-105` — the
    * reference, too, matches within one document at a time): exact
    * normalized-key lookup, then token-prefix key, then partial
    * token-vote with strict top-1 (ties rejected). Candidate dicts are
    * built in document order, later entries overwriting
    * (`SimpleContentIdMatcher` dict semantics).
    *
    * This runs inside the per-doc fold rather than as corpus-wide
    * joins: a DataFrame formulation referenced the whole un-cached
    * pipeline subtree seven times, exploding Catalyst optimization
    * time; per-doc it is a few hash-map probes over a handful of
    * labels.
    */
  private[pipeline] def matchContentIdsLocal(
      citations: Seq[(Long, String)],
      candidates: Seq[(String, String)]): Map[Long, String] = {
    def normKey(s: String): String = s.toLowerCase.replaceAll("[^a-z0-9]", "")
    def prefixKey(s: String, n: Int = 1): String =
      s.split("\\s+").filter(_.nonEmpty).map { t =>
        normKey(if (t.exists(_.isDigit)) t else t.take(n))
      }.mkString
    val byExact = candidates.map { case (id, lt) => normKey(lt) -> id }.toMap
    val byPrefix = candidates.map { case (id, lt) => prefixKey(lt) -> id }
      .filter(_._1.nonEmpty).toMap
    val candTokens = candidates.map { case (id, lt) =>
      id -> lt.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet
    }
    citations.flatMap { case (nid, text) =>
      val direct = byExact.get(normKey(text)).orElse(byPrefix.get(prefixKey(text)))
      direct.orElse {
        val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet
        val votes = candTokens.map { case (id, ct) => id -> (toks & ct).size }
          .filter(_._2 > 0)
        if (votes.isEmpty) None
        else {
          val top = votes.filter(_._2 == votes.map(_._2).max)
          if (top.size == 1) Some(top.head._1) else None
        }
      }.map(nid -> _)
    }.toMap
  }

  /** J1 + F2 per document: assign `fig_0…`/`tab_0…` content ids in
    * document order (`utils/misc.py:4-8` iter_ids), then resolve each
    * `figure_citation`/`table_citation` against its document's
    * figure/table LABEL text (`processors/fulltext/processor.py:
    * 239-267`), writing the matched id into the citation's `content_id`
    * (the reference's `target_content_id`; TEI renders it as
    * `<ref target="#fig_N">`). Figures and tables are matched
    * separately, as the reference does.
    */
  private[pipeline] def assignIdsAndTargets(
      nodes: Seq[SemanticNode]): Seq[SemanticNode] = {
    var figN = 0
    var tabN = 0
    val withIds = nodes.sortBy(_.node_id).map { n =>
      n.node_type match {
        case "figure" => val id = s"fig_$figN"; figN += 1; n.copy(content_id = id)
        case "table" => val id = s"tab_$tabN"; tabN += 1; n.copy(content_id = id)
        case _ => n
      }
    }
    val byId = withIds.map(n => n.node_id -> n).toMap
    def labelsOf(targetType: String): Seq[(String, String)] =
      withIds.filter(_.node_type == "label").flatMap { l =>
        byId.get(l.parent_id).filter(_.node_type == targetType)
          .map(p => (p.content_id, l.text))
      }
    def citationsOf(citType: String): Seq[(Long, String)] =
      withIds.filter(_.node_type == citType).map(n => n.node_id -> n.text)
    // reference citations match against reference LABELS ("1.", "[2]"),
    // candidate ids are the b<n> content ids shared by raw + parsed
    // reference nodes (processors/fulltext/processor.py:239-267 routes
    // all three citation types through the same matcher)
    val refCandidates: Seq[(String, String)] =
      withIds.filter(_.node_type == "label").flatMap { l =>
        byId.get(l.parent_id).filter(_.node_type == "raw_reference")
          .map(p => (p.content_id, l.text))
      }
    val matched =
      matchContentIdsLocal(citationsOf("figure_citation"), labelsOf("figure")) ++
        matchContentIdsLocal(citationsOf("table_citation"), labelsOf("table")) ++
        matchContentIdsLocal(citationsOf("reference_citation"), refCandidates)
    withIds.map(n =>
      matched.get(n.node_id).map(t => n.copy(content_id = t)).getOrElse(n))
  }

  /** Name model pass on citation authors/editors (reference
    * `processors/fulltext/processor.py:654-717`
    * `_extract_reference_name_lists_from_raw_references`): every
    * `raw_authors`/`raw_editors` node under a parsed reference is
    * replaced in place by the name fold over its text — person nodes
    * (`author`/`editor`) with title-cased given_name/surname children —
    * gated per config flag. Pure per-document function; node ids are
    * renumbered emission-ordered, preserving document order.
    */
  def citationNamePass(docId: Long,
      nodes: Seq[SemanticNode], config: Config = Config()): Seq[SemanticNode] = {
    if (!config.extractCitationAuthors && !config.extractCitationEditors)
      return nodes
    val out = scala.collection.mutable.ListBuffer.empty[SemanticNode]
    var nextId = 0L
    val idMap = scala.collection.mutable.Map.empty[Long, Long]
    def add(tpe: String, text: String, parent: Long, contentId: String): Long = {
      val id = nextId; nextId += 1
      out += SemanticNode(docId, id, parent, tpe, text, contentId)
      id
    }
    def graft(grafted: Seq[SemanticNode], parent: Long): Unit = {
      val gMap = scala.collection.mutable.Map.empty[Long, Long]
      grafted.foreach { g =>
        val mapped = if (g.parent_id < 0) parent else gMap(g.parent_id)
        gMap(g.node_id) = add(g.node_type, g.text, mapped, g.content_id)
      }
    }
    nodes.sortBy(_.node_id).foreach { n =>
      val parent = if (n.parent_id < 0) -1L else idMap.getOrElse(n.parent_id, -1L)
      n.node_type match {
        case "raw_authors" if config.extractCitationAuthors =>
          graft(ModelExtractors.nameFold(docId, nameSpansOf(n.text), "author"),
            parent)
        case "raw_editors" if config.extractCitationEditors =>
          graft(ModelExtractors.nameFold(docId, nameSpansOf(n.text), "editor"),
            parent)
        case _ =>
          idMap(n.node_id) = add(n.node_type, n.text, parent, n.content_id)
      }
    }
    out.toList
  }

  /** Expand header-fold output with name/affiliation model passes —
    * pure per-document function over the node list (node ids are
    * reassigned emission-ordered). */
  def processDocument(docId: Long, headerNodes: Seq[SemanticNode],
      config: Config = Config()): Seq[SemanticNode] = {
    val out = scala.collection.mutable.ListBuffer.empty[SemanticNode]
    var nextId = 0L
    def add(tpe: String, text: String, parent: Long, contentId: String): Long = {
      val id = nextId; nextId += 1
      out += SemanticNode(docId, id, parent, tpe, text, contentId)
      id
    }
    def graft(nodes: Seq[SemanticNode], parent: Long): Unit = {
      val idMap = scala.collection.mutable.Map.empty[Long, Long]
      nodes.foreach { n =>
        val mappedParent = if (n.parent_id < 0) parent else idMap(n.parent_id)
        idMap(n.node_id) = add(n.node_type, n.text, mappedParent, n.content_id)
      }
    }
    val ordered = headerNodes.sortBy(_.node_id)
    val childrenOf = ordered.groupBy(_.parent_id)
    ordered.filter(_.parent_id < 0).foreach { n =>
      n.node_type match {
        case "raw_authors" if config.extractAuthors =>
          val container = add("authors", "", -1L, null)
          graft(ModelExtractors.nameFold(docId, nameSpansOf(n.text)), container)
        case "raw_affiliation_address" if config.extractAffiliations =>
          val kids = childrenOf.getOrElse(n.node_id, Nil)
            .map(c => (c.node_type, c.text))
          val folded = ModelExtractors.affiliationFold(docId, affiliationSpansOf(kids))
          graft(folded, -1L)
        case _ =>
          val id = add(n.node_type, n.text, -1L, n.content_id)
          childrenOf.getOrElse(n.node_id, Nil).foreach { c =>
            add(c.node_type, c.text, id, c.content_id)
          }
      }
    }
    out.toList
  }

  /** DataFrame stage: header semantic nodes → fully processed nodes. */
  def process(headerNodes: DataFrame, config: Config = Config()): Dataset[SemanticNode] = {
    val sparkSession = headerNodes.sparkSession
    import sparkSession.implicits._
    headerNodes
      .select(col("doc_id"), col("node_id"), col("parent_id"),
        col("node_type"), col("text"), col("content_id"))
      .as[SemanticNode]
      .groupByKey(_.doc_id)
      .flatMapGroups { (docId, it) => processDocument(docId, it.toSeq, config).iterator }
  }

  /** Full header pipeline: token table → labeled → spans → header fold →
    * name/affiliation passes. */
  def headerPipeline(tokens: DataFrame, labeler: SequenceLabeler,
      config: Config = Config()): Dataset[SemanticNode] =
    process(Extractors.headerSemantics(
      BioSpans.spans(labeler.label(tokens))).toDF(), config)

  /** One fulltext-model view (`processor.py:809-848`
    * `_update_semantic_section_using_segmentation_result_and_fulltext_model`):
    * label the view's tokens with the fulltext model, fold into
    * sections (tagged `sectionType` via the section `content_id`), run
    * the figure/table pass, and shift node ids by `idOffset` so views
    * concatenate in document order.
    */
  private def fulltextViewNodes(viewTokens: DataFrame, sectionType: String,
      idOffset: Long): Dataset[SemanticNode] =
    fulltextViewNodesLabeled(new BodyRuleLabeler().label(viewTokens),
      sectionType, idOffset)

  /** Same fold over an ALREADY-labeled view — lets the graphics path
    * label the body once and share it with the candidate-box branch. */
  private def fulltextViewNodesLabeled(labeled: DataFrame, sectionType: String,
      idOffset: Long): Dataset[SemanticNode] = {
    val sparkSession = labeled.sparkSession
    import sparkSession.implicits._
    BioSpans.spans(labeled)
      .select(col("doc_id"), col("span_id"), col("tag"), col("text"))
      .as[(Long, Long, String, String)]
      .groupByKey(_._1)
      .flatMapGroups { (docId, it) =>
        figureTablePass(docId, ModelExtractors.fulltextFold(docId,
          it.map(r => Extractors.Span(r._2, r._3, r._4)).toSeq, sectionType)).iterator
      }
      .map(n => n.copy(
        node_id = n.node_id + idOffset,
        parent_id = if (n.parent_id < 0) -1L else n.parent_id + idOffset))
  }

  /** The references view (`processor.py:529-622,654-717`): tokens the
    * segmentation stage labeled `<references>` → reference-segmenter
    * model (raw references with labels) → citation model per raw
    * reference → name model on each parsed reference's raw authors —
    * all three folds inside ONE per-document group, so the whole chain
    * costs a single shuffle on doc_id.
    */
  private def referencesViewNodes(viewTokens: DataFrame, idOffset: Long,
      config: Config): Dataset[SemanticNode] = {
    val sparkSession = viewTokens.sparkSession
    import sparkSession.implicits._
    BioSpans.spans(new ReferenceSegmenterRuleLabeler().label(viewTokens))
      .select(col("doc_id"), col("span_id"), col("tag"), col("text"))
      .as[(Long, Long, String, String)]
      .groupByKey(_._1)
      .flatMapGroups { (docId, it) =>
        val spans = it.map(r => Extractors.Span(r._2, r._3, r._4)).toSeq
        citationNamePass(docId,
          citationPass(docId, ModelExtractors.referenceSegmenterFold(docId, spans)),
          config).iterator
      }
      .map(n => n.copy(node_id = n.node_id + idOffset,
        parent_id = if (n.parent_id < 0) -1L else n.parent_id + idOffset))
  }

  /** The reference's full document flow (processor.py:180-274):
    * segmentation labels every token `<header>`/`<body>`/
    * `<acknowledgement>`/`<annex>`, the header model + folds run on the
    * header view, the fulltext fold on the body view and on the two
    * back-matter views (`processor.py:205-225` — acknowledgement
    * section type `acknowledgement`, annex sections routed to the back
    * annex container). Each view is just a predicate on the labeled
    * token table (B4/B5), so no data is copied, and Catalyst pushes the
    * tag filter below each branch's windows.
    */
  def documentPipeline(tokens: DataFrame, config: Config = Config(),
      graphics: Option[DataFrame] = None): Dataset[SemanticNode] = {
    val sparkSession = tokens.sparkSession
    import sparkSession.implicits._
    // the five view branches (header/body/ack/annex/references) all
    // read the SAME segmentation labeling; left lazy, each branch
    // re-scans the corpus and re-runs the labeler's windows (measured
    // 5 scans / 19 exchanges in the p04 plan). Materializing the
    // labeled token table once is the design that holds at scale too —
    // the reference labels once, and storing one labeled corpus copy
    // beats recomputing five window passes over it. localCheckpoint
    // (executor-local, cleaned by the ContextCleaner when unreferenced)
    // rather than persist — the p09 lesson: a persist with no owner to
    // unpersist leaks across queries.
    val seg = new SegmentationRuleLabeler().label(tokens).localCheckpoint()
    def view(tag: String): DataFrame =
      BioSpans.filterByTags(seg, Seq(tag)).drop("label", "tag")

    val headerNodes = headerPipeline(view("<header>"), new RuleLabeler(), config)
    // view node ids are offset after all header ids so TEI ordering is
    // stable: header, body, acknowledgement, annex
    // with graphics enabled the body labeling feeds TWO branches (the
    // fulltext fold and the figure candidate boxes) — label it once
    val bodyLabeled = graphics.map(_ =>
      new BodyRuleLabeler().label(view("<body>")).localCheckpoint())
    val bodyNodes = bodyLabeled match {
      case Some(bl) => fulltextViewNodesLabeled(bl, "body", BodyIdOffset)
      case None => fulltextViewNodes(view("<body>"), "body", BodyIdOffset)
    }
    val ackNodes = fulltextViewNodes(view("<acknowledgement>"),
      "acknowledgement", 2 * BodyIdOffset)
    val annexNodes = fulltextViewNodes(view("<annex>"), "annex", 3 * BodyIdOffset)
    val refNodes = referencesViewNodes(view("<references>"), 4 * BodyIdOffset, config)
    // fig_0…/tab_0… ids in document order + citation-target resolution,
    // per document inside one fold (one shuffle on doc_id; the
    // reference's matcher is per-document too)
    val union = headerNodes.union(bodyNodes).union(ackNodes).union(annexNodes)
      .union(refNodes)
    graphics match {
      case None =>
        union.groupByKey(_.doc_id)
          .flatMapGroups((_, it) => assignIdsAndTargets(it.toSeq).iterator)
      case Some(g) =>
        // id assignment and graphic attachment share ONE doc_id
        // shuffle: the cogroup runs assignIdsAndTargets and then
        // attaches matched graphics in the same per-doc pass (a
        // second groupByKey over the assigned nodes re-shuffled the
        // whole node table — ~1/3 of the p13 runtime)
        val gAll = matchedGraphicInfo(g, figureCandidates(bodyLabeled.get),
          config.extractGraphicAssets)
        union.groupByKey(_.doc_id).cogroup(gAll.groupByKey(_._1)) {
          (docId, ns, gs) =>
            attachGraphicsLocal(docId, assignIdsAndTargets(ns.toSeq),
              gs.toSeq).iterator
        }
    }
  }

  /** Figure/table candidate boxes off the labeled body view
    * (`processors/fulltext/processor.py:337-369` builds the candidate
    * list from SemanticFigure/SemanticTable layout blocks): one box per
    * `<figure>`/`<table>` span — the union of its tokens' coordinates —
    * keyed by the `fig_N`/`tab_N` content id the span's node WILL get,
    * which is exactly its per-kind document-order rank (figureTablePass
    * replaces raw figures in place, so span order == node order ==
    * `assignIdsAndTargets` numbering).
    */
  private[pipeline] def figureCandidates(bodyLabeled: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    BioSpans.assignSpanIds(bodyLabeled)
      .filter(col("tag").isin("<figure>", "<table>") && col("coords").isNotNull &&
        col("page_width").isNotNull)
      .groupBy(col("doc_id"), col("span_id"))
      .agg(first(col("tag")).as("tag"),
        min(col("coords.x")).as("x"), min(col("coords.y")).as("y"),
        max(col("coords.x") + col("coords.width")).as("x2"),
        max(col("coords.y") + col("coords.height")).as("y2"),
        // deterministic page anchor for spans crossing a page boundary:
        // the span's FIRST page (struct min orders on page_number; the
        // dims ride along, and are constant per page)
        min(struct(col("page_number"), col("page_width"),
          col("page_height"))).as("pg"))
      .withColumn("page_number", col("pg.page_number"))
      .withColumn("page_width", col("pg.page_width"))
      .withColumn("page_height", col("pg.page_height"))
      .drop("pg")
      .withColumn("width", col("x2") - col("x"))
      .withColumn("height", col("y2") - col("y"))
      .withColumn("candidate_id", concat(
        when(col("tag") === "<figure>", lit("fig_")).otherwise(lit("tab_")),
        row_number().over(Window.partitionBy(col("doc_id"), col("tag"))
          .orderBy(col("span_id"))) - 1))
      .drop("tag", "span_id", "x2", "y2")
  }

  /** Graphics input for [[documentPipeline]] from the ALTO reader's
    * graphic rows: page dimensions joined in from the token table
    * (graphics and tokens share pages; broadcast — pages-per-doc is
    * tiny next to tokens). */
  def graphicsForMatching(tokens: DataFrame, graphicRows: DataFrame): DataFrame = {
    val pageDims = tokens.filter(col("page_width").isNotNull)
      .groupBy(col("doc_id"), col("page_number"))
      .agg(first(col("page_width")).as("page_width"),
        first(col("page_height")).as("page_height"))
    graphicRows.filter(col("coords").isNotNull)
      .join(broadcast(pageDims), Seq("doc_id", "page_number"))
      .select(col("doc_id"), col("file_id").as("graphic_id"),
        col("graphic_type"),
        col("coords.x").as("x"), col("coords.y").as("y"),
        col("coords.width").as("width"), col("coords.height").as("height"),
        col("page_number"), col("page_width"), col("page_height"))
  }

  /** F3 wired into the document DAG
    * (`processors/fulltext/processor.py:268-273,337-369`
    * `_process_graphics`): bounding-box match page graphics against the
    * figure/table candidates, attach each matched graphic as a
    * `graphic` child of its figure node (TEI: `<graphic type coords>`,
    * tei/graphic.py:22-55), and collect unmatched graphics under one
    * `note[unmatched_graphics]` back node per document
    * (processor.py:343,367-369). Graphic info rides in the node row as
    * `content_id = graphic_id`, `text = "<type>|<page,x,y,w,h>[|<url>]"`
    * (format_coordinates, tei/common.py:87-94). With
    * `extractAssets = true` the graphic id doubles as the asset's
    * relative path (the A8 zip entry name) and TEI emits it as the
    * `url` attribute — `graphic.py:37-39` sets `relative_path` exactly
    * when assets are extracted.
    */
  /** Every graphic with its render text and (nullable) matched figure
    * content id — the small matcher output joined back to the graphic
    * table (an earlier formulation read the pipeline output three
    * times and re-ran the whole upstream DAG per reference: 4× the
    * p04 runtime at sf0.001). */
  private[pipeline] def matchedGraphicInfo(graphics: DataFrame,
      candidates: DataFrame,
      extractAssets: Boolean): Dataset[(Long, String, String, String)] = {
    val sparkSession = graphics.sparkSession
    import sparkSession.implicits._
    val matched = GraphicMatching.matchGraphics(graphics, candidates)
    val coordsStr = format_string("%d,%.2f,%.2f,%.2f,%.2f", col("page_number"),
      col("x"), col("y"), col("width"), col("height"))
    val gtext =
      if (extractAssets)
        concat(col("graphic_type"), lit("|"), coordsStr, lit("|"), col("graphic_id"))
      else concat(col("graphic_type"), lit("|"), coordsStr)
    graphics.select(col("doc_id"), col("graphic_id"), gtext.as("gtext"))
      .join(matched, Seq("doc_id", "graphic_id"), "left_outer")
      .select(col("doc_id"), col("graphic_id"), col("gtext"), col("candidate_id"))
      .as[(Long, String, String, String)]
  }

  /** Per-document attach: matched graphics become `graphic` children
    * of their figure node, strays collect under one
    * `note[unmatched_graphics]` back node. */
  private[pipeline] def attachGraphicsLocal(docId: Long,
      nodes: Seq[SemanticNode],
      gs: Seq[(Long, String, String, String)]): Seq[SemanticNode] = {
    if (gs.isEmpty) return nodes
    val byCand = nodes.filter(n =>
        n.node_type == "figure" || n.node_type == "table")
      .map(n => n.content_id -> n.node_id).toMap
    val extra = scala.collection.mutable.ListBuffer.empty[SemanticNode]
    var nextMatched = 5 * BodyIdOffset
    var nextStray = 6 * BodyIdOffset
    gs.sortBy(_._2).foreach { case (_, gid, gtext, cand) =>
      Option(cand).flatMap(byCand.get) match {
        case Some(figNodeId) =>
          nextMatched += 1
          extra += SemanticNode(docId, nextMatched, figNodeId, "graphic",
            gtext, gid)
        case None =>
          if (nextStray == 6 * BodyIdOffset) extra += SemanticNode(docId,
            nextStray, -1L, "note[unmatched_graphics]", "", null)
          nextStray += 1
          extra += SemanticNode(docId, nextStray, 6 * BodyIdOffset,
            "graphic", gtext, gid)
      }
    }
    nodes ++ extra
  }

  private val BodyIdOffset = 1L << 32
}
