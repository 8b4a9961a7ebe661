package graft.service

import graft.pipeline.{CrfLabeler, NeuralLabeler, Onnx, Processor, SequenceLabeler}

/** File-based configuration surface — the engine's analog of the
  * reference's `resources/default_config/config.yml`, loaded the way
  * `app/parser.py:173-199` builds its parser from `AppConfig`: model
  * paths, lexica, DPI/threshold knobs and processor flags all come
  * from one declarative file a deployment edits without touching code.
  *
  * The reader is a deliberately small YAML SUBSET — exactly the shape
  * the reference config uses and nothing more (nested maps by
  * indentation, `key: value` scalars, `- item` scalar lists, `#`
  * comments, single/double-quoted strings) — so the surface needs no
  * new dependency in a zero-egress build. Unknown keys are simply
  * retained (dotted-path lookups that nobody asks for cost nothing),
  * matching the reference's dict semantics.
  *
  * Model loading follows the reference's soft-degrade convention
  * (`models.py`: a missing/remote model directory falls back rather
  * than aborting): a local `engine: onnx` path loads through
  * [[Onnx.labelerFromFile]] (opset-guarded), `engine: wapiti` through
  * [[CrfLabeler.fromFile]]; a URL path (the reference's download
  * convention — zero egress here) or an absent file yields None and
  * the caller keeps its rule labeler.
  */
final class AppConfig private[service] (val root: Map[String, Any]) {

  private def resolve(path: String): Option[Any] = {
    def step(cur: Any, parts: List[String]): Option[Any] = parts match {
      case Nil => Some(cur)
      case p :: rest => cur match {
        case m: Map[_, _] =>
          m.asInstanceOf[Map[String, Any]].get(p) match {
            case Some(v) => step(v, rest)
            case None => None
          }
        case _ => None
      }
    }
    step(root, path.split('.').toList)
  }

  /** Scalar at a dotted path (`"processors.fulltext.cv_render_dpi"`). */
  def get(path: String): Option[String] = resolve(path) match {
    case Some(s: String) => Some(s)
    case _ => None
  }

  /** List of scalars at a dotted path (`"lookup.country.paths"`). */
  def getSeq(path: String): Seq[String] = resolve(path) match {
    case Some(xs: Seq[_]) => xs.collect { case s: String => s }
    case Some(s: String) => Seq(s)
    case _ => Seq.empty
  }

  /** Child key names of a map node (`"models"` → model names). */
  def keys(path: String): Seq[String] = resolve(path) match {
    case Some(m: Map[_, _]) =>
      m.asInstanceOf[Map[String, Any]].keys.toSeq
    case _ => Seq.empty
  }

  def getBoolean(path: String, default: Boolean): Boolean =
    get(path).map(_.trim.toLowerCase == "true").getOrElse(default)
  def getInt(path: String, default: Int): Int =
    get(path).map(_.trim.toInt).getOrElse(default)
  def getDouble(path: String, default: Double): Double =
    get(path).map(_.trim.toDouble).getOrElse(default)

  // ------------------------------------------------- mapped surfaces

  /** `processors.fulltext.*` → [[Processor.Config]] — the
    * `FullTextProcessorConfig.from_app_config` mapping
    * (`processors/fulltext/config.py:53-57`) for the flags this
    * engine's processor carries. */
  def processorConfig: Processor.Config = {
    val d = Processor.Config()
    Processor.Config(
      extractAuthors = getBoolean("processors.fulltext.extract_authors",
        d.extractAuthors),
      extractAffiliations =
        getBoolean("processors.fulltext.extract_affiliations",
          d.extractAffiliations),
      extractCitationAuthors =
        getBoolean("processors.fulltext.extract_citation_authors",
          d.extractCitationAuthors),
      extractCitationEditors =
        getBoolean("processors.fulltext.extract_citation_editors",
          d.extractCitationEditors),
      extractGraphicAssets =
        getBoolean("processors.fulltext.extract_graphic_assets",
          d.extractGraphicAssets))
  }

  /** `processors.fulltext.cv_render_dpi` (A9 page render,
    * `document_page_image.py` DEFAULT_PDF_RENDER_DPI=100). */
  def cvRenderDpi: Int = getInt("processors.fulltext.cv_render_dpi", 100)

  /** `processors.fulltext.max_graphic_distance` (F3 matching,
    * `graphic_matching.py` DEFAULT_MAX_GRAPHIC_DISTANCE=0.3). */
  def maxGraphicDistance: Double =
    getDouble("processors.fulltext.max_graphic_distance", 0.3)

  def useCvModel: Boolean =
    getBoolean("processors.fulltext.use_cv_model", default = false)
  def useOcrModel: Boolean =
    getBoolean("processors.fulltext.use_ocr_model", default = false)

  /** `cv_models.default.score_threshold` (D5 post-filter,
    * `config.yml:110`). */
  def cvScoreThreshold: Double =
    getDouble("cv_models.default.score_threshold", 0.1)

  /** `xslt.tei_to_jats.parameters` → the A7 XSLT parameter map
    * (`config.yml:47-56`, applied at `parser.py:199`). */
  def teiToJatsParameters: Map[String, String] =
    keys("xslt.tei_to_jats.parameters").map { k =>
      k -> get(s"xslt.tei_to_jats.parameters.$k").getOrElse("")
    }.toMap

  /** `lookup.<name>.paths` → merged lexicon frame (A4,
    * [[graft.sources.Lexicon]]: `.xml` paths parse as GROBID TEI
    * tables, anything else as one-word-per-line lists), LOCAL files
    * only — the reference downloads its lexica from URLs
    * (`config.yml:57-69`), which a zero-egress deployment replaces
    * with local paths; URL entries are skipped with the same
    * soft-degrade as models. None when no local path resolves. */
  def lexicon(spark: org.apache.spark.sql.SparkSession,
      name: String): Option[org.apache.spark.sql.DataFrame] = {
    val frames = getSeq(s"lookup.$name.paths")
      .filterNot(isUrl)
      .filter(new java.io.File(_).isFile)
      .map { p =>
        if (p.endsWith(".xml")) graft.sources.Lexicon.fromTeiXmlFile(spark, p)
        else graft.sources.Lexicon.fromTextFile(spark, p)
      }
    if (frames.isEmpty) None else Some(graft.sources.Lexicon.merged(frames))
  }

  private def isUrl(p: String): Boolean =
    p.startsWith("http://") || p.startsWith("https://") ||
      p.startsWith("lp://")

  /** D6 OCR closure from `ocr_models.default` (reference
    * `config.yml:110-119` binds tesserocr): `engine: glyph` yields the
    * in-JVM [[graft.pipeline.GlyphOcr]] template-correlation
    * recognizer with the configured `max_resolution` (the reference's
    * 1024 default); any other engine (tesserocr — no binary in a
    * zero-egress build) degrades to None and the caller keeps its
    * injected seam. Gated on `processors.fulltext.use_ocr_model` like
    * the reference's processor flag. */
  def ocrModel: Option[Array[Byte] => String] =
    if (!useOcrModel) None
    else get("ocr_models.default.engine") match {
      case Some("glyph") =>
        val maxRes = getInt("ocr_models.default.max_resolution", 1024)
        Some(bytes => graft.pipeline.GlyphOcr.recognize(bytes, maxRes))
      case _ => None
    }

  /** Build the labeler for `models.<name>` per its `engine`:
    *  - `onnx` — [[Onnx.labelerFromFile]] with the config's `labels`
    *    list and `feat_dim` hashing encoder (the engine's documented
    *    extension keys: the reference's DELFT tarballs carry labels in
    *    their own embedded config, this engine declares them here);
    *  - `wapiti` — [[CrfLabeler.fromFile]] (plain or gzipped model
    *    text, `models/wapiti_model_impl.py:40`);
    *  - anything else, a URL path, or a missing file — None (caller
    *    keeps its rule labeler; the reference's soft degrade).
    *
    * A model labeler consumes FEATURES, not raw tokens (the
    * reference's wapiti/DELFT models all take the generated data
    * line), so the returned labeler is wrapped with its slot's feature
    * generator: header/fulltext/reference_segmenter generate per-token
    * data lines, segmentation labels per-LINE features and propagates
    * the line label to its tokens (`segmentation/data.py` granularity).
    * A frame that already carries a `features` column passes through
    * unwrapped.
    */
  def labelerFor(name: String): Option[SequenceLabeler] = {
    val base = s"models.$name"
    get(s"$base.path").filterNot(isUrl).flatMap { path =>
      get(s"$base.engine").getOrElse("") match {
        case "onnx" =>
          val labels = getSeq(s"$base.labels").toIndexedSeq
          val featDim = getInt(s"$base.feat_dim", 16)
          // Scoring must match TRAINING: the engine's own exported
          // artifacts (NeuralTrainer / p21) encode data lines with the
          // position-aware hasher and decode under the BIO transition
          // mask, so those are the defaults here — a config-loaded
          // model scored with the bag encoder would silently mislabel.
          // `encoder: bag` opts a free-text model out.
          val encode = get(s"$base.encoder").getOrElse("positional") match {
            case "bag" => NeuralLabeler.hashingEncoder(featDim)
            case _ => NeuralLabeler.positionalHashingEncoder(featDim)
          }
          if (labels.isEmpty) None
          else Onnx.labelerFromFile(path, labels, encode, featDim,
            transitionMask = Some(NeuralLabeler.bioMask(labels)))
        case "wapiti" =>
          if (new java.io.File(path).isFile)
            Some(CrfLabeler.fromFile(path))
          else None
        case _ => None
      }
    }.map(AppConfig.wrapForSlot(name, _))
  }

  /** D5 detector from `cv_models.default` when `path` is a local ONNX
    * file: `categories` list + `anchors` list of `"x,y,w,h"`
    * page-relative boxes (engine extension keys; the reference's
    * `lp://efficientdet/PubLayNet` URL scheme degrades to None). */
  def cvDetector: Option[Array[Byte] => Seq[(Double, Double, Double, Double, String, Double)]] = {
    get("cv_models.default.path").filterNot(isUrl).flatMap { path =>
      val categories = getSeq("cv_models.default.categories").toIndexedSeq
      val anchors = getSeq("cv_models.default.anchors").map { s =>
        val p = s.split(",").map(_.trim.toDouble)
        require(p.length == 4, s"anchor '$s' must be x,y,w,h")
        (p(0), p(1), p(2), p(3))
      }
      if (categories.isEmpty || anchors.isEmpty) None
      else Onnx.detectorFromFile(path, categories, anchors,
        grid = getInt("cv_models.default.grid", 8))
    }
  }
}

object AppConfig {

  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._

  /** Per-token-feature slot wrapper: generate the slot's data lines
    * into the `features` column unless the frame already carries one
    * (the p11 convention: `dataLines(...).withColumnRenamed
    * ("data_line", "features")`). */
  private final class FeaturedLabeler(gen: DataFrame => DataFrame,
      inner: SequenceLabeler) extends SequenceLabeler {
    override def label(tokens: DataFrame): DataFrame =
      if (tokens.columns.contains("features")) inner.label(tokens)
      else inner.label(
        gen(tokens).withColumnRenamed("data_line", "features"))
  }

  /** Segmentation models are LINE-granular (`segmentation/data.py`):
    * the model labels one feature row per line, and every token
    * inherits its line's tag — B- only on the first token of a
    * B-labeled line, I- elsewhere in the span. */
  private final class SegmentationModelLabeler(inner: SequenceLabeler)
      extends SequenceLabeler {
    override def label(tokens: DataFrame): DataFrame = {
      val lineRows = graft.pipeline.SegmentationFeatures.dataLines(tokens)
        .select(col("doc_id"), col("page_idx"), col("block_idx"),
          col("line_idx"), lit(0).as("token_idx"),
          col("line_text").as("text"), lit(" ").as("whitespace"),
          col("data_line").as("features"))
      val lineLabels = inner.label(lineRows)
        .select(col("doc_id"), col("page_idx"), col("block_idx"),
          col("line_idx"), col("label").as("line_label"))
      tokens
        .join(lineLabels,
          Seq("doc_id", "page_idx", "block_idx", "line_idx"), "left")
        .withColumn("label",
          when(col("line_label").isNull, "O")
            .when(!col("line_label").rlike("^[BI]-"), col("line_label"))
            .when(col("token_idx") === 0 &&
              col("line_label").startsWith("B-"), col("line_label"))
            .otherwise(concat(lit("I-"),
              regexp_extract(col("line_label"), "^[BI]-(.*)$", 1))))
        .drop("line_label")
    }
  }

  private[service] def wrapForSlot(name: String,
      inner: SequenceLabeler): SequenceLabeler = name match {
    case "segmentation" => new SegmentationModelLabeler(inner)
    case "header" => new FeaturedLabeler(
      graft.pipeline.HeaderFeatures.dataLines(_), inner)
    case "fulltext" => new FeaturedLabeler(
      graft.pipeline.ModelDataGenerators.fulltextDataLines(_), inner)
    case "reference_segmenter" => new FeaturedLabeler(
      graft.pipeline.ModelDataGenerators.referenceSegmenterDataLines(_),
      inner)
    case _ => inner
  }

  def fromFile(path: String): AppConfig =
    parse(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  /** Parse the YAML subset (see class doc). Indentation defines
    * nesting; tabs are rejected like YAML proper. */
  def parse(text: String): AppConfig = {
    final case class Line(indent: Int, content: String)
    val lines = text.linesIterator.zipWithIndex.flatMap { case (raw, ln) =>
      require(!raw.contains('\t'), s"line ${ln + 1}: tabs are not allowed")
      val noComment = stripComment(raw)
      val content = noComment.trim
      if (content.isEmpty) None
      else Some(Line(noComment.indexWhere(_ != ' '), content))
    }.toVector

    // recursive descent over the flat line list
    def parseBlock(i: Int, indent: Int): (Any, Int) = {
      if (i >= lines.length || lines(i).indent < indent) (Map.empty[String, Any], i)
      else if (lines(i).content.startsWith("- ") || lines(i).content == "-") {
        val items = Vector.newBuilder[Any]
        var j = i
        while (j < lines.length && lines(j).indent == indent &&
            (lines(j).content.startsWith("- ") || lines(j).content == "-")) {
          items += unquote(lines(j).content.drop(1).trim)
          j += 1
        }
        (items.result(), j)
      } else {
        val entries = Map.newBuilder[String, Any]
        var j = i
        while (j < lines.length && lines(j).indent == indent &&
            !lines(j).content.startsWith("- ")) {
          val c = lines(j).content
          val colon = colonIndex(c)
          require(colon > 0, s"expected 'key: value' or 'key:', got '$c'")
          val key = unquote(c.substring(0, colon).trim)
          val rest = c.substring(colon + 1).trim
          if (rest.nonEmpty) {
            entries += key -> unquote(rest)
            j += 1
          } else {
            // nested block: everything more indented than this line
            val childIndent =
              if (j + 1 < lines.length && lines(j + 1).indent > indent)
                lines(j + 1).indent
              else -1
            if (childIndent < 0) { entries += key -> ""; j += 1 }
            else {
              val (v, next) = parseBlock(j + 1, childIndent)
              entries += key -> v
              j = next
            }
          }
        }
        (entries.result(), j)
      }
    }
    val (root, end) = parseBlock(0, if (lines.isEmpty) 0 else lines(0).indent)
    require(end == lines.length,
      s"unparsed content from line fragment '${lines(end).content}'")
    root match {
      case m: Map[_, _] => new AppConfig(m.asInstanceOf[Map[String, Any]])
      case other =>
        throw new IllegalArgumentException(s"top level must be a map, got $other")
    }
  }

  /** Strip a `#` comment outside quotes (YAML: `#` starts a comment at
    * line start or after whitespace). */
  private def stripComment(s: String): String = {
    var inS = false
    var inD = false
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' if !inD => inS = !inS
        case '"' if !inS => inD = !inD
        case '#' if !inS && !inD &&
            (i == 0 || s.charAt(i - 1) == ' ') =>
          return s.substring(0, i)
        case _ =>
      }
      i += 1
    }
    s
  }

  /** First `:` that ends a key (followed by space or end-of-content),
    * outside quotes — URLs in values (`https://...`) must not split. */
  private def colonIndex(s: String): Int = {
    var inS = false
    var inD = false
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' if !inD => inS = !inS
        case '"' if !inS => inD = !inD
        case ':' if !inS && !inD &&
            (i == s.length - 1 || s.charAt(i + 1) == ' ') =>
          return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  private def unquote(s: String): String =
    if (s.length >= 2 &&
        ((s.head == '\'' && s.last == '\'') ||
          (s.head == '"' && s.last == '"'))) s.substring(1, s.length - 1)
    else s
}
