package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence-labeler abstraction (SURVEY.md §7 step 5).
  *
  * The reference runs Wapiti CRF as a persistent subprocess
  * (`models/wapiti_model_impl.py:25-164`) or DELFT in-process; both are
  * per-token-sequence taggers. The engine isolates that behind this
  * trait: input is the token table (with a `features` column), output
  * adds a BIO `label` column. Backends:
  * - [[ScriptedLabeler]]: deterministic label map (the reference's
  *   `tests/processors/fulltext/model_mocks.py` pattern) — broadcast
  *   join on the positional key; drives all pipeline tests.
  * - [[RuleLabeler]]: heuristic layout rules, good enough to exercise
  *   the full pipeline without model artifacts (zero-egress build).
  * - A Wapiti/ONNX backend plugs in as `mapPartitions` with an
  *   executor-local subprocess/session; same contract.
  */
trait SequenceLabeler {
  def label(tokens: DataFrame): DataFrame
}

/** Shared sequence scoping for the model-backed labelers
  * ([[CrfLabeler]]/[[WapitiLabeler]]/[[NeuralLabeler]]): project the
  * labeling columns, shuffle each SEQUENCE onto one partition, sort it
  * contiguous, and group the partition iterator back into sequences.
  *
  * Two scopes:
  *  - '''document''' (default) — one sequence per `doc_id`, the
  *    reference's own unit (`models/model.py:289-331` batches per
  *    document).
  *  - '''page''' (`perPage = true`) — one sequence per
  *    `(doc_id, page_idx)`: the giant-document skew mitigation
  *    (SURVEY §4). A 10k-page PDF is ONE task under document scope and
  *    stalls its stage at 100× scale; page scope fans it out across
  *    the cluster. Viterbi context then restarts at page boundaries —
  *    for the segmentation model, whose lines carry their page context
  *    in the feature vector itself (relative page position, repetitive-
  *    pattern flags), LabelerParitySpec pins page-scoped output ≡
  *    document-scoped on a multi-page fixture; models whose spans
  *    legitimately cross pages (fulltext) should stay doc-scoped.
  */
private[pipeline] object SequenceScope {

  type In = (Long, Int, Int, Int, Int, String, String, String)

  /** Repartition on the scope key and sort sequence-contiguous. */
  def contiguous(tokens: DataFrame, fCol: String,
      perPage: Boolean): DataFrame = {
    val cols = Seq("doc_id", "page_idx", "block_idx", "line_idx",
      "token_idx", "text", "whitespace", fCol)
    val keys = if (perPage) Seq(col("doc_id"), col("page_idx"))
      else Seq(col("doc_id"))
    tokens.select(cols.map(col): _*)
      .repartition(keys: _*)
      .sortWithinPartitions("doc_id", "page_idx", "block_idx", "line_idx",
        "token_idx")
  }

  /** Group a sequence-contiguous partition iterator into one Vector per
    * sequence; only the current sequence is materialized. */
  def sequences(it: Iterator[In], perPage: Boolean): Iterator[Vector[In]] = {
    val src = it.buffered
    new Iterator[Vector[In]] {
      override def hasNext: Boolean = src.hasNext
      override def next(): Vector[In] = {
        val d = src.head._1
        val p = src.head._2
        val b = Vector.newBuilder[In]
        while (src.hasNext && src.head._1 == d &&
          (!perPage || src.head._2 == p)) b += src.next()
        b.result()
      }
    }
  }
}

/** Fixed (doc_id, page, block, line, token) → BIO label map. Unlisted
  * tokens get "O". */
final class ScriptedLabeler(spark: SparkSession,
    labels: Seq[((Long, Int, Int, Int, Int), String)]) extends SequenceLabeler {

  override def label(tokens: DataFrame): DataFrame = {
    import spark.implicits._
    val lm = labels.map { case ((d, p, b, l, t), lab) => (d, p, b, l, t, lab) }
      .toDF("doc_id", "page_idx", "block_idx", "line_idx", "token_idx", "label_s")
    tokens.join(broadcast(lm),
        Seq("doc_id", "page_idx", "block_idx", "line_idx", "token_idx"), "left")
      .withColumn("label", coalesce(col("label_s"), lit("O")))
      .drop("label_s")
  }
}

/** Segmentation-stage rule labeler: the largest-font block on page 0
  * and its successor (title + authors region) → `<header>`; a block
  * opening with an "Acknowledgement(s)"/"Acknowledgment(s)" heading →
  * `<acknowledgement>`; one opening "Appendix"/"Annex" → `<annex>`;
  * everything else → `<body>` — the line-level segmentation label set
  * the reference's segmentation model emits (`processor.py:205-225`
  * consumes exactly these views) as a deterministic stand-in.
  */
final class SegmentationRuleLabeler extends SequenceLabeler {
  import org.apache.spark.sql.expressions.Window

  override def label(tokens: DataFrame): DataFrame = {
    val docW = Window.partitionBy("doc_id")
    val blockW = Window.partitionBy("doc_id", "page_idx", "block_idx")
    val withMax = tokens
      .withColumn("_max_fs", max(col("font.font_size")).over(docW))
      .withColumn("_block_max_fs", max(col("font.font_size")).over(blockW))
      .withColumn("_block_first", max(when(
        col("line_idx") === 0 && col("token_idx") === 0, col("text"))).over(blockW))
    val isTitleBlock = col("page_idx") === 0 && col("_block_max_fs") === col("_max_fs")
    val titleBlockIdx = min(when(isTitleBlock, col("block_idx"))).over(
      Window.partitionBy("doc_id", "page_idx"))
    val isHeader = col("page_idx") === 0 && col("_title_block").isNotNull &&
      col("block_idx") <= col("_title_block") + 1
    val isFirst = col("line_idx") === 0 && col("token_idx") === 0
    val backTag = when(
        col("_block_first").rlike("(?i)^acknowledge?ments?$"), "<acknowledgement>")
      .when(col("_block_first").rlike("(?i)^(appendix|annex)$"), "<annex>")
      .when(col("_block_first").rlike("(?i)^(references?|bibliography)$"),
        "<references>")
    withMax
      .withColumn("_title_block", titleBlockIdx)
      .withColumn("label",
        when(isHeader, when(isFirst, "B-<header>").otherwise("I-<header>"))
          .when(backTag.isNotNull,
            concat(when(isFirst, "B-").otherwise("I-"), backTag))
          .otherwise(when(isFirst, "B-<body>").otherwise("I-<body>")))
      .drop("_max_fs", "_block_max_fs", "_block_first", "_title_block")
  }
}

/** Reference-segmenter-stage rule labeler (reference_segmenter model
  * stand-in; the label set `models/reference_segmenter/extract.py`
  * consumes): within the `<references>` view, a leading numeric-marker
  * token run on a line (`1.`, `[1]`, `2)` — split by the retokenizer
  * into digit + punctuation tokens) is the `<label>`; the rest of the
  * line is one `<reference>` span. A line with no leading marker is a
  * whole `<reference>` — [[ModelExtractors.referenceSegmenterFold]]
  * demotes a first short one to the section heading.
  */
final class ReferenceSegmenterRuleLabeler extends SequenceLabeler {
  import org.apache.spark.sql.expressions.Window

  override def label(tokens: DataFrame): DataFrame = {
    val lineW = Window.partitionBy("doc_id", "page_idx", "block_idx", "line_idx")
    val markerish = col("text").rlike("^[0-9]+$|^[.)\\]\\[]$")
    val firstTok = max(when(col("token_idx") === 0, col("text"))).over(lineW)
    val secondTok = max(when(col("token_idx") === 1, col("text"))).over(lineW)
    // first token of the line that is NOT part of a numeric marker run
    val firstNonMarker = min(when(!markerish, col("token_idx"))).over(lineW)
    // a marker is a leading bare number (`1.`, `2)`) or a leading `[`
    // whose next token is a number (`[1]` — the retokenizer splits it)
    val hasLabel = firstTok.rlike("^[0-9]+$") ||
      (firstTok === "[" && secondTok.rlike("^[0-9]+$"))
    tokens.withColumn("label",
      when(hasLabel && (firstNonMarker.isNull || col("token_idx") < firstNonMarker),
        when(col("token_idx") === 0, "B-<label>").otherwise("I-<label>"))
        .when(hasLabel,
          when(col("token_idx") === firstNonMarker, "B-<reference>")
            .otherwise("I-<reference>"))
        .otherwise(when(col("token_idx") === 0, "B-<reference>")
          .otherwise("I-<reference>")))
  }
}

/** Body-stage rule labeler (fulltext-model stand-in): the first line of
  * each block is a `<section>` heading, every other line is a
  * `<paragraph>` span (one span per line — consecutive paragraph spans
  * start new paragraphs in the fulltext fold, matching the reference's
  * per-line labeling granularity). Figure/table awareness mirroring the
  * fulltext model's label set (`models/fulltext/extract.py`):
  * - a line starting `Figure <n>` / `Table <n>` is a caption →
  *   `<figure>`/`<table>` span over the whole line;
  * - `Figure|Fig.|Table` + number mid-line is a citation marker →
  *   `<figure_marker>`/`<table_marker>` span over the two tokens.
  */
final class BodyRuleLabeler extends SequenceLabeler {
  import org.apache.spark.sql.expressions.Window

  override def label(tokens: DataFrame): DataFrame = {
    val lineW = Window.partitionBy("doc_id", "page_idx", "block_idx", "line_idx")
    val lineOrd = lineW.orderBy("token_idx")
    val firstTok = max(when(col("token_idx") === 0, col("text"))).over(lineW)
    val secondTok = max(when(col("token_idx") === 1, col("text"))).over(lineW)
    val nextTok = lead(col("text"), 1).over(lineOrd)
    val prevTok = lag(col("text"), 1).over(lineOrd)

    val num = "^[0-9]+[.,:)]?$"
    val captionTag = when(firstTok === "Figure" && secondTok.rlike(num), "<figure>")
      .when(firstTok === "Table" && secondTok.rlike(num), "<table>")
    val isFigHead = col("token_idx") > 0 &&
      col("text").rlike("^(Figure|Fig\\.?)$") && nextTok.rlike(num)
    val isTabHead = col("token_idx") > 0 &&
      col("text") === "Table" && nextTok.rlike(num)
    val isFigTail = col("token_idx") > 1 && col("text").rlike(num) &&
      prevTok.rlike("^(Figure|Fig\\.?)$")
    val isTabTail = col("token_idx") > 1 && col("text").rlike(num) &&
      prevTok === "Table"
    // bracketed reference citations "[ n ]" (the retokenizer splits the
    // brackets off) → <citation_marker>, the fulltext model's bibr label
    val nextTok2 = lead(col("text"), 2).over(lineOrd)
    val prevTok2 = lag(col("text"), 2).over(lineOrd)
    val bareNum = "^[0-9]+$"
    val isCitOpen = col("text") === "[" && nextTok.rlike(bareNum) && nextTok2 === "]"
    val isCitNum = prevTok === "[" && col("text").rlike(bareNum) && nextTok === "]"
    val isCitClose = col("text") === "]" && prevTok.rlike(bareNum) && prevTok2 === "["

    tokens.withColumn("label",
      when(captionTag.isNotNull,
        concat(when(col("token_idx") === 0, "B-").otherwise("I-"), captionTag))
        .when(isFigHead, "B-<figure_marker>")
        .when(isTabHead, "B-<table_marker>")
        .when(isFigTail, "I-<figure_marker>")
        .when(isTabTail, "I-<table_marker>")
        .when(isCitOpen, "B-<citation_marker>")
        .when(isCitNum || isCitClose, "I-<citation_marker>")
        .when(col("line_idx") === 0,
          when(col("token_idx") === 0, "B-<section>").otherwise("I-<section>"))
        .otherwise(
          when(col("token_idx") === 0, "B-<paragraph>").otherwise("I-<paragraph>")))
  }
}

/** Layout-heuristic labeler: largest-font tokens on the first page →
  * title; the following block → author; everything else O. Deterministic
  * and model-free — exercises exactly the segmentation→header flow
  * shape of the reference pipeline.
  */
final class RuleLabeler extends SequenceLabeler {
  import org.apache.spark.sql.expressions.Window

  override def label(tokens: DataFrame): DataFrame = {
    val docW = Window.partitionBy("doc_id")
    val titleBlockW = Window.partitionBy("doc_id", "page_idx", "block_idx")
    val withMax = tokens
      .withColumn("_max_fs", max(col("font.font_size")).over(docW))
      .withColumn("_block_max_fs", max(col("font.font_size")).over(titleBlockW))
    val isTitleBlock = col("page_idx") === 0 && col("_block_max_fs") === col("_max_fs")
    val titleBlockIdx = min(when(isTitleBlock, col("block_idx"))).over(
      Window.partitionBy("doc_id", "page_idx"))
    withMax
      .withColumn("_title_block", titleBlockIdx)
      .withColumn("label",
        when(col("page_idx") === 0 && col("block_idx") === col("_title_block"),
          when(col("block_idx").isNotNull && col("line_idx") === 0 && col("token_idx") === 0,
            "B-<title>").otherwise("I-<title>"))
        .when(col("page_idx") === 0 && col("block_idx") === col("_title_block") + 1,
          when(col("line_idx") === 0 && col("token_idx") === 0, "B-<author>")
            .otherwise("I-<author>"))
        .otherwise("O"))
      .drop("_max_fs", "_block_max_fs", "_title_block")
  }
}
