package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.WordShape

/** Per-token data-line generators for the remaining five models
  * (reference `models/{fulltext,citation,name,affiliation_address,
  * reference_segmenter}/data.py`) sharing one context pass: every
  * context column is a window over the `doc_id` partitioning computed
  * once, then each model is just an ordered column list — the reference
  * recomputes the context per model per document
  * (`models/data.py:700-770`); here the context DataFrame is reusable
  * across models over the same sub-document.
  *
  * Lexicon-backed features (first/last name, country) take broadcast
  * membership sets; absent lexica degrade to '0' exactly like the
  * reference with unconfigured lookups.
  */
object ModelDataGenerators {

  final case class Lexica(
      firstNames: Set[String] = Set.empty,
      lastNames: Set[String] = Set.empty,
      countries: Set[String] = Set.empty)

  private val pos = Seq(col("page_idx"), col("block_idx"), col("line_idx"), col("token_idx"))

  /** Shared context columns (models/data.py:714-770). */
  def context(tokens: DataFrame): DataFrame = {
    val byLine = Window.partitionBy("doc_id", "page_idx", "block_idx", "line_idx")
    val byLineOrdered = byLine.orderBy(col("token_idx"))
    val byBlock = Window.partitionBy("doc_id", "page_idx", "block_idx")
    val byDoc = Window.partitionBy("doc_id")
    val docOrder = byDoc.orderBy(pos: _*)

    // Optimization round r16 (the HeaderFeatures discipline, values
    // unchanged): doc-level windows FIRST so one hash(doc_id) exchange
    // serves every narrower window; unordered aggregates ride the
    // ordered spec of their level with an unbounded-both-sides frame
    // (one buffering Window operator per level); the sticky-indent
    // join is computed inline on token rows (events fire only at a
    // line's first token, and the doc-ordered previous row carries the
    // previous line's start x because line_start_x is constant per
    // line).
    val fullFrame = (w: org.apache.spark.sql.expressions.WindowSpec) =>
      w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val byBlockOrd = byBlock.orderBy(col("line_idx"))
    val withCtx = tokens
      .withColumn("prev_family", lag(col("font.font_family"), 1).over(docOrder))
      .withColumn("prev_size", lag(col("font.font_size"), 1).over(docOrder))
      .withColumn("prev_any", lag(lit(1), 1).over(docOrder))
      .withColumn("max_fs", max(col("font.font_size")).over(fullFrame(docOrder)))
      .withColumn("doc_tok_i", row_number().over(docOrder) - 1)
      .withColumn("doc_tok_n", count(lit(1)).over(fullFrame(docOrder)))
      .withColumn("line_i", dense_rank().over(byBlockOrd) - 1)
      .withColumn("line_n",
        size(collect_set(col("line_idx")).over(fullFrame(byBlockOrd))))
      .withColumn("tok_i", row_number().over(byLineOrdered) - 1)
      .withColumn("tok_n", count(lit(1)).over(fullFrame(byLineOrdered)))
      // concatenated line text without whitespace + char offsets
      .withColumn("line_char_len",
        sum(length(col("text"))).over(fullFrame(byLineOrdered)))
      .withColumn("line_tok_pos", coalesce(sum(length(col("text"))).over(
        byLineOrdered.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("max_line_char_len",
        max(col("line_char_len")).over(fullFrame(docOrder)))
      .withColumn("line_concat_text",
        concat_ws("", sort_array(collect_list(struct(col("token_idx"), col("text")))
          .over(fullFrame(byLineOrdered))).getField("text")))
      .withColumn("line_start_x",
        first(col("coords.x")).over(byLineOrdered))
      .withColumn("char_w",
        first(col("coords.width") / greatest(length(col("text")), lit(1)))
          .over(byLineOrdered))

    // sticky indentation (LineIndentationStatusFeature), inline
    withCtx
      .withColumn("prev_row_x", lag(col("line_start_x"), 1).over(docOrder))
      .withColumn("indent_event",
        when(col("tok_i") === 0 && col("prev_row_x").isNotNull &&
          col("line_start_x") - col("prev_row_x") > col("char_w"), lit(true))
        .when(col("tok_i") === 0 && col("prev_row_x").isNotNull &&
          col("prev_row_x") - col("line_start_x") > col("char_w"), lit(false)))
      .withColumn("is_indented",
        coalesce(last(col("indent_event"), ignoreNulls = true).over(
          docOrder.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
          lit(false)))
      .drop("prev_row_x", "indent_event")
  }

  // ------------------------------------------------ shared feature exprs

  private def boolStr(c: Column): Column = when(c, "1").otherwise("0")
  private val t = col("text")

  private def digitContains = when(t.rlike("^[0-9]+$"), "ALLDIGIT")
    .when(t.rlike("[0-9]"), "CONTAINSDIGITS").otherwise("NODIGIT")
  private def digitContain = when(t.rlike("^[0-9]+$"), "ALLDIGIT")
    .when(t.rlike("[0-9]"), "CONTAINDIGIT").otherwise("NODIGIT")
  private def capAllcap = when(digitContains === "ALLDIGIT", "NOCAPS")
    .when(length(t) > 0 && !t.rlike("\\p{Ll}"), "ALLCAP")
    .when(t.rlike("^\\p{Lu}"), "INITCAP").otherwise("NOCAPS")
  private def capAllcaps = when(capAllcap === "ALLCAP", "ALLCAPS").otherwise(capAllcap)
  private def punctType = when(t.isin("(", "["), "OPENBRACKET")
    .when(t.isin(")", "]"), "ENDBRACKET")
    .when(t === ".", "DOT").when(t === ",", "COMMA")
    .when(t.isin("-", "–"), "HYPHEN")
    .when(t.isin("\"", "'", "`", "’"), "QUOTE")
    .when(t.rlike("^[,:;?.]+$"), "PUNCT").otherwise("NOPUNCT")
  private def fontStatus = when(col("prev_any").isNull, "NEWFONT")
    .when(col("prev_family") <=> col("font.font_family"), "SAMEFONT")
    .otherwise("NEWFONT")
  private def fontSizeF = when(col("prev_any").isNull, "HIGHERFONT")
    .when(col("prev_size").isNull || col("font.font_size").isNull ||
      col("prev_size") === 0.0 || col("font.font_size") === 0.0, "HIGHERFONT")
    .when(col("prev_size") < col("font.font_size"), "HIGHERFONT")
    .when(col("prev_size") > col("font.font_size"), "LOWERFONT")
    .otherwise("SAMEFONTSIZE")
  private def lineStatusEnd = when(col("tok_i") === col("tok_n") - 1, "LINEEND")
    .when(col("tok_i") === 0, "LINESTART").otherwise("LINEIN")
  private def lineStatusStart = when(col("tok_i") === 0, "LINESTART")
    .when(col("tok_i") === col("tok_n") - 1, "LINEEND").otherwise("LINEIN")
  private def blockStatusEnd =
    when(col("line_i") === col("line_n") - 1 && lineStatusEnd === "LINEEND", "BLOCKEND")
      .when(col("line_i") === 0 && lineStatusEnd === "LINESTART", "BLOCKSTART")
      .otherwise("BLOCKIN")
  private def blockStatusStart =
    when(col("line_i") === 0 && lineStatusStart === "LINESTART", "BLOCKSTART")
      .when(col("line_i") === col("line_n") - 1 && lineStatusStart === "LINEEND", "BLOCKEND")
      .otherwise("BLOCKIN")
  private def alignment = when(col("is_indented"), "LINEINDENT").otherwise("ALIGNEDLEFT")
  private def lexFlag(words: Set[String]): Column =
    if (words.isEmpty) lit("0") else boolStr(lower(t).isin(words.toSeq: _*))
  private def prefixes = Seq(substring(t, 1, 1), substring(t, 1, 2),
    substring(t, 1, 3), substring(t, 1, 4))
  private def suffixes = Seq(substring(t, -1, 1), substring(t, -2, 2),
    substring(t, -3, 3), substring(t, -4, 4))
  private val ProfileChars =
    "(（[ •*,:;?.!/)）-−–‐«»„\"“”‘’'`$#@]*♦♥♣♠ ".filterNot(_.isWhitespace)
  private def lineRawProfile = regexp_replace(col("line_concat_text"),
    "[^" + java.util.regex.Pattern.quote(ProfileChars) + "]", "")
  private def lineProfile = when(lineRawProfile === "", "no").otherwise(lineRawProfile)

  private def assemble(ctx: DataFrame, features: Seq[Column], n: Int): DataFrame = {
    require(features.size == n, s"expected $n features, got ${features.size}")
    ctx.select((Seq(col("doc_id")) ++ pos ++
      Seq(col("text"), col("whitespace"),
        concat_ws(" ", (t +: features): _*).as("data_line"))): _*)
  }

  // ------------------------------------------------------- per model

  /** fulltext: 27 features (models/fulltext/data.py:15-43). */
  def fulltextDataLines(tokens: DataFrame): DataFrame =
    assemble(context(tokens), Seq(
      lower(t)) ++ prefixes ++ suffixes ++ Seq(
      blockStatusStart, lineStatusStart, alignment, fontStatus, fontSizeF,
      boolStr(col("font.is_bold")), boolStr(col("font.is_italics")),
      capAllcap, digitContains, boolStr(length(t) === 1), punctType,
      lit("0"), lit("0"), lit("0"), lit("UNKNOWN"), lit("0"),
      boolStr(col("font.is_superscript"))), 26)

  /** citation: 30 features (models/citation/data.py:15-46). */
  def citationDataLines(tokens: DataFrame, lexica: Lexica = Lexica()): DataFrame =
    assemble(context(tokens), Seq(
      lower(t)) ++ prefixes ++ suffixes ++ Seq(
      lineStatusEnd, capAllcap, digitContains, boolStr(length(t) === 1),
      lit("0"), lit("0"),
      lexFlag(lexica.firstNames), lexFlag(lexica.lastNames),
      lit("0"), lit("0"), lit("0"), lit("0"), lit("0"), lit("0"), lit("0"),
      lit("0"), lit("0"), punctType,
      SegmentationFeatures.linearScalingInt(
        col("doc_tok_i"), col("doc_tok_n"), 12).cast("string"),
      lit("0")), 29)

  /** name: 21 features (models/name/data.py:15-37). */
  def nameDataLines(tokens: DataFrame, lexica: Lexica = Lexica()): DataFrame =
    assemble(context(tokens), Seq(
      lower(t)) ++ prefixes ++ suffixes ++ Seq(
      lineStatusEnd, capAllcap, digitContains, boolStr(length(t) === 1),
      lit("0"), lexFlag(lexica.firstNames), lexFlag(lexica.lastNames),
      lit("0"), lit("0"), punctType, lit("0")), 20)

  /** affiliation_address: 22 features
    * (models/affiliation_address/data.py:17-43; LINEEND dummy per
    * GROBID #796). */
  def affiliationDataLines(tokens: DataFrame, lexica: Lexica = Lexica()): DataFrame =
    assemble(context(tokens), Seq(
      lower(t)) ++ prefixes ++ suffixes ++ Seq(
      lit("LINEEND"), capAllcaps, digitContain, boolStr(length(t) === 1),
      lit("0"), lit("0"), lexFlag(lexica.firstNames), lit("0"),
      lexFlag(lexica.countries), punctType,
      WordShape.word_shape(t), lit("0")), 21)

  /** reference_segmenter: 28 features
    * (models/reference_segmenter/data.py:15-44). */
  def referenceSegmenterDataLines(tokens: DataFrame,
      lexica: Lexica = Lexica()): DataFrame =
    assemble(context(tokens), Seq(
      lower(t)) ++ prefixes ++ suffixes ++ Seq(
      lineStatusEnd, alignment, capAllcap, digitContains,
      boolStr(length(t) === 1),
      lit("0"), lit("0"), lexFlag(lexica.firstNames), lit("0"),
      lit("0"), lit("0"), lit("0"),
      lineProfile,
      SegmentationFeatures.linearScalingInt(
        col("line_tok_pos"), col("line_char_len"), 10).cast("string"),
      SegmentationFeatures.linearScalingInt(
        col("line_char_len"), col("max_line_char_len"), 10).cast("string"),
      blockStatusEnd,
      least(length(lineRawProfile), lit(10)).cast("string"),
      lit("0")), 27)
}
