package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Segmentation model data lines: the exact 34-feature per-LINE vector
  * (reference `models/segmentation/data.py:38-299`, asserted width 34;
  * C6 punctuation profile, C15 repetitive patterns, C16 whole-line
  * feature, C17 assembly).
  *
  * All window functions share the `doc_id` partitioning (one shuffle);
  * the repetitive-pattern pass (C15) is the only extra exchange — a
  * groupBy on (doc, pattern) over first-lines-of-edge-blocks only,
  * broadcast-joined back.
  */
object SegmentationFeatures {

  private val lineKey = Seq(col("doc_id"), col("page_idx"), col("block_idx"), col("line_idx"))

  /** GROBID punctuation-profile character set (models/data.py:339). */
  private val PunctChars =
    "(（[ •*,:;?.!/)）-−–‐«»„\"“”‘’'`$#@]*♦♥♣♠ "

  /** feature_linear_scaling_int (models/data.py:119-128): pos>=total →
    * bin_count; pos<=0 → 0; else floor(pos/total*bins). */
  def linearScalingInt(pos: Column, total: Column, bins: Int): Column =
    when(pos >= total, bins).when(pos <= 0, 0)
      .otherwise(floor(pos * bins / total)).cast("int")

  /** get_text_pattern (segmentation/data.py:66-68). */
  def textPattern(c: Column): Column =
    lower(regexp_replace(c, "[^a-zA-Z ]", ""))

  /** One row per line with the 34-feature `data_line` column plus the
    * line keys. `useFirstTokenOfBlock` mirrors the Java-GROBID behavior
    * of taking the block's first token for font features.
    */
  def dataLines(tokens: DataFrame, useFirstTokenOfBlock: Boolean = true): DataFrame = {
    // ---- per-line rollup: text + selected-token attributes
    val tokensOrdered = struct(col("token_idx"), col("text"), col("whitespace"),
      col("font.font_family").as("font_family"), col("font.font_size").as("font_size"),
      col("font.is_bold").as("is_bold"), col("font.is_italics").as("is_italics"))
    val lines = tokens
      .groupBy(lineKey: _*)
      .agg(
        sort_array(collect_list(tokensOrdered)).as("toks"),
        count(lit(1)).as("n_tokens"))
      // join_layout_tokens: text+whitespace for all but the last token
      .withColumn("line_text", concat(
        concat_ws("", expr(
          "transform(slice(toks, 1, size(toks) - 1), t -> concat(t.text, t.whitespace))")),
        element_at(col("toks"), -1).getField("text")))
      .withColumn("first_tok", element_at(col("toks"), 1))
      .drop("toks")

    // ---- block/page/document aggregates
    val byBlock = Window.partitionBy("doc_id", "page_idx", "block_idx")
    val byPage = Window.partitionBy("doc_id", "page_idx")
    val byDoc = Window.partitionBy("doc_id")
    val docOrder = Window.partitionBy("doc_id")
      .orderBy(col("page_idx"), col("block_idx"), col("line_idx"))

    // Widest partition key FIRST (optimization round r16, the
    // HeaderFeatures discipline): the byDoc windows at the bottom force
    // ONE hash(doc_id) exchange that satisfies every narrower
    // (page/block) window's clustering requirement above it — the old
    // block → page → doc order re-exchanged the line table once per
    // widening key (guide §2.4). The docOrder sort is a superset
    // ordering of the page/block windows' requirements, so they add no
    // sort either. Window values don't depend on application order;
    // output is unchanged. `prev_tok` stays last (it reads `sel_tok`)
    // — hash(doc_id) is already established, so it re-exchanges
    // nothing.
    // Unordered aggregates ride the ordered spec of their partition
    // level with an unbounded-both-sides frame (identical values) so
    // WindowExec buffers each partition level once — the
    // HeaderFeatures r16 discipline.
    val fullFrame = (w: org.apache.spark.sql.expressions.WindowSpec) =>
      w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val byBlockOrd = byBlock.orderBy(col("line_idx"))
    val byPageOrd = byPage.orderBy(col("block_idx"))
    val withAgg = lines
      .withColumn("doc_token_count",
        sum(col("n_tokens")).over(fullFrame(docOrder)))
      .withColumn("doc_token_index",
        coalesce(sum(col("n_tokens")).over(
          docOrder.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("block_count",
        size(collect_set(col("block_idx")).over(fullFrame(byPageOrd))))
      .withColumn("block_index", dense_rank().over(byPageOrd) - 1)
      .withColumn("line_count", count(lit(1)).over(fullFrame(byBlockOrd)))
      .withColumn("line_index", row_number().over(byBlockOrd) - 1)
      .withColumn("max_block_line_len",
        max(length(col("line_text"))).over(fullFrame(byBlockOrd)))
      // selected token: block-first (Java GROBID) or line-first
      .withColumn("sel_tok",
        if (useFirstTokenOfBlock) first(col("first_tok")).over(
          byBlockOrd
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        else col("first_tok"))
      .withColumn("prev_tok", lag(col("sel_tok"), 1).over(docOrder))

    // ---- repetitive patterns (C15): first lines of the first two and
    // last blocks per page, pattern length >= 8, counted doc-wide
    val isCandidate = col("line_index") === 0 &&
      (col("block_index") < 2 || col("block_index") > col("block_count") - 2)
    val withPattern = withAgg.withColumn("pattern",
      when(isCandidate && length(textPattern(col("line_text"))) >= 8,
        textPattern(col("line_text"))))
    // Pattern counts as a WINDOW over (doc_id, pattern) instead of a
    // groupBy + join-back (optimization round r16): the aggregate
    // branch re-executed the whole line-rollup/window chain (no
    // common-subplan sharing) and the join added an exchange; the
    // window count is served by the hash(doc_id) clustering already
    // in place, zero extra passes. `count(pattern)` over the
    // null-pattern rows' partition never reaches the `is_rep` test
    // (guarded by isNotNull), matching the old left join's null →
    // false. Same values, CurationSpec/SegmentationFeaturesSpec pins.
    val byPatternOrd = Window.partitionBy("doc_id", "pattern")
      .orderBy(col("page_idx"), col("block_idx"), col("line_idx"))
    val withRep = withPattern
      .withColumn("pattern_n",
        when(col("pattern").isNotNull,
          count(lit(1)).over(fullFrame(byPatternOrd))))
      .withColumn("is_rep", coalesce(col("pattern_n") > 1, lit(false)))
      .withColumn("is_first_rep", col("is_rep") &&
        row_number().over(byPatternOrd) === 1)

    // ---- per-line feature columns
    // re-split of line_text on space/tab/formfeed/nbsp (data.py:209)
    val retok = split(col("line_text"), "[ \t\f ]")
    val tokenText = trim(element_at(retok, 1))
    val secondText = when(size(retok) >= 2, element_at(retok, 2)).otherwise(lit(""))
    val t = when(secondText =!= "", secondText).otherwise(tokenText)

    def boolStr(c: Column): Column = when(c, "1").otherwise("0")
    val digitF = when(tokenText.rlike("^[0-9]+$"), "ALLDIGIT")
      .when(tokenText.rlike("[0-9]"), "CONTAINSDIGITS").otherwise("NODIGIT")
    val capF = when(digitF === "ALLDIGIT", "NOCAPS")
      .when(length(tokenText) > 0 && !tokenText.rlike("\\p{Ll}"), "ALLCAP")
      .when(tokenText.rlike("^\\p{Lu}"), "INITCAP").otherwise("NOCAPS")
    val fontStatus = when(col("prev_tok").isNull, "NEWFONT")
      .when(col("prev_tok.font_family") <=> col("sel_tok.font_family"), "SAMEFONT")
      .otherwise("NEWFONT")
    val fontSizeF = when(col("prev_tok").isNull, "HIGHERFONT")
      .when(col("prev_tok.font_size").isNull || col("sel_tok.font_size").isNull ||
        col("prev_tok.font_size") === 0.0 || col("sel_tok.font_size") === 0.0, "HIGHERFONT")
      .when(col("prev_tok.font_size") < col("sel_tok.font_size"), "HIGHERFONT")
      .when(col("prev_tok.font_size") > col("sel_tok.font_size"), "LOWERFONT")
      .otherwise("SAMEFONTSIZE")
    val blockStatus = when(col("line_index") === 0, "BLOCKSTART")
      .when(col("line_index") === col("line_count") - 1, "BLOCKEND")
      .otherwise("BLOCKIN")
    val pageStatus =
      when(col("block_index") === 0 && col("line_index") === 0, "PAGESTART")
        .when(col("block_index") === col("block_count") - 1 &&
          col("line_index") === col("line_count") - 1, "PAGEEND")
        .otherwise("PAGEIN")
    // punctuation profile over the line text (space excluded by isspace)
    val rawProfile = regexp_replace(col("line_text"),
      "[^" + java.util.regex.Pattern.quote(PunctChars.filterNot(_.isWhitespace)) + "]", "")
    val profile = when(rawProfile === "", "no").otherwise(rawProfile)
    val wholeLine = regexp_replace(trim(col("line_text")), "[ \t]", " ")

    val features: Seq[Column] = Seq(
      tokenText, t, lower(tokenText),
      substring(tokenText, 1, 1), substring(tokenText, 1, 2),
      substring(tokenText, 1, 3), substring(tokenText, 1, 4),
      blockStatus, pageStatus, fontStatus, fontSizeF,
      boolStr(col("sel_tok.is_bold")), boolStr(col("sel_tok.is_italics")),
      capF, digitF, boolStr(length(tokenText) === 1),
      lit("0"), lit("0"), lit("0"), lit("0"), lit("0"), lit("0"), lit("0"),
      linearScalingInt(col("doc_token_index"), col("doc_token_count"), 12).cast("string"),
      lit("0"),
      profile, length(rawProfile).cast("string"),
      linearScalingInt(length(col("line_text")), col("max_block_line_len"), 10).cast("string"),
      lit("0"), lit("0"),
      boolStr(col("is_rep")), boolStr(col("is_first_rep")),
      lit("1"), wholeLine)
    require(features.size == 34)

    withRep.select(lineKey ++ Seq(col("line_text"),
      concat_ws(" ", features: _*).as("data_line")): _*)
  }
}
