package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Header model data lines: the exact 32-feature per-TOKEN vector
  * (reference `models/header/data.py:15-50` +
  * `models/data.py` context helpers). Same window discipline as the
  * segmentation generator: every feature shares the `doc_id`
  * partitioning, one shuffle total.
  */
object HeaderFeatures {

  private val pos = Seq(col("page_idx"), col("block_idx"), col("line_idx"), col("token_idx"))

  def dataLines(tokens: DataFrame): DataFrame = {
    val byLine = Window.partitionBy("doc_id", "page_idx", "block_idx", "line_idx")
    val byBlock = Window.partitionBy("doc_id", "page_idx", "block_idx")
    val byDoc = Window.partitionBy("doc_id")
    val docOrder = byDoc.orderBy(pos: _*)

    val t = col("text")
    def boolStr(c: Column): Column = when(c, "1").otherwise("0")

    // Widest partition key FIRST (optimization round r16): the byDoc
    // windows at the bottom of the plan force ONE hash(doc_id)
    // exchange, and hash(doc_id) satisfies the clustering requirement
    // of every narrower (page/block/line) window above it — applied in
    // the old order (line → block → doc) EnsureRequirements inserted a
    // fresh exchange per widening key (hash(doc,page,block,line) does
    // not satisfy clustering by (doc,page,block)), three shuffles of
    // the full token table instead of one (guide §2.4). The byDoc sort
    // (doc, page, block, line, token) is a superset ordering of every
    // later window's requirement, so the narrower windows add no sort
    // either. Window values are order-independent of application
    // order; output is unchanged.
    // Every aggregate that the old code ran over an UNORDERED window
    // spec (max_fs, line_n, tok_n) now rides the ORDERED spec of its
    // partition level with an explicit unbounded-both-sides frame —
    // the full-partition frame computes the identical value, and
    // WindowExec groups frames by (partitionSpec, orderSpec), so each
    // partition level buffers and copies the 470k-token table ONCE
    // instead of twice (6 Window operators → 3; the buffer copy, not
    // the functions, is the per-row cost at this width).
    val fullFrame = (w: org.apache.spark.sql.expressions.WindowSpec) =>
      w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val byBlockOrd = byBlock.orderBy(col("line_idx"))
    val byLineOrd = byLine.orderBy(col("token_idx"))
    val withCtx = tokens
      .withColumn("prev_family", lag(col("font.font_family"), 1).over(docOrder))
      .withColumn("prev_size", lag(col("font.font_size"), 1).over(docOrder))
      .withColumn("prev_any", lag(lit(1), 1).over(docOrder))
      .withColumn("max_fs", max(col("font.font_size")).over(fullFrame(docOrder)))
      .withColumn("line_i", dense_rank().over(byBlockOrd) - 1)
      .withColumn("line_n",
        size(collect_set(col("line_idx")).over(fullFrame(byBlockOrd))))
      .withColumn("tok_i", row_number().over(byLineOrd) - 1)
      .withColumn("tok_n", count(lit(1)).over(fullFrame(byLineOrd)))
      // C12 sticky indentation: per line, compare first-token x to the
      // previous line's; the indent state carries forward until changed
      .withColumn("line_start_x",
        first(col("coords.x")).over(byLine.orderBy(col("token_idx"))))
      .withColumn("char_w",
        first(col("coords.width") / greatest(length(t), lit(1)))
          .over(byLine.orderBy(col("token_idx"))))

    // C12 sticky indentation INLINE on token rows (optimization round
    // r16): the previous form filtered a one-row-per-line frame, ran
    // doc-ordered lag/last windows on it, and joined it back — Spark
    // has no common-subplan sharing, so that branch re-scanned the
    // token hub and re-ran its window chain (2 extra exchanges + a
    // join per query). Equivalent inline: `line_start_x` is constant
    // per line, so at a line's FIRST token the doc-ordered previous
    // row (the previous line's last token) carries the previous line's
    // start x — indent events fire only there, and the sticky
    // `last(ignoreNulls)` over doc order gives every token of line L
    // the latest event at or before L exactly like the per-line join
    // did. Same hash(doc_id) clustering, zero new exchanges.
    val ctx = withCtx
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

    val lineStatus = when(col("tok_i") === col("tok_n") - 1, "LINEEND")
      .when(col("tok_i") === 0, "LINESTART").otherwise("LINEIN")
    val blockStatus =
      when(col("line_i") === col("line_n") - 1 && lineStatus === "LINEEND", "BLOCKEND")
        .when(col("line_i") === 0 && lineStatus === "LINESTART", "BLOCKSTART")
        .otherwise("BLOCKIN")
    val alignment = when(col("is_indented"), "LINEINDENT").otherwise("ALIGNEDLEFT")
    val fontStatus = when(col("prev_any").isNull, "NEWFONT")
      .when(col("prev_family") <=> col("font.font_family"), "SAMEFONT")
      .otherwise("NEWFONT")
    val fontSizeF = when(col("prev_any").isNull, "HIGHERFONT")
      .when(col("prev_size").isNull || col("font.font_size").isNull ||
        col("prev_size") === 0.0 || col("font.font_size") === 0.0, "HIGHERFONT")
      .when(col("prev_size") < col("font.font_size"), "HIGHERFONT")
      .when(col("prev_size") > col("font.font_size"), "LOWERFONT")
      .otherwise("SAMEFONTSIZE")
    val digitF = when(t.rlike("^[0-9]+$"), "ALLDIGIT")
      .when(t.rlike("[0-9]"), "CONTAINSDIGITS").otherwise("NODIGIT")
    val capF = when(digitF === "ALLDIGIT", "NOCAPS")
      .when(length(t) > 0 && !t.rlike("\\p{Ll}"), "ALLCAP")
      .when(t.rlike("^\\p{Lu}"), "INITCAP").otherwise("NOCAPS")
    val punctType = when(t.isin("(", "["), "OPENBRACKET")
      .when(t.isin(")", "]"), "ENDBRACKET")
      .when(t === ".", "DOT").when(t === ",", "COMMA")
      .when(t.isin("-", "–"), "HYPHEN")
      .when(t.isin("\"", "'", "`", "’"), "QUOTE")
      .when(t.rlike("^[,:;?.]+$"), "PUNCT")
      .otherwise("NOPUNCT")
    val isLargest = boolStr(col("font.font_size").isNotNull &&
      col("font.font_size") === col("max_fs"))

    val features: Seq[Column] = Seq(
      t, lower(t),
      substring(t, 1, 1), substring(t, 1, 2), substring(t, 1, 3), substring(t, 1, 4),
      substring(t, -1, 1), substring(t, -2, 2), substring(t, -3, 3), substring(t, -4, 4),
      blockStatus, lineStatus, alignment, fontStatus, fontSizeF,
      boolStr(col("font.is_bold")), boolStr(col("font.is_italics")),
      capF, digitF, boolStr(length(t) === 1),
      lit("0"), lit("0"), lit("0"), lit("0"), lit("0"), lit("0"), lit("0"),
      punctType, isLargest,
      lit("0"), // GROBID #795: smallest-font dummy
      lit("1"), // GROBID #795: larger-than-average dummy defaults to 1
      lit("0")) // dummy label
    require(features.size == 32)

    ctx.select((Seq(col("doc_id")) ++ pos ++
      Seq(col("text"), col("whitespace"), col("font"), col("coords"),
        concat_ws(" ", features: _*).as("data_line"))): _*)
  }
}
