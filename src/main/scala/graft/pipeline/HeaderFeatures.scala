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

    val withCtx = tokens
      .withColumn("tok_i", row_number().over(byLine.orderBy(col("token_idx"))) - 1)
      .withColumn("tok_n", count(lit(1)).over(byLine))
      .withColumn("line_i", dense_rank().over(byBlock.orderBy(col("line_idx"))) - 1)
      .withColumn("line_n", size(collect_set(col("line_idx")).over(byBlock)))
      .withColumn("prev_family", lag(col("font.font_family"), 1).over(docOrder))
      .withColumn("prev_size", lag(col("font.font_size"), 1).over(docOrder))
      .withColumn("prev_any", lag(lit(1), 1).over(docOrder))
      .withColumn("max_fs", max(col("font.font_size")).over(byDoc))
      // C12 sticky indentation: per line, compare first-token x to the
      // previous line's; the indent state carries forward until changed
      .withColumn("line_start_x",
        first(col("coords.x")).over(byLine.orderBy(col("token_idx"))))
      .withColumn("char_w",
        first(col("coords.width") / greatest(length(t), lit(1)))
          .over(byLine.orderBy(col("token_idx"))))

    val lineOrder = Window.partitionBy("doc_id")
      .orderBy(col("page_idx"), col("block_idx"), col("line_idx"))
    val lineLevel = withCtx.filter(col("tok_i") === 0)
      .withColumn("prev_line_x", lag(col("line_start_x"), 1).over(lineOrder))
      .withColumn("indent_event",
        when(col("prev_line_x").isNotNull &&
          col("line_start_x") - col("prev_line_x") > col("char_w"), lit(true))
        .when(col("prev_line_x").isNotNull &&
          col("prev_line_x") - col("line_start_x") > col("char_w"), lit(false)))
      .withColumn("is_indented",
        coalesce(last(col("indent_event"), ignoreNulls = true).over(
          lineOrder.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
          lit(false)))
      .select(col("doc_id"), col("page_idx"), col("block_idx"), col("line_idx"),
        col("is_indented"))

    val ctx = withCtx.join(lineLevel,
      Seq("doc_id", "page_idx", "block_idx", "line_idx"), "left")

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
