package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BIO span grouping (SURVEY.md D4; reference
  * `models/model.py:61-79` `iter_entities_including_other` +
  * `utils/labels.py:4-16`): a new span starts on a `B-` prefix or on a
  * stripped-tag change; `O` runs form spans too.
  *
  * Sessionization pattern: boundary flag via lag, running sum assigns
  * span ids, then one groupBy — a single shuffle on `doc_id`, and the
  * span id is deterministic (ordered by position, not
  * `monotonically_increasing_id`).
  */
object BioSpans {

  private val pos = Seq(col("page_idx"), col("block_idx"), col("line_idx"), col("token_idx"))

  /** strip_tag_prefix (utils/labels.py:4-8). */
  def strippedTag(label: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(label.startsWith("B-") || label.startsWith("I-"), substring(label, 3, Int.MaxValue))
      .otherwise(label)

  /** Adds `tag` (stripped label) and `span_id` columns. */
  def assignSpanIds(labeled: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy(pos: _*)
    val run = byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    labeled
      .withColumn("tag", strippedTag(col("label")))
      .withColumn("_new_span",
        when(col("label").startsWith("B-") ||
          lag(col("tag"), 1).over(byDoc).isNull ||
          col("tag") =!= lag(col("tag"), 1).over(byDoc), 1).otherwise(0))
      .withColumn("span_id", sum(col("_new_span")).over(run))
      .drop("_new_span")
  }

  /** Collapse to one row per span: ordered text reassembly
    * (`text + whitespace` per token, trailing whitespace trimmed —
    * LayoutBlock text semantics) + first-token position keys.
    */
  def spans(labeled: DataFrame): DataFrame = {
    // tolerate geometry-less token frames (synthetic labels in tests,
    // re-labeled text): a typed null struct merges to a null coords
    val withGeom =
      if (labeled.columns.contains("coords")) labeled
      else labeled.withColumn("coords", lit(null).cast(
        "struct<x:double,y:double,width:double,height:double,page_number:int>"))
    val withIds = assignSpanIds(withGeom)
    val collected = withIds
      .groupBy("doc_id", "span_id")
      .agg(
        first(col("tag")).as("tag"),
        array_sort(collect_list(struct(
          col("page_idx"), col("block_idx"), col("line_idx"), col("token_idx"),
          col("text"), col("whitespace"), col("coords")))).as("_toks"),
        min(struct(pos: _*)).as("first_pos"),
        count(lit(1)).as("n_tokens"))
    // merged per-page boxes → TEI coords string (Coordinates.formatMerged
    // twin; tokens are page-monotone in reading order, so grouping by
    // page equals the reference's consecutive-same-page merge)
    val boxed = transform(
      filter(col("_toks"), t => t.getField("coords").isNotNull),
      t => t.getField("coords"))
    val mergedParts = transform(
      array_distinct(transform(boxed, c => c.getField("page_number"))),
      p => {
        val onPage = filter(boxed, c => c.getField("page_number") === p)
        val x = array_min(transform(onPage, c => c.getField("x")))
        val y = array_min(transform(onPage, c => c.getField("y")))
        val x2 = array_max(transform(onPage,
          c => c.getField("x") + c.getField("width")))
        val y2 = array_max(transform(onPage,
          c => c.getField("y") + c.getField("height")))
        format_string("%d,%.2f,%.2f,%.2f,%.2f", p, x, y, x2 - x, y2 - y)
      })
    collected
      .select(col("doc_id"), col("span_id"), col("tag"),
        rtrim(concat_ws("", transform(col("_toks"),
          t => concat(t.getField("text"), t.getField("whitespace"))))).as("text"),
        col("first_pos.page_idx").as("first_page_idx"),
        col("first_pos.block_idx").as("first_block_idx"),
        col("first_pos.line_idx").as("first_line_idx"),
        col("first_pos.token_idx").as("first_token_idx"),
        col("n_tokens"),
        when(size(mergedParts) > 0, array_join(mergedParts, ";")).as("coords"))
  }

  /** B4 filter-by-label: keep tokens of the given stripped tags —
    * sub-document views are just predicates on the token table
    * (replaces the reference's id()-set filtering,
    * models/model.py:112-171). */
  def filterByTags(labeled: DataFrame, tags: Seq[String]): DataFrame =
    labeled.filter(strippedTag(col("label")).isin(tags: _*))
}
