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
  * and its successor (title + authors region) → `<header>`, everything
  * else → `<body>` — the line-level segmentation the reference's
  * segmentation model performs (`processor.py:191-197`) as a
  * deterministic stand-in.
  */
final class SegmentationRuleLabeler extends SequenceLabeler {
  import org.apache.spark.sql.expressions.Window

  override def label(tokens: DataFrame): DataFrame = {
    val docW = Window.partitionBy("doc_id")
    val blockW = Window.partitionBy("doc_id", "page_idx", "block_idx")
    val withMax = tokens
      .withColumn("_max_fs", max(col("font.font_size")).over(docW))
      .withColumn("_block_max_fs", max(col("font.font_size")).over(blockW))
    val isTitleBlock = col("page_idx") === 0 && col("_block_max_fs") === col("_max_fs")
    val titleBlockIdx = min(when(isTitleBlock, col("block_idx"))).over(
      Window.partitionBy("doc_id", "page_idx"))
    val isHeader = col("page_idx") === 0 && col("_title_block").isNotNull &&
      col("block_idx") <= col("_title_block") + 1
    val isFirst = col("line_idx") === 0 && col("token_idx") === 0
    withMax
      .withColumn("_title_block", titleBlockIdx)
      .withColumn("label",
        when(isHeader, when(isFirst, "B-<header>").otherwise("I-<header>"))
          .otherwise(when(isFirst, "B-<body>").otherwise("I-<body>")))
      .drop("_max_fs", "_block_max_fs", "_title_block")
  }
}

/** Body-stage rule labeler (fulltext-model stand-in): the first line of
  * each block is a `<section>` heading, every other line is a
  * `<paragraph>` span (one span per line — consecutive paragraph spans
  * start new paragraphs in the fulltext fold, matching the reference's
  * per-line labeling granularity).
  */
final class BodyRuleLabeler extends SequenceLabeler {
  override def label(tokens: DataFrame): DataFrame =
    tokens.withColumn("label",
      when(col("line_idx") === 0,
        when(col("token_idx") === 0, "B-<section>").otherwise("I-<section>"))
        .otherwise(
          when(col("token_idx") === 0, "B-<paragraph>").otherwise("I-<paragraph>")))
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
