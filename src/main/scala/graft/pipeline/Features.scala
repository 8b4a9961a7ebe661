package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.WordShape

/** Per-token CRF feature generation (SURVEY.md §2.A C1-C17) over the
  * exploded token table.
  *
  * The reference computes these one document at a time with mutable
  * scans (`sciencebeam_parser/models/data.py`); here every feature is a
  * window/arithmetic column so generation is one shuffle on `doc_id`
  * (all windows share the same partitioning — Catalyst collapses them
  * into a single Window stage chain without re-shuffling) and scales by
  * documents, not by corpus size.
  */
object Features {

  private val pos = Seq(col("page_idx"), col("block_idx"), col("line_idx"), col("token_idx"))
  private def byDoc = Window.partitionBy("doc_id").orderBy(pos: _*)
  private def byLine = Window.partitionBy("doc_id", "page_idx", "block_idx", "line_idx")
  private def byBlock = Window.partitionBy("doc_id", "page_idx", "block_idx")
  private def byPage = Window.partitionBy("doc_id", "page_idx")
  // Full-partition frame over an ORDERED spec: identical value to the
  // unordered window, but WindowExec groups frames by (partition,
  // order) — riding the ordered spec keeps each partition level at ONE
  // buffering operator instead of two (optimization round r16; the
  // buffer copy of the wide token row is the dominant per-row cost).
  private def fullFrame(w: org.apache.spark.sql.expressions.WindowSpec) =
    w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
  private def byDocFull = fullFrame(byDoc)

  // ----------------------------------------------------- scalar features

  /** C1 prefix/suffix 1-4 (data.py:397-401). */
  def prefix(n: Int): Column = substring(col("text"), 1, n)
  def suffix(n: Int): Column = substring(col("text"), -n, n)

  /** C2 lowercase. */
  def lowerText: Column = lower(col("text"))

  /** C3 ALLDIGIT/CONTAINSDIGITS/NODIGIT (data.py:157-163). */
  def digitFeature(c: Column = col("text")): Column =
    when(c.rlike("^[0-9]+$"), "ALLDIGIT")
      .when(c.rlike("[0-9]"), "CONTAINSDIGITS")
      .otherwise("NODIGIT")

  /** C4 ALLCAP/INITCAP/NOCAPS (data.py:166-171: ALLCAP = no lowercase
    * char and non-empty; INITCAP = first char uppercase). */
  def capitalisationFeature(c: Column = col("text")): Column =
    when(length(c) > 0 && !c.rlike("\\p{Ll}"), "ALLCAP")
      .when(c.rlike("^\\p{Lu}"), "INITCAP")
      .otherwise("NOCAPS")

  /** C5 punctuation type (data.py:174-201 map + IS_PUNCT regex). */
  def punctuationTypeFeature(c: Column = col("text")): Column =
    when(c.isin("(", "["), "OPENBRACKET")
      .when(c.isin(")", "]"), "ENDBRACKET")
      .when(c === ".", "DOT")
      .when(c === ",", "COMMA")
      .when(c.isin("-", "–"), "HYPHEN")
      .when(c.isin("\"", "'", "`", "’"), "QUOTE")
      .when(c.rlike("^[,:;?.]+$"), "PUNCT")
      .otherwise("NOPUNCT")

  /** C7 word shape (native expression, data.py:360-382). */
  def wordShape: Column = WordShape.word_shape(col("text"))

  /** C8 font boolean flags as '1'/'0' strings (data.py:403-413). */
  def boolFlag(c: Column): Column = when(c, "1").otherwise("0")
  def isBoldFlag: Column = boolFlag(col("font.is_bold"))
  def isItalicFlag: Column = boolFlag(col("font.is_italics"))
  def isSuperscriptFlag: Column = boolFlag(col("font.is_superscript"))
  def isSingleCharFlag: Column = boolFlag(length(col("text")) === 1)

  // ----------------------------------------------------- window features

  /** C9 font status vs previous token (data.py:131-139): NEWFONT when
    * the font FAMILY changes (null-safe compare) or there is no previous
    * token, SAMEFONT otherwise. Matches [[HeaderFeatures]] exactly. */
  def fontStatus: Column = {
    val prevAny = lag(lit(1), 1).over(byDoc)
    val prev = lag(col("font.font_family"), 1).over(byDoc)
    when(prevAny.isNull, "NEWFONT")
      .when(prev <=> col("font.font_family"), "SAMEFONT")
      .otherwise("NEWFONT")
  }

  /** C9 font-size comparison (data.py:141-154): no previous token, or
    * either size missing/zero → HIGHERFONT (reference behavior), else
    * HIGHERFONT/LOWERFONT/SAMEFONTSIZE. Matches [[HeaderFeatures]]. */
  def fontSizeStatus: Column = {
    val prevAny = lag(lit(1), 1).over(byDoc)
    val prev = lag(col("font.font_size"), 1).over(byDoc)
    when(prevAny.isNull, "HIGHERFONT")
      .when(prev.isNull || col("font.font_size").isNull ||
        prev === 0.0 || col("font.font_size") === 0.0, "HIGHERFONT")
      .when(prev < col("font.font_size"), "HIGHERFONT")
      .when(prev > col("font.font_size"), "LOWERFONT")
      .otherwise("SAMEFONTSIZE")
  }

  /** C10 relative font size over the whole document (data.py:263-295):
    * unbounded doc window — computed once, reused by all three flags. */
  def largestFontFlag: Column =
    boolFlag(col("font.font_size") >=
      max(col("font.font_size")).over(byDocFull))
  def smallestFontFlag: Column =
    boolFlag(col("font.font_size") <=
      min(col("font.font_size")).over(byDocFull))
  def largerThanAvgFontFlag: Column =
    boolFlag(col("font.font_size") >
      avg(col("font.font_size")).over(byDocFull))

  /** C11 line/block/page status (data.py:209-260): LINESTART/LINEIN/
    * LINEEND etc. from first/last positions within the partition. */
  private def statusIn(w: org.apache.spark.sql.expressions.WindowSpec,
      startV: String, inV: String, endV: String): Column = {
    val rn = row_number().over(w.orderBy(pos: _*))
    val cnt = count(lit(1)).over(fullFrame(w.orderBy(pos: _*)))
    when(rn === 1, startV).when(rn === cnt, endV).otherwise(inV)
  }
  def lineStatus: Column = statusIn(byLine, "LINESTART", "LINEIN", "LINEEND")
  def blockStatus: Column = statusIn(byBlock, "BLOCKSTART", "BLOCKIN", "BLOCKEND")
  def pageStatus: Column = statusIn(byPage, "PAGESTART", "PAGEIN", "PAGEEND")

  /** C12 indentation/alignment: compare line start-x against the
    * previous line's start-x, one char-width tolerance
    * (data.py:298-321 reformulated statelessly). */
  def alignmentStatus: Column = {
    val lineFirst = fullFrame(Window.partitionBy(
      "doc_id", "page_idx", "block_idx", "line_idx").orderBy(pos: _*))
    val startX = min(when(col("token_idx") === 0, col("coords.x"))).over(lineFirst)
    val charWidth = col("coords.width") / greatest(length(col("text")), lit(1))
    val prevLineX = lag(startX, 1).over(
      Window.partitionBy("doc_id").orderBy(col("page_idx"), col("block_idx"), col("line_idx"), col("token_idx")))
    when(prevLineX.isNull, "ALIGNEDLEFT")
      .when(startX > prevLineX + charWidth, "INDENTED")
      .when(startX < prevLineX - charWidth, "ALIGNEDLEFT")
      .otherwise("ALIGNEDLEFT")
  }

  /** C13 linear-scaled position bins (data.py:118-128):
    * floor(pos/total*bins), clamped to bins-1 at pos==total. */
  def linearScaledBin(posC: Column, totalC: Column, bins: Int): Column =
    least(floor(posC * bins / totalC), lit(bins - 1)).cast("int")

  /** Doc-relative position in 12 bins. */
  def docPositionBin: Column = {
    val rn = row_number().over(byDoc) - 1
    val total = count(lit(1)).over(byDocFull)
    linearScaledBin(rn, total, 12)
  }

  /** C14 lexicon membership flag via broadcast set. */
  def lexiconFlag(lexicon: Set[String]): Column =
    boolFlag(lower(col("text")).isin(lexicon.toSeq: _*))

  // --------------------------------------------------------- assembly

  /** C17 feature-vector assembly: the model contract is an ordered
    * space-joined feature line per token (models/data.py:46-55). The
    * exact per-model column lists live with each model; this generic
    * assembler preserves order. */
  def assemble(features: Seq[Column]): Column =
    concat_ws(" ", (col("text") +: features): _*)

  /** Header-model-shaped feature set (models/header/data.py:15-50
    * ordering; the full 32-feature parity is tracked per-model). */
  def headerFeatures(tokens: DataFrame): DataFrame =
    tokens.withColumn("features", assemble(Seq(
      lowerText, prefix(1), prefix(2), prefix(3), prefix(4),
      suffix(1), suffix(2), suffix(3), suffix(4),
      blockStatus, lineStatus, alignmentStatus,
      fontStatus, fontSizeStatus,
      isBoldFlag, isItalicFlag,
      capitalisationFeature(), digitFeature(),
      isSingleCharFlag, punctuationTypeFeature(), wordShape)))
}
