package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass text statistics (q39/q40/q42/q48 kernels).
  *
  * The HOF formulations (`filter`/`aggregate`/`transform` lambdas over
  * `split(text)`) re-evaluate their argument per element and re-split
  * the text per feature — q40 alone made 4 independent passes over the
  * token array, and the five text-analysis queries together measured
  * 2.7-5.9× DuckDB marginal cost. This kernel computes every feature in
  * ONE scan of the string (plus one scan of its lowercase form for the
  * BPE-ish count), evaluated once per row inside whole-stage codegen —
  * the same native-kernel pattern as [[Sketch]].
  *
  * Output layout (array&lt;long&gt;):
  *  0 n_chars (code points)
  *  1 n_ws_tokens (non-empty single-space-split tokens)
  *  2 punct_chars (chars outside `[a-z0-9 ]` — uppercase counts, as in
  *    the declared q39 semantics)
  *  3 quality stopword hits (EN quality list)
  *  4..7 language function-word hits (en, de, fr, es)
  *  8 BPE-ish token count over lowercase text
  *    (`[a-z]+|[0-9]+|[^a-z0-9 ]`)
  *  9 has "the" token (0/1)
  * 10 tokens longer than 5 chars (raw split semantics, q48)
  * 11 total token length
  * 12 max token length (empty tokens count as 0, matching
  *    `split(text, ' ')` which keeps empties)
  */
object TextStats {

  val Fields = 13

  private def set(words: String*): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    words.foreach(s.add)
    s
  }

  // engine-constant word lists — the declared q39/q40 semantics
  private val StopQuality =
    set("the", "a", "of", "to", "and", "in", "is", "it", "on", "for")
  private val LangEn = set("the", "and", "of", "to", "is", "in", "that", "it")
  private val LangDe = set("der", "die", "und", "das", "ist", "nicht", "ein", "zu")
  private val LangFr = set("le", "la", "les", "et", "est", "une", "dans", "que")
  private val LangEs = set("el", "los", "y", "es", "en", "un", "una", "por")

  /** All 13 fields. */
  val FullMask: Int = (1 << Fields) - 1
  // field groups that gate skippable work
  private val WordSetBits = (1 << 3) | (1 << 4) | (1 << 5) | (1 << 6) | (1 << 7)
  private val BpeBit = 1 << 8

  def compute(u: UTF8String): ArrayData = compute(u, FullMask)

  /** Masked variant: `mask` is a bitmask of requested output indices.
    * Unrequested fields come back 0. The char loop always runs (it IS
    * the tokenization), but the per-token substring + word-set lookups
    * and the whole lowercase second pass are skipped when no requested
    * field needs them — a consumer asking for 4 of 13 stats (q48)
    * should not pay for the other 9 the way DuckDB's columnar
    * evaluation doesn't.
    */
  def compute(u: UTF8String, mask: Int): ArrayData = {
    val s = u.toString
    val out = new Array[Long](Fields)
    val needWordSets = (mask & WordSetBits) != 0
    val needThe = (mask & (1 << 9)) != 0

    // ---- pass 1: chars + single-space tokenization
    var i = 0
    var tokenStart = 0
    def endToken(endExclusive: Int): Unit = {
      val tokLen = s.codePointCount(tokenStart, endExclusive)
      out(11) += tokLen
      if (tokLen > 5) out(10) += 1
      if (tokLen > out(12)) out(12) = tokLen
      if (endExclusive > tokenStart) {
        out(1) += 1
        if (needWordSets) {
          val tok = s.substring(tokenStart, endExclusive)
          if (StopQuality.contains(tok)) out(3) += 1
          if (LangEn.contains(tok)) out(4) += 1
          if (LangDe.contains(tok)) out(5) += 1
          if (LangFr.contains(tok)) out(6) += 1
          if (LangEs.contains(tok)) out(7) += 1
          if (tok == "the") out(9) = 1
        } else if (needThe && endExclusive - tokenStart == 3 &&
            s.charAt(tokenStart) == 't' && s.charAt(tokenStart + 1) == 'h' &&
            s.charAt(tokenStart + 2) == 'e') {
          out(9) = 1
        }
      }
    }
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ') {
        endToken(i)
        tokenStart = i + 1
        out(0) += 1
        i += 1
      } else {
        out(0) += 1
        if (!(c >= 'a' && c <= 'z') && !(c >= '0' && c <= '9')) out(2) += 1
        if (Character.isHighSurrogate(c) && i + 1 < s.length &&
            Character.isLowSurrogate(s.charAt(i + 1))) i += 2
        else i += 1
      }
    }
    endToken(s.length)

    // ---- pass 2: BPE-ish count over the lowercase form (exactly
    // lower() + regexp_extract_all('[a-z]+|[0-9]+|[^a-z0-9 ]') counts)
    if ((mask & BpeBit) != 0) {
      val ls = u.toLowerCase.toString
      var j = 0
      var inLetters = false
      var inDigits = false
      while (j < ls.length) {
        val c = ls.charAt(j)
        if (c >= 'a' && c <= 'z') {
          if (!inLetters) out(8) += 1
          inLetters = true; inDigits = false
        } else if (c >= '0' && c <= '9') {
          if (!inDigits) out(8) += 1
          inDigits = true; inLetters = false
        } else if (c == ' ') {
          inLetters = false; inDigits = false
        } else {
          out(8) += 1
          inLetters = false; inDigits = false
          if (Character.isHighSurrogate(c) && j + 1 < ls.length &&
              Character.isLowSurrogate(ls.charAt(j + 1))) j += 1
        }
        j += 1
      }
    }

    new GenericArrayData(out)
  }

  /** Normalized vocabulary key (q41 kernel): lowercase, drop chars
    * outside `[a-z0-9 ]` (no boundary — adjacent runs join, exactly
    * `regexp_replace` removal), split on spaces, sorted distinct
    * tokens joined by a single space. One scan + one TreeSet.
    */
  def vocabKey(u: UTF8String): UTF8String = {
    val s = u.toLowerCase.toString
    val sorted = new java.util.TreeSet[String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (c == ' ') {
        if (sb.length > 0) { sorted.add(sb.toString); sb.setLength(0) }
      }
      // any other char: removed, no token boundary
      i += 1
    }
    if (sb.length > 0) sorted.add(sb.toString)
    val out = new java.lang.StringBuilder
    val it = sorted.iterator()
    while (it.hasNext) {
      if (out.length > 0) out.append(' ')
      out.append(it.next())
    }
    UTF8String.fromString(out.toString)
  }

  /** Normalized-match key (F1 matcher / q32 near-dedup kernel):
    * lowercase, keep only `[a-z0-9]` — byte-identical to
    * `regexp_replace(lower(s), "[^a-z0-9]", "")` but a single char
    * scan; the java.util.regex formulation costs ~4× the whole q32
    * runtime at sf1 (measured 2.7 s of the 3.4 s query).
    */
  def normalizedKey(u: UTF8String): UTF8String = {
    val s = u.toLowerCase.toString
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def text_stats(c: Column): Column =
    ColumnBridge.column(TextStatsExpr(ColumnBridge.expression(c)))

  /** Masked form: `fields` are the output indices the caller will
    * read; everything else is skipped where skippable. */
  def text_stats(c: Column, fields: Seq[Int]): Column =
    ColumnBridge.column(TextStatsExpr(ColumnBridge.expression(c),
      fields.foldLeft(0)((m, f) => m | (1 << f))))
  def vocab_key(c: Column): Column =
    ColumnBridge.column(VocabKeyExpr(ColumnBridge.expression(c)))
  def normalized_key(c: Column): Column =
    ColumnBridge.column(NormalizedKeyExpr(ColumnBridge.expression(c)))
}

case class TextStatsExpr(child: Expression,
    mask: Int = TextStats.FullMask) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "text_stats"
  override def nullSafeEval(in: Any): Any =
    TextStats.compute(in.asInstanceOf[UTF8String], mask)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.compute($c, $mask)")
  override protected def withNewChildInternal(c: Expression): TextStatsExpr =
    copy(child = c)
}

case class VocabKeyExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "vocab_key"
  override def nullSafeEval(in: Any): Any =
    TextStats.vocabKey(in.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.vocabKey($c)")
  override protected def withNewChildInternal(c: Expression): VocabKeyExpr =
    copy(child = c)
}

case class NormalizedKeyExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalized_key"
  override def nullSafeEval(in: Any): Any =
    TextStats.normalizedKey(in.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.normalizedKey($c)")
  override protected def withNewChildInternal(c: Expression): NormalizedKeyExpr =
    copy(child = c)
}
