package graft.pipeline

/** Text normalization + tokenization with the reference's exact
  * character tables (they define downstream token identity, so they are
  * ported verbatim):
  * - ligature/quote/dash folding map: `sciencebeam_parser/utils/text.py:7-47`
  * - delimiter set: `sciencebeam_parser/utils/tokenizer.py:10-15`
  *
  * JVM-side functions; used inside the ALTO reader's per-row parse
  * (genuinely imperative, row-local work) — the relational surface uses
  * built-in Catalyst string functions instead.
  */
object TextNormalization {

  private val replacements: Map[Char, String] = Map(
    '`' -> "'",
    'ﬀ' -> "ff", 'ﬁ' -> "fi", 'ﬂ' -> "fl",
    'ﬃ' -> "ffi", 'ﬄ' -> "ffl", 'ﬅ' -> "ft", 'ﬆ' -> "st",
    'æ' -> "ae", 'Æ' -> "AE", 'œ' -> "oe", 'Œ' -> "OE",
    '‐' -> "-", '‑' -> "-", '‒' -> "-",
    '–' -> "-", '—' -> "-", '―' -> "-",
    '“' -> "\"", '”' -> "\"", '„' -> "\"", '‟' -> "\"",
    '’' -> "'", '‘' -> "'",
    '•' -> "•", '‣' -> "•", '⁃' -> "•", '⁌' -> "•",
    '⁍' -> "•", '∙' -> "•", '◉' -> "•", '◘' -> "•",
    '◦' -> "•", '☙' -> "•", '❥' -> "•", '❧' -> "•",
    '⦾' -> "•", '⦿' -> "•", '∗' -> "*",
  )

  /** normalize_text (utils/text.py:55-65): fold chars, collapse
    * whitespace-around-newlines to '\n', collapse runs of whitespace.
    */
  def normalize(text: String): String = {
    val sb = new StringBuilder(text.length)
    text.foreach(c => sb.append(replacements.getOrElse(c, c.toString)))
    // (?U): the reference regexes are Python's Unicode-aware \s (thin
    // space, NBSP, ideographic space all collapse); Java's default \s
    // is ASCII-only and would leave them behind
    sb.toString
      .replaceAll("(?U)\\s*\\n\\s*", "\n")
      .replaceAll("(?U)\\s{2,}", " ")
  }

  /** Delimiters (utils/tokenizer.py:10-15): DELFT/GROBID sets + common
    * affiliation markers.
    */
  private val delimiters: String =
    "\n\r\t\f ([ •*,:;?.!/#)-−–‐\"“”‘’'`$]*♦♥♣♠ @" +
      "†‡§¶⁋ǂ"

  private val delimiterRegex =
    ("(?U)(" + delimiters.map(c => java.util.regex.Pattern.quote(c.toString)).mkString("|") +
      "|\\s)").r

  /** Blank in the Python `str.strip()` sense: Unicode whitespace
    * including the Zs spaces (NBSP, thin space) Java's `trim`/
    * `isWhitespace` alone would miss. */
  private def isBlank(s: String): Boolean =
    // U+0085 NEL: Python \s and (?U)\s both match it, but neither
    // Character.isWhitespace nor isSpaceChar does on the JVM
    s.forall(c => Character.isWhitespace(c) || Character.isSpaceChar(c) ||
      c == '\u0085')

  /** iter_tokenized_tokens: regex split keeping the delimiters as
    * tokens; whitespace-only tokens dropped unless `keepWhitespace`.
    * The `(?U)` flag mirrors Python's Unicode `\s` — a thin-space
    * (U+2009) separated pair must split, and the thin-space token must
    * count as blank.
    */
  def tokenize(text: String, keepWhitespace: Boolean = false): List[String] = {
    val parts = scala.collection.mutable.ListBuffer.empty[String]
    var last = 0
    for (m <- delimiterRegex.findAllMatchIn(text)) {
      if (m.start > last) parts += text.substring(last, m.start)
      parts += m.matched
      last = m.end
    }
    if (last < text.length) parts += text.substring(last)
    if (keepWhitespace) parts.toList
    else parts.toList.filterNot(isBlank)
  }
}
