package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native PII scan (q64 kernel).
  *
  * Hand-rolled leftmost-greedy scanners for the two q64 patterns
  *
  *  - email `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`
  *  - phone `\+[0-9][0-9 ]{7,}[0-9]`
  *
  * with match semantics identical to both java.util.regex and RE2 on
  * these patterns (no alternation, greedy char-class quantifiers only —
  * leftmost-first equals leftmost-longest here; PiiPropertySpec fuzzes
  * the equivalence against java.util.regex). The point is the ENGINE:
  * Java's backtracking matcher pays O(text × run-length) per document
  * even on text that cannot match, which made q64 the one 8× bench miss
  * at sf1. These scanners anchor on `indexOf('@') / indexOf('+')`
  * (memchr-speed) and do constant work per anchor hit, so the clean
  * majority of a corpus costs two probes per document.
  *
  * One kernel call computes everything q64 needs — email count and
  * phone count on the ORIGINAL text plus the redacted form
  * (email-redact, then phone-redact on the result, exactly the
  * sequential `regexp_replace` composition) — as a struct, evaluated
  * once per row inside whole-stage codegen.
  */
object PiiScan {

  val schema: StructType = StructType(Seq(
    StructField("n_emails", LongType, nullable = false),
    StructField("n_phones", LongType, nullable = false),
    StructField("redacted", StringType, nullable = false)))

  @inline private def isLocal(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
    (c >= '0' && c <= '9') || c == '.' || c == '_' || c == '%' ||
    c == '+' || c == '-'

  @inline private def isDomain(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
    (c >= '0' && c <= '9') || c == '.' || c == '-'

  @inline private def isAlpha(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')

  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** Email pass: counts matches; when `sb` is non-null also builds the
    * redacted form ([EMAIL] substitution). Returns the match count.
    *
    * Leftmost semantics: a match's local part is the maximal run of
    * local chars ending at an '@' (clamped at the previous match end —
    * java.util.regex resumes AT the previous end, so a run cannot
    * reach back across it). A failed '@' advances the scan past itself
    * only: later '@'s are independent because '@' is in neither char
    * class.
    */
  def emailPass(s: String, sb: java.lang.StringBuilder): Long = {
    val n = s.length
    var count = 0L
    var i = 0
    var copied = 0
    var q = s.indexOf('@')
    while (q >= 0) {
      // maximal local-part run ending at q, not crossing the last match
      var ls = q
      while (ls > i && isLocal(s.charAt(ls - 1))) ls -= 1
      var matchEnd = -1
      if (ls < q) {
        // maximal domain-char run after '@'
        var de = q + 1
        while (de < n && isDomain(s.charAt(de))) de += 1
        // greedy backtrack: the LAST '.' (at index sp >= q+2, so the
        // [A-Za-z0-9.-]+ part is non-empty) followed by >=2 alpha
        var sp = de - 3
        var dot = -1
        while (sp >= q + 2 && dot < 0) {
          if (s.charAt(sp) == '.' && isAlpha(s.charAt(sp + 1)) &&
              isAlpha(s.charAt(sp + 2))) dot = sp
          sp -= 1
        }
        if (dot >= 0) {
          // [A-Za-z]{2,} is greedy and last in the pattern: maximal run
          var ae = dot + 3
          while (ae < de && isAlpha(s.charAt(ae))) ae += 1
          matchEnd = ae
        }
      }
      if (matchEnd < 0) i = q + 1
      else {
        count += 1
        if (sb != null) { sb.append(s, copied, ls).append("[EMAIL]"); copied = matchEnd }
        i = matchEnd
      }
      q = s.indexOf('@', i)
    }
    if (sb != null) sb.append(s, copied, n)
    count
  }

  /** Phone pass: `\+` anchor, digit, then the greedy `[0-9 ]{7,}[0-9]`
    * tail — the final digit is the last digit inside the maximal
    * digit/space run that leaves >=7 middle chars.
    */
  def phonePass(s: String, sb: java.lang.StringBuilder): Long = {
    val n = s.length
    var count = 0L
    var i = 0
    var copied = 0
    var q = s.indexOf('+', i)
    while (q >= 0) {
      var matchEnd = -1
      if (q + 1 < n && isDigit(s.charAt(q + 1))) {
        var e = q + 2
        while (e < n && (isDigit(s.charAt(e)) || s.charAt(e) == ' ')) e += 1
        var j = e - 1
        while (j >= q + 9 && matchEnd < 0) {
          if (isDigit(s.charAt(j))) matchEnd = j + 1
          j -= 1
        }
      }
      if (matchEnd < 0) i = q + 1
      else {
        count += 1
        if (sb != null) { sb.append(s, copied, q).append("[PHONE]"); copied = matchEnd }
        i = matchEnd
      }
      q = s.indexOf('+', i)
    }
    if (sb != null) sb.append(s, copied, n)
    count
  }

  /** The q64 kernel: (n_emails, n_phones, redacted) in at most three
    * anchor-gated scans; a document with neither '@' nor '+' pays two
    * indexOf probes and zero allocation beyond the result row.
    */
  def scan(u: UTF8String): InternalRow = {
    val s = u.toString
    val hasAt = s.indexOf('@') >= 0
    val hasPlus = s.indexOf('+') >= 0
    var nEmails = 0L
    var nPhones = 0L
    var redacted = u
    if (hasAt) {
      val sb = new java.lang.StringBuilder(s.length + 16)
      nEmails = emailPass(s, sb)
      redacted = if (nEmails > 0) UTF8String.fromString(sb.toString) else u
    }
    if (hasPlus) {
      if (nEmails == 0) {
        // count and redact agree when no [EMAIL] substitution happened
        val sb = new java.lang.StringBuilder(s.length + 16)
        nPhones = phonePass(s, sb)
        if (nPhones > 0) redacted = UTF8String.fromString(sb.toString)
      } else {
        // the count is defined on the ORIGINAL text, the redaction on
        // the de-emailed form (sequential regexp_replace composition)
        nPhones = phonePass(s, null)
        val base = redacted.toString
        val sb = new java.lang.StringBuilder(base.length + 16)
        if (phonePass(base, sb) > 0) redacted = UTF8String.fromString(sb.toString)
      }
    }
    new GenericInternalRow(Array[Any](nEmails, nPhones, redacted))
  }

  def pii_scan(c: Column): Column =
    ColumnBridge.column(PiiScanExpr(ColumnBridge.expression(c)))
}

case class PiiScanExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = PiiScan.schema
  override def prettyName: String = "pii_scan"
  override def nullSafeEval(in: Any): Any =
    PiiScan.scan(in.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PiiScan.scan($c)")
  override protected def withNewChildInternal(c: Expression): PiiScanExpr =
    copy(child = c)
}
