package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Corpus-curation kernels: multi-pattern blocklist matching,
  * Bloom-filter membership, and a compression-ratio quality signal.
  */

/** Aho–Corasick multi-pattern matcher over UTF-8 BYTES (exact
  * substring semantics are byte-exact in UTF-8, so matching bytes
  * avoids a per-row String decode). One pass over the text finds every
  * blocklist phrase at once — the P-pattern `LIKE '%p%'` chain scans
  * the text P times, which at 100 TB × a few hundred banned phrases is
  * the difference between one corpus read and hundreds.
  *
  * The goto function is flattened to a dense DFA (nodes × 256 ints)
  * during construction: right-sized for blocklists of up to a few
  * thousand short phrases (a 10k-trie-node list costs ~10 MB, built
  * once per executor). Construction is deterministic; only the pattern
  * strings are serialized — the automaton rebuilds lazily per JVM.
  */
final class AhoCorasick(val patterns: Seq[String]) extends Serializable {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "AhoCorasick requires non-empty patterns")

  @transient private lazy val (delta: Array[Array[Int]],
      outputs: Array[Array[Int]]) = build()

  private def build(): (Array[Array[Int]], Array[Array[Int]]) = {
    val pats = patterns.map(_.getBytes("UTF-8")).toArray
    // trie with dense children
    val children = scala.collection.mutable.ArrayBuffer(Array.fill(256)(-1))
    val out = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    for (pi <- pats.indices) {
      var s = 0
      for (b <- pats(pi)) {
        val c = b & 0xff
        if (children(s)(c) < 0) {
          children(s)(c) = children.size
          children += Array.fill(256)(-1)
          out += Nil
        }
        s = children(s)(c)
      }
      out(s) = pi :: out(s)
    }
    // BFS fail links; flatten goto+fail into a total DFA delta
    val n = children.size
    val fail = new Array[Int](n)
    val d = Array.tabulate(n)(i => children(i).clone())
    val queue = scala.collection.mutable.Queue.empty[Int]
    for (c <- 0 until 256) {
      val s = children(0)(c)
      if (s < 0) d(0)(c) = 0
      else { fail(s) = 0; queue.enqueue(s) }
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      out(s) = out(s) ::: out(fail(s))
      for (c <- 0 until 256) {
        val t = children(s)(c)
        if (t < 0) d(s)(c) = d(fail(s))(c)
        else { fail(t) = d(fail(s))(c); queue.enqueue(t) }
      }
    }
    (d, out.map(_.sorted.toArray).toArray)
  }

  /** Distinct matched pattern indexes, ascending. */
  def matchedIds(text: UTF8String): Array[Int] = {
    val bytes = text.getBytes
    val seen = new java.util.BitSet(patterns.size)
    var s = 0
    var found = 0
    var i = 0
    while (i < bytes.length && found < patterns.size) {
      s = delta(s)(bytes(i) & 0xff)
      val o = outputs(s)
      var j = 0
      while (j < o.length) {
        if (!seen.get(o(j))) { seen.set(o(j)); found += 1 }
        j += 1
      }
      i += 1
    }
    val res = new Array[Int](found)
    var b = seen.nextSetBit(0)
    var k = 0
    while (b >= 0) { res(k) = b; k += 1; b = seen.nextSetBit(b + 1) }
    res
  }

  /** Codegen entry: boxed array for GenericArrayData. */
  def matchedArray(text: UTF8String): GenericArrayData =
    new GenericArrayData(matchedIds(text).map(Int.box): Array[Any])

  @transient private lazy val patLens: Array[Int] =
    patterns.map(_.getBytes("UTF-8").length).toArray

  /** Redact every blocklist occurrence in ONE pass: leftmost match
    * wins, longest pattern on a shared start; non-overlapping
    * selection left to right. Returns (redacted text, number of
    * replacements). Byte-exact UTF-8 — a pattern match always spans
    * complete characters, so splicing at its byte bounds is safe.
    */
  def redact(text: UTF8String, replacement: UTF8String): (UTF8String, Int) = {
    val bytes = text.getBytes
    // all occurrences as (start, end), then greedy leftmost-longest
    val occ = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var s = 0
    var i = 0
    while (i < bytes.length) {
      s = delta(s)(bytes(i) & 0xff)
      val o = outputs(s)
      var j = 0
      while (j < o.length) {
        val len = patLens(o(j))
        occ += ((i + 1 - len, i + 1))
        j += 1
      }
      i += 1
    }
    if (occ.isEmpty) return (text, 0)
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var lastEnd = 0
    for ((st, en) <- occ.sortBy { case (st, en) => (st, -(en - st)) }) {
      if (st >= lastEnd) { picked += ((st, en)); lastEnd = en }
    }
    val rep = replacement.getBytes
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    var pos = 0
    for ((st, en) <- picked) {
      out.write(bytes, pos, st - pos)
      out.write(rep, 0, rep.length)
      pos = en
    }
    out.write(bytes, pos, bytes.length - pos)
    (UTF8String.fromBytes(out.toByteArray), picked.size)
  }

  /** Codegen entry for [[redact]]: struct(redacted, n_redacted). */
  def redactRow(text: UTF8String,
      replacement: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val (r, n) = redact(text, replacement)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](r, n.toLong))
  }
}

/** `multi_match(text)` for a fixed pattern list: distinct matched
  * blocklist indexes, ascending, as `array<int>`. Whole-stage codegen
  * calls the automaton held as a plan reference object.
  */
case class MultiMatchExpr(child: Expression, ac: AhoCorasick)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "multi_match"
  override def nullSafeEval(in: Any): Any =
    ac.matchedArray(in.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ac", ac, classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$ref.matchedArray($c)")
  }
  override protected def withNewChildInternal(c: Expression): MultiMatchExpr =
    copy(child = c)
}

/** `multi_redact(text)` for a fixed pattern list + replacement:
  * struct(redacted string, n_redacted bigint) — one automaton pass
  * replaces every non-overlapping blocklist occurrence
  * (leftmost-longest selection, [[AhoCorasick.redact]]).
  */
case class MultiRedactExpr(child: Expression, ac: AhoCorasick,
    replacement: String) extends UnaryExpression {
  import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
  override def dataType: DataType = StructType(Seq(
    StructField("redacted", StringType, nullable = false),
    StructField("n_redacted", LongType, nullable = false)))
  override def prettyName: String = "multi_redact"
  @transient private lazy val rep = UTF8String.fromString(replacement)
  override def nullSafeEval(in: Any): Any =
    ac.redactRow(in.asInstanceOf[UTF8String], rep)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ac", ac, classOf[AhoCorasick].getName)
    val repRef = ctx.addReferenceObj("rep",
      UTF8String.fromString(replacement), classOf[UTF8String].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.redactRow($c, $repRef)")
  }
  override protected def withNewChildInternal(c: Expression): MultiRedactExpr =
    copy(child = c)
}

/** `bloom_might_contain(hash)` against a driver-built Bloom filter: the
  * broadcast-approximate membership probe (no false negatives). The
  * filter object rides the plan as a reference object — serialized once
  * per executor, probed inside whole-stage codegen.
  */
case class BloomMightContainExpr(child: Expression, filter: BloomFilter)
  extends UnaryExpression with org.apache.spark.sql.graftbridge.LongInputType {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "bloom_might_contain"
  override def nullSafeEval(in: Any): Any =
    filter.mightContainLong(in.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", filter, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }
  override protected def withNewChildInternal(c: Expression): BloomMightContainExpr =
    copy(child = c)
}

/** DEFLATE compression ratio — the model-free redundancy signal quality
  * pipelines cut on (highly compressible ⇒ repetitive/templated text;
  * incompressible ⇒ noise/binary junk). Deterministic for a fixed
  * zlib level on a fixed JVM; emitted raw (downstream rounds for
  * rendering). One shared Deflater per thread, reset per row — the
  * native allocation is the expensive part.
  */
object DeflateStats {
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
  }

  /** compressed_bytes / input_bytes (empty input ⇒ 1.0). */
  def ratio(text: UTF8String): Double = {
    val in = text.getBytes
    if (in.length == 0) return 1.0
    val d = local.get()
    d.reset()
    d.setInput(in)
    d.finish()
    val chunk = new Array[Byte](8192)
    var outLen = 0L
    while (!d.finished()) outLen += d.deflate(chunk)
    outLen.toDouble / in.length
  }
}

/** `deflate_ratio(text)`: compressed/raw byte ratio (see
  * [[DeflateStats]]). */
case class DeflateRatioExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"
  override def nullSafeEval(in: Any): Any =
    DeflateStats.ratio(in.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateStats.ratio($c)")
  override protected def withNewChildInternal(c: Expression): DeflateRatioExpr =
    copy(child = c)
}

/** Anchored multi-PREFIX matcher: `true` when the input starts with
  * ANY of the fixed prefixes. Prefixes bucket by length into hash
  * sets; a lookup costs one substring + one hash probe per DISTINCT
  * prefix length (a few dozen for real URL-path blocklists), not one
  * comparison per prefix — the 100k-entry path-blocklist contract
  * where a `startsWith` chain would be 100k comparisons per row and a
  * literal `In` would blow up analysis. Only the prefix strings
  * serialize; the buckets rebuild lazily per JVM.
  */
final class PrefixSet(val prefixes: Seq[String]) extends Serializable {
  require(prefixes.nonEmpty && prefixes.forall(_.nonEmpty),
    "PrefixSet requires non-empty prefixes")
  @transient private lazy val byLen: Array[(Int, java.util.HashSet[String])] =
    prefixes.distinct.groupBy(_.length).toSeq.sortBy(_._1).map {
      case (l, ps) =>
        val s = new java.util.HashSet[String](ps.length * 2)
        ps.foreach(s.add)
        (l, s)
    }.toArray

  def matches(s: UTF8String): Boolean = {
    val str = s.toString
    var i = 0
    while (i < byLen.length) {
      val (l, set) = byLen(i)
      if (l <= str.length && set.contains(str.substring(0, l))) return true
      i += 1
    }
    false
  }
}

/** `starts_with_any(text)` against a fixed [[PrefixSet]] — codegen
  * calls the bucket table held as a plan reference object. */
case class StartsWithAnyExpr(child: Expression, ps: PrefixSet)
  extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "starts_with_any"
  override def nullSafeEval(in: Any): Any =
    ps.matches(in.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ps", ps, classOf[PrefixSet].getName)
    defineCodeGen(ctx, ev, c => s"$ref.matches($c)")
  }
  override protected def withNewChildInternal(c: Expression): StartsWithAnyExpr =
    copy(child = c)
}

object CurationFunctions {
  def multi_match(text: Column, ac: AhoCorasick): Column =
    ColumnBridge.column(MultiMatchExpr(ColumnBridge.expression(text), ac))
  def starts_with_any(text: Column, ps: PrefixSet): Column =
    ColumnBridge.column(
      StartsWithAnyExpr(ColumnBridge.expression(text), ps))
  def multi_redact(text: Column, ac: AhoCorasick, replacement: String): Column =
    ColumnBridge.column(
      MultiRedactExpr(ColumnBridge.expression(text), ac, replacement))
  def bloom_might_contain(hash: Column, filter: BloomFilter): Column =
    ColumnBridge.column(
      BloomMightContainExpr(ColumnBridge.expression(hash), filter))
  def deflate_ratio(text: Column): Column =
    ColumnBridge.column(DeflateRatioExpr(ColumnBridge.expression(text)))
}
