package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{ModelExtractors, TextNormalization}

/** Property tests for the invariants the reference asserts at runtime
  * (`models/model.py:317-331`: re-concatenation must reproduce the
  * input) plus fold/scaling laws. Plain ScalaCheck generators driven in
  * a sampling loop (the scalatest-scalacheck bridge isn't available in
  * the offline cache).
  */
class PropertySpec extends AnyFunSuite {

  private def forAllSamples[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    val params = org.scalacheck.Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(42L)
    (0 until n).foreach { _ =>
      gen.apply(params, seed).foreach(f)
      seed = seed.next
    }
  }

  private val textGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    // includes thin space + NBSP: unicode whitespace must behave like
    // Python's \s in the tokenizer (split AND count as blank)
    Gen.oneOf(" ", ",", ".", "-", "(", ")", "'", "†", "\t",
      " ", " "),
  )).map(_.mkString)

  test("tokenize(keepWhitespace) concatenates back to the input") {
    forAllSamples(textGen) { text =>
      assert(TextNormalization.tokenize(text, keepWhitespace = true).mkString == text)
    }
  }

  test("tokenize without whitespace = keepWhitespace minus blank tokens") {
    forAllSamples(textGen) { text =>
      val kept = TextNormalization.tokenize(text, keepWhitespace = true)
        .filter(_.exists(c => !Character.isWhitespace(c) &&
          !Character.isSpaceChar(c) && c != '\u0085'))
      assert(TextNormalization.tokenize(text) == kept)
    }
  }

  test("normalize is idempotent") {
    forAllSamples(textGen) { text =>
      val once = TextNormalization.normalize(text)
      assert(TextNormalization.normalize(once) == once)
    }
  }

  private val bioLabelGen: Gen[List[String]] =
    Gen.listOf(Gen.oneOf("O", "B-<a>", "I-<a>", "B-<b>", "I-<b>"))

  /** Reference span grouping (models/model.py:61-79) as the oracle. */
  private def referenceSpans(labels: List[String]): List[(String, Int, Int)] = {
    val out = scala.collection.mutable.ListBuffer.empty[(String, Int, Int)]
    var prevTag = "O"
    var prevStart = 0
    labels.zipWithIndex.foreach { case (l, i) =>
      val (prefix, tag) =
        if (l.startsWith("B-") || l.startsWith("I-")) (l.take(1), l.drop(2)) else ("", l)
      if (prefix == "B" || tag != prevTag) {
        if (prevStart < i) out += ((prevTag, prevStart, i - 1))
        prevTag = tag
        prevStart = i
      }
    }
    if (prevStart < labels.size) out += ((prevTag, prevStart, labels.size - 1))
    out.toList
  }

  /** The engine's running-sum formulation (BioSpans), evaluated purely. */
  private def engineSpans(labels: List[String]): List[(String, Int, Int)] = {
    val stripped = labels.map(l =>
      if (l.startsWith("B-") || l.startsWith("I-")) l.drop(2) else l)
    val flags = labels.zipWithIndex.map { case (l, i) =>
      if (i == 0 || l.startsWith("B-") || stripped(i) != stripped(i - 1)) 1 else 0
    }
    val ids = flags.scanLeft(0)(_ + _).tail
    labels.indices.groupBy(ids(_)).toList.sortBy(_._2.head)
      .map { case (_, idxs) => (stripped(idxs.head), idxs.head, idxs.last) }
  }

  test("BIO span grouping matches the reference algorithm on random label sequences") {
    var nonTrivial = 0
    forAllSamples(bioLabelGen) { labels =>
      if (labels.size > 3) nonTrivial += 1
      assert(engineSpans(labels) == referenceSpans(labels), labels)
    }
    assert(nonTrivial > 50) // the generator actually produced real cases
  }

  test("spans partition the token sequence exactly") {
    forAllSamples(bioLabelGen) { labels =>
      val covered = engineSpans(labels).flatMap { case (_, s, e) => s to e }
      assert(covered == labels.indices.toList, labels)
    }
  }

  test("page-range expansion: length matches from-page, numeric suffix preserved") {
    val pageGen = for {
      from <- Gen.choose(1, 99999)
      toLen <- Gen.choose(1, from.toString.length)
    } yield (from.toString, from.toString.takeRight(toLen))
    forAllSamples(pageGen) { case (from, shortTo) =>
      val (f, t) = ModelExtractors.parsePageRange(s"$from-$shortTo")
      assert(f.contains(from))
      assert(t.get.length == from.length && t.get.endsWith(shortTo))
    }
  }

  private val tokListGen: Gen[List[String]] =
    Gen.listOf(Gen.oneOf("a", "b", "cc", "dd", "e", "word", ""))

  private def toArrayData(toks: List[String]) =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      toks.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray[Any])

  test("tokenTf: tfs sum to input length, keys distinct, counts exact") {
    forAllSamples(tokListGen) { toks =>
      val out = graft.functions.Sketch.tokenTf(toArrayData(toks))
      val pairs = (0 until out.numElements()).map { i =>
        val row = out.getStruct(i, 2)
        (row.getUTF8String(0).toString, row.getLong(1))
      }
      assert(pairs.map(_._2).sum == toks.length)
      assert(pairs.map(_._1).distinct.size == pairs.size)
      pairs.foreach { case (tok, tf) => assert(toks.count(_ == tok) == tf) }
      // first-seen order
      assert(pairs.map(_._1) == toks.distinct)
    }
  }

  test("ngrams: count and width laws") {
    val gen = for { toks <- tokListGen; n <- Gen.choose(1, 4) } yield (toks, n)
    forAllSamples(gen) { case (toks, n) =>
      val out = graft.functions.Sketch.ngrams(toArrayData(toks), n)
      val grams = (0 until out.numElements()).map(out.getUTF8String(_).toString)
      if (toks.isEmpty) assert(grams.isEmpty)
      else if (toks.length < n) assert(grams == Seq(toks.mkString(" ")))
      else {
        assert(grams.size <= toks.length - n + 1 && grams.nonEmpty)
        assert(grams.distinct.size == grams.size)
        grams.foreach(g => assert(g.split(" ", -1).length == n))
      }
    }
  }

  test("PiiScan matches java.util.regex on adversarial PII-shaped text") {
    import graft.operators.TextAnalysis
    import org.apache.spark.unsafe.types.UTF8String
    val emailP = java.util.regex.Pattern.compile(TextAnalysis.EmailRe)
    val phoneP = java.util.regex.Pattern.compile(TextAnalysis.PhoneRe)
    def count(p: java.util.regex.Pattern, s: String): Long = {
      val m = p.matcher(s); var c = 0L; while (m.find()) c += 1; c
    }
    def sub(p: java.util.regex.Pattern, s: String, rep: String): String =
      p.matcher(s).replaceAll(java.util.regex.Matcher.quoteReplacement(rep))
    // pieces biased toward the patterns' edge cases: bare anchors,
    // runs of dots/dashes, valid and near-miss addresses and numbers
    val pieceGen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf(" ", "@", "+", ".", "-", "_", "%", "..", "@@", "++",
        ".c", ".co", "a@b.co", "x@y", "@z.com", "a@.com", "a@b.c",
        "+1", "+12 345 678 90", "+123456789", "+12 34", "1 2 3 4 5 6 7 8",
        "jane.doe+x@lab.example.org", "-@-.aa", "a@-.bb", "a@b..cc",
        "@", " @ ", "a@b.c-d.ee", "+0        0", "+0 0 0 0 0 0 0 0 0",
        // non-ASCII/surrogate pairs: outside every char class, must
        // split runs identically in both engines
        "é@b.co", "a@é.co", "🦊", "a🦊@b.co", "+12 🦊 345678901", "τ@σ.gr"))
    val textGen = Gen.listOf(pieceGen).map(_.mkString)
    forAllSamples(textGen, n = 600) { text =>
      val row = graft.functions.PiiScan.scan(UTF8String.fromString(text))
      val expectedRedacted = sub(phoneP, sub(emailP, text, "[EMAIL]"), "[PHONE]")
      assert(row.getLong(0) == count(emailP, text), s"n_emails on '$text'")
      assert(row.getLong(1) == count(phoneP, text), s"n_phones on '$text'")
      assert(row.getUTF8String(2).toString == expectedRedacted, s"redacted on '$text'")
    }
  }

  test("ngramsAll laws: count, order, and distinct-form agreement") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val toksGen = Gen.listOf(Gen.oneOf("a", "b", "c", "dd"))
    forAllSamples(Gen.zip(toksGen, Gen.choose(1, 4)), n = 300) {
      case (toks, n) =>
        def arr(xs: Seq[String]) =
          new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])
        def strs(a: org.apache.spark.sql.catalyst.util.ArrayData) =
          (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
        val all = strs(graft.functions.Sketch.ngramsAll(arr(toks), n))
        val dis = strs(graft.functions.Sketch.ngrams(arr(toks), n))
        if (toks.isEmpty) assert(all.isEmpty && dis.isEmpty)
        else if (toks.length < n) {
          assert(all == Seq(toks.mkString(" ")) && dis == all)
        } else {
          // one gram per start position, in order
          assert(all.length == toks.length - n + 1)
          assert(all == toks.sliding(n).map(_.mkString(" ")).toSeq)
          // the distinct form is exactly first-seen dedup of the stream
          assert(dis == all.distinct)
        }
    }
  }

  test("AhoCorasick matches String.contains on random pattern sets") {
    import org.apache.spark.unsafe.types.UTF8String
    // small alphabet forces overlaps, shared prefixes/suffixes and
    // patterns nested inside each other — the automaton's hard cases
    val pat = Gen.choose(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'é')).map(_.mkString))
    val gen = for {
      ps <- Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, pat)).map(_.distinct)
      text <- Gen.listOf(Gen.oneOf('a', 'b', 'c', 'é', ' ')).map(_.mkString)
    } yield (ps, text)
    forAllSamples(gen, n = 500) { case (ps, text) =>
      val ac = new graft.functions.AhoCorasick(ps)
      val got = ac.matchedIds(UTF8String.fromString(text)).toSeq
      val want = ps.indices.filter(i => text.contains(ps(i)))
      assert(got == want, s"patterns=$ps text='$text'")
    }
  }

  test("WAV encode/decode roundtrip laws") {
    forAllSamples(Gen.alphaNumStr.map(_.take(64)).suchThat(_.nonEmpty)) { text =>
      val bytes = graft.operators.Multimodal.textToWav(text)
      val Some((ch, rate, bits, frames, rms)) = graft.operators.Multimodal.decodeWav(bytes)
      assert(ch == 1 && rate == 8000 && bits == 16)
      assert(frames == text.getBytes("UTF-8").length.toLong)
      assert(rms >= 0.0)
    }
  }
}
