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
    Gen.oneOf(" ", ",", ".", "-", "(", ")", "'", "†", "\t"),
  )).map(_.mkString)

  test("tokenize(keepWhitespace) concatenates back to the input") {
    forAllSamples(textGen) { text =>
      assert(TextNormalization.tokenize(text, keepWhitespace = true).mkString == text)
    }
  }

  test("tokenize without whitespace = keepWhitespace minus blank tokens") {
    forAllSamples(textGen) { text =>
      val kept = TextNormalization.tokenize(text, keepWhitespace = true)
        .filter(_.trim.nonEmpty)
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
}
