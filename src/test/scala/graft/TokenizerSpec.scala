package graft

import graft.operators.Tokenizer
import graft.operators.Tokenizer.BpeMerge

class TokenizerSpec extends SparkSuite {
  import spark.implicits._

  // Sennrich et al.'s worked vocabulary: low×5 lower×2 newest×6 widest×3
  private val types = Array[(String, Long)](
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("trainFromTypes reproduces the hand-derived merge sequence") {
    val merges = Tokenizer.trainFromTypes(types, numMerges = 5)
    assert(merges == Seq(
      BpeMerge(0, "e", "s", 9L),        // es in newest(6)+widest(3)
      BpeMerge(1, "es", "t</w>", 9L),
      BpeMerge(2, "l", "o", 7L),        // low(5)+lower(2)
      BpeMerge(3, "e", "w", 6L),        // tie at 6 breaks to smallest left
      BpeMerge(4, "ew", "est</w>", 6L)))
  }

  test("trainFromTypes stops early when no pair repeats") {
    val merges = Tokenizer.trainFromTypes(Array(("ab", 1L), ("cd", 1L)), 10)
    assert(merges.isEmpty)
  }

  test("bpeEncode applies merges by rank; learned words collapse fully") {
    val merges = Tokenizer.trainFromTypes(types, numMerges = 10)
    val d = Seq((0L, "newest widest"), (1L, "lower"), (2L, "")).toDF("doc_id", "text")
    val got = Tokenizer.bpeEncode(d, merges).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_subwords"), r.getAs[String]("subword_preview"))).toMap
    // both training words reach a single subword within 10 merges
    assert(got(0L) == ((2L, 2L, "newest</w> widest</w>")))
    // 'lower' only partially merges: (l,o) applies, (lo,w</w>) does not match mid-word
    assert(got(1L) == ((1L, 4L, "lo w e r</w>")))
    assert(got(2L) == ((0L, 0L, "")))
  }

  test("incremental trainer is byte-identical to the naive rescan loop") {
    // the 40-merge fixture of the corpus-scale path
    val docs = Tables(spark, sf("0.001")).documents
    val table = Tokenizer.typeHistogram(docs, maxTypes = 100000)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val fast = Tokenizer.trainFromTypes(table, numMerges = 40)
    val naive = Tokenizer.trainFromTypesNaive(table, numMerges = 40)
    assert(fast == naive && fast.length == 40)
    // overlapping-pair shape ("aaaa"): non-overlapping left-to-right
    // merge walk, weighted counts — both trainers must agree exactly
    val overlap = Array(("aaaa", 3L), ("aab", 2L))
    assert(Tokenizer.trainFromTypes(overlap, 10) ==
      Tokenizer.trainFromTypesNaive(overlap, 10))
  }

  test("incremental trainer sustains a real vocabulary-scale merge count") {
    // synthetic Zipf-ish type table large enough that the naive
    // O(merges·types·len) loop would take minutes: the incremental
    // trainer must learn 5000 merges in seconds
    val rnd = new scala.util.Random(7)
    val table = Array.tabulate(30000) { i =>
      val len = 3 + rnd.nextInt(12)
      val w = (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      (w, (30000 / (i + 1)).toLong max 1L)
    }.distinct
    val t0 = System.nanoTime()
    val merges = Tokenizer.trainFromTypes(table, numMerges = 5000)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(merges.length == 5000, s"expected 5000 merges, got ${merges.length}")
    assert(secs < 60.0, f"incremental trainer took $secs%.1f s for 5000 merges")
  }

  test("corpus-scale train + encode is deterministic across runs") {
    val docs = Tables(spark, sf("0.001")).documents
    val m1 = Tokenizer.bpeTrain(docs, numMerges = 20)
    val m2 = Tokenizer.bpeTrain(docs, numMerges = 20)
    assert(m1 == m2 && m1.nonEmpty)
    val e1 = Tokenizer.bpeEncode(docs, m1).orderBy("doc_id").collect().toSeq
    val e2 = Tokenizer.bpeEncode(docs, m1).orderBy("doc_id").collect().toSeq
    assert(e1 == e2)
    // subword count can never undercut one symbol per word
    assert(e1.forall(r => r.getAs[Long]("n_subwords") >= r.getAs[Long]("n_tokens")))
  }
}
