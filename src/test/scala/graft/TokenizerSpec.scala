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

  test("bpeVocab is the sorted distinct subword set; bpeChunkIds walks " +
      "the ID sequence with chunk_texts semantics and exact checksums") {
    import spark.implicits._
    import graft.operators.Tokenizer
    val docs = Seq(
      (1L, "aa ab aa ab aa"),
      (2L, "zq"),
      (3L, "")).toDF("doc_id", "text")
    val merges = Tokenizer.bpeTrain(docs, numMerges = 4)
    val vocab = Tokenizer.bpeVocab(docs, merges)
    // vocabulary: deterministic 0-based ids over the sorted subwords
    assert(vocab.keys.toSeq.sorted.zipWithIndex.forall {
      case (sw, i) => vocab(sw) == i })
    // independent recompute: encoder -> vocab ids -> hand chunk walk
    val enc = Tokenizer.subwordEncoder(
      merges.map(m => (m.left, m.right) -> m.rank).toMap)
    def idsOf(text: String): Array[Int] =
      text.split(" ").filter(_.nonEmpty)
        .flatMap(w => enc(w).map(vocab.getOrElse(_, -1)))
    val got = Tokenizer.bpeChunkIds(docs, merges, vocab,
        chunkSize = 3, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    Seq(1L -> "aa ab aa ab aa", 2L -> "zq", 3L -> "").foreach {
      case (id, text) =>
        val ids = idsOf(text)
        val n = ids.length
        val nChunks = if (n == 0) 1 else (n - 1) / 2 + 1
        (0 until nChunks).foreach { c =>
          val slice = ids.slice(c * 2, math.min(n, c * 2 + 3))
          assert(got((id, c.toLong)) ==
            ((slice.length.toLong, slice.map(_.toLong).sum)),
            s"doc $id chunk $c")
        }
        assert(!got.contains((id, nChunks.toLong)))
    }
    // OOV subwords (vocab from a different corpus) map to -1
    val oov = Tokenizer.bpeChunkIds(
      Seq((9L, "xyz")).toDF("doc_id", "text"), merges,
      Map("a" -> 0), chunkSize = 10, stride = 10).collect()
    assert(oov.length == 1 &&
      oov.head.getLong(3) == -1L * oov.head.getLong(2))
  }

  test("packSequencesBpe: id-space shards/packing golden — the greedy " +
      "walk closes on budget overflow and totals derive from the " +
      "overlapped chunk table correctly") {
    import spark.implicits._
    import graft.operators.{TextAnalysis, Tokenizer}
    // one long doc + several short ones; trained merges compress 'aaaa'
    val docs = Seq(
      (1L, Array.fill(10)("aaaa").mkString(" ")),
      (2L, "bb bb"),
      (3L, "aaaa bb")).toDF("doc_id", "text")
    val merges = Tokenizer.bpeTrain(docs, numMerges = 6)
    val vocab = Tokenizer.bpeVocab(docs, merges)
    val enc = Tokenizer.subwordEncoder(
      merges.map(m => (m.left, m.right) -> m.rank).toMap)
    def nIds(text: String): Long =
      text.split(" ").filter(_.nonEmpty).map(w => enc(w).length.toLong).sum
    val out = TextAnalysis.packSequencesBpe(docs, merges, vocab,
        seqBudget = 4L, shardBudget = 1000L, chunkSize = 3, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // single shard (budget 1000 over a tiny corpus)
    assert(out.map(_._1).distinct.toSeq == Seq(0L))
    // every chunk appears exactly once, in (doc, chunk) order
    val inOrder = out.sortBy(r => (r._2, r._3)).map(r => (r._4, r._5))
    assert(inOrder.toSeq ==
      inOrder.toSeq.sorted, inOrder.mkString(", "))
    // expected chunk lengths: non-overlapping windows of 3 over each
    // doc's id count; the greedy walk packs until >4 would overflow
    val lens = Seq(1L, 2L, 3L).flatMap { id =>
      val n = nIds(docs.collect().find(_.getLong(0) == id).get.getString(1))
      val nChunks = if (n == 0) 1 else ((n - 1) / 3 + 1).toInt
      (0 until nChunks).map { c =>
        (id, c.toLong, math.min(n - c * 3, 3L))
      }
    }
    // replay the pack walk independently and compare sequence ids
    var seqIdx = 0L; var fill = 0L
    val expectSeqs = lens.map { case (id, c, n) =>
      if (fill > 0 && fill + n > 4L) { seqIdx += 1; fill = 0L }
      fill += n
      (id, c) -> seqIdx
    }.toMap
    out.foreach { case (_, sIdx, _, docId, chunkIdx, n) =>
      assert(expectSeqs((docId, chunkIdx)) == sIdx,
        s"doc $docId chunk $chunkIdx: seq $sIdx vs ${expectSeqs((docId, chunkIdx))}")
      assert(n == lens.find(l => l._1 == docId && l._2 == chunkIdx).get._3)
    }
    // deterministic across invocations
    val again = TextAnalysis.packSequencesBpe(docs, merges, vocab,
        seqBudget = 4L, shardBudget = 1000L, chunkSize = 3, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.sortBy(r => (r._2, r._3)).toSeq ==
      again.sortBy(r => (r._2, r._3)).toSeq)
  }
}
