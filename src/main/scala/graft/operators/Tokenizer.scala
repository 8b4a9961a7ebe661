package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Corpus-scale BPE tokenizer training (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the
  * vocabulary-building pass of a training-data pipeline.
  *
  * Scale shape: the ONLY corpus-sized stage is the token-type
  * histogram — one map-side-combined aggregate over the row-local
  * `token_tf` kernel (type counts, not occurrences, cross partial
  * buffers). Merge learning then runs on the TYPE table, which is
  * bounded by `maxTypes` (top types by count, the standard trainer
  * discipline — sentencepiece/subword-nmt collect exactly this table
  * in memory): pair statistics over a few hundred thousand types ×
  * avg word length are driver-trivial next to one corpus scan, and
  * every executor needs the finished merge list anyway. Encoding
  * broadcasts the learned ranks back and is one `mapPartitions` pass —
  * the corpus is never shuffled.
  *
  * Determinism: the histogram is exact integer counts; the sample cut
  * orders by (count desc, token asc); each round's merge pick breaks
  * count ties on the lexicographically smallest (left, right) pair —
  * bit-identical merges on every run, engine, and cluster layout.
  */
object Tokenizer {

  /** End-of-word marker (subword-nmt convention): keeps a word-final
    * subword distinct from the same subword mid-word.
    */
  val Eow = "</w>"

  /** Learned merge: `rank`-th merge joins (left, right) → left+right;
    * `pair_count` is the weighted pair frequency at pick time.
    */
  final case class BpeMerge(rank: Int, left: String, right: String,
      pair_count: Long)

  /** Distributed token-type histogram: (token, corpus count), bounded
    * to the `maxTypes` most frequent types (ties to the smaller token
    * string). TakeOrderedAndProject keeps the cut O(maxTypes) per
    * partition — no global sort.
    */
  def typeHistogram(docs: DataFrame, maxTypes: Int,
      textCol: String = "text"): DataFrame =
    docs.select(explode(
        graft.functions.Sketch.token_tf_text(col(textCol))).as("p"))
      .groupBy(col("p.tok").as("tok"))
      .agg(sum(col("p.tf")).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(maxTypes)

  /** Learn `numMerges` BPE merges from the corpus. Returns the ordered
    * merge list (driver-side) — [[bpeMerges]] wraps it as a DataFrame,
    * [[bpeEncode]] applies it.
    */
  def bpeTrain(docs: DataFrame, numMerges: Int, maxTypes: Int = 100000,
      textCol: String = "text"): Seq[BpeMerge] = {
    val types: Array[(String, Long)] = typeHistogram(docs, maxTypes, textCol)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainFromTypes(types, numMerges)
  }

  /** The merge loop over a (token, count) type table — pure function of
    * its input, separated for testability. Incremental pair-stat
    * maintenance (the subword-nmt discipline): pair counts, a
    * (count desc, pair asc)-sorted pick structure, and a pair→words
    * occurrence index are built once, then each merge touches ONLY the
    * words containing the merged pair — O(affected · len) per round
    * instead of rescanning every type, which is what lets a real
    * 32k–50k-merge vocabulary train in seconds where the naive
    * O(merges · types · len) rescan loop cannot. Byte-identical merges
    * to [[trainFromTypesNaive]] (spec-pinned): same weighted counts,
    * same max-count pick with ties to the smallest (left, right), same
    * stop when no pair repeats.
    */
  private[graft] def trainFromTypes(types: Array[(String, Long)],
      numMerges: Int): Seq[BpeMerge] = {
    type Pair = (String, String)
    val prepared = types.iterator.map { case (w, c) =>
      val chars = w.map(_.toString).toArray
      if (chars.nonEmpty)
        chars(chars.length - 1) = chars(chars.length - 1) + Eow
      (chars, c)
    }.filter(_._1.nonEmpty).toArray
    val words: Array[Array[String]] = prepared.map(_._1)
    val wcount: Array[Long] = prepared.map(_._2)

    val counts = new java.util.HashMap[Pair, Long]()
    // (count, left, right) ordered count DESC then pair ASC: first() is
    // exactly the naive scan's pick (max count, ties to smallest pair)
    val ord = new java.util.Comparator[(Long, String, String)] {
      def compare(a: (Long, String, String), b: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(b._1, a._1)
        if (c != 0) c
        else {
          val l = a._2.compareTo(b._2)
          if (l != 0) l else a._3.compareTo(b._3)
        }
      }
    }
    val sorted = new java.util.TreeSet[(Long, String, String)](ord)
    val occ = new java.util.HashMap[Pair, java.util.HashSet[Integer]]()

    def bump(p: Pair, delta: Long): Unit = {
      val old = counts.getOrDefault(p, 0L)
      if (old != 0L) sorted.remove((old, p._1, p._2))
      val nv = old + delta
      if (nv != 0L) {
        counts.put(p, nv)
        sorted.add((nv, p._1, p._2))
        ()
      } else {
        counts.remove(p)
        ()
      }
    }
    def addWordPairs(wi: Int): Unit = {
      val syms = words(wi); val c = wcount(wi)
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        bump(p, c)
        occ.computeIfAbsent(p, _ => new java.util.HashSet[Integer]())
          .add(wi)
        i += 1
      }
    }
    def removeWordPairs(wi: Int): Unit = {
      val syms = words(wi); val c = wcount(wi)
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        bump(p, -c)
        val s = occ.get(p)
        if (s != null) { s.remove(Integer.valueOf(wi)); () }
        i += 1
      }
    }
    words.indices.foreach(addWordPairs)

    val merges = scala.collection.mutable.ArrayBuffer.empty[BpeMerge]
    var rank = 0
    while (rank < numMerges && !sorted.isEmpty && sorted.first()._1 >= 2L) {
      val (bc, l, r) = sorted.first()
      merges += BpeMerge(rank, l, r, bc)
      val joined = l + r
      val affected = occ.get((l, r))
      val idxs =
        if (affected == null) Array.empty[Int]
        else {
          val a = new Array[Int](affected.size)
          val it = affected.iterator()
          var i = 0
          while (it.hasNext) { a(i) = it.next(); i += 1 }
          a
        }
      java.util.Arrays.sort(idxs)
      idxs.foreach { wi =>
        val syms = words(wi)
        removeWordPairs(wi)
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            out += joined; i += 2
          } else { out += syms(i); i += 1 }
        }
        words(wi) = out.toArray
        addWordPairs(wi)
      }
      rank += 1
    }
    merges.toSeq
  }

  /** The reference-shape O(merges · types · len) rescan trainer, kept
    * as the parity oracle for [[trainFromTypes]].
    */
  private[graft] def trainFromTypesNaive(types: Array[(String, Long)],
      numMerges: Int): Seq[BpeMerge] = {
    // word → current symbol sequence (chars + </w> on the last symbol)
    var words: Array[(Array[String], Long)] = types.map { case (w, c) =>
      val chars = w.map(_.toString).toArray
      if (chars.isEmpty) (chars, c)
      else { chars(chars.length - 1) = chars(chars.length - 1) + Eow; (chars, c) }
    }.filter(_._1.nonEmpty)
    val merges = scala.collection.mutable.ArrayBuffer.empty[BpeMerge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val pairCounts = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          pairCounts.merge((syms(i), syms(i + 1)), c, (a, b) => a + b)
          i += 1
        }
      }
      // pick: max count, ties to the smallest (left, right)
      var best: (String, String) = null
      var bestC = 0L
      val it = pairCounts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val p = e.getKey
        if (e.getValue > bestC || (e.getValue == bestC && best != null &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestC = e.getValue
        }
      }
      if (best == null || bestC < 2) done = true
      else {
        merges += BpeMerge(rank, best._1, best._2, bestC)
        val joined = best._1 + best._2
        words = words.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
                out += joined; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, c)
          }
        }
        rank += 1
      }
    }
    merges.toSeq
  }

  /** The learned merge table as a DataFrame — the declared-query form
    * (rank is the merge priority; replaying the table reproduces the
    * tokenizer, which is what a vocabulary artifact must allow).
    */
  def bpeMerges(docs: DataFrame, numMerges: Int,
      maxTypes: Int = 100000, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeTrain(docs, numMerges, maxTypes, textCol)
      .toDF("rank", "left", "right", "pair_count")
      .select(col("rank").cast("bigint").as("rank"), col("left"), col("right"),
        col("pair_count"))
  }

  /** Apply learned merges: one broadcast `mapPartitions` pass emitting
    * (doc_id, n_tokens, n_subwords, subword preview). Greedy
    * lowest-rank-first merging per word — the standard BPE encode; the
    * per-word segmentations are memoized per partition (Zipf makes the
    * hit rate ~the token-type/token-occurrence ratio).
    */
  def bpeEncode(docs: DataFrame, merges: Seq[BpeMerge],
      textCol: String = "text", idCol: String = "doc_id",
      previewN: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rankOf: Map[(String, String), Int] =
      merges.map(m => (m.left, m.right) -> m.rank).toMap
    val bc = spark.sparkContext.broadcast(rankOf)
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val ranks = bc.value
        val memo = new java.util.HashMap[String, Array[String]]()
        def encodeWord(w: String): Array[String] = {
          val hit = memo.get(w)
          if (hit != null) return hit
          var syms = w.map(_.toString).toArray
          if (syms.nonEmpty)
            syms(syms.length - 1) = syms(syms.length - 1) + Eow
          var continue = syms.length >= 2
          while (continue) {
            var bestI = -1
            var bestR = Int.MaxValue
            var i = 0
            while (i < syms.length - 1) {
              val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
              if (r < bestR) { bestR = r; bestI = i }
              i += 1
            }
            if (bestI < 0) continue = false
            else {
              val out = new Array[String](syms.length - 1)
              System.arraycopy(syms, 0, out, 0, bestI)
              out(bestI) = syms(bestI) + syms(bestI + 1)
              System.arraycopy(syms, bestI + 2, out, bestI + 1,
                syms.length - bestI - 2)
              syms = out
              continue = syms.length >= 2
            }
          }
          memo.put(w, syms)
          syms
        }
        it.map { case (id, text) =>
          val words = text.split(" ").filter(_.nonEmpty)
          var nSub = 0L
          val preview = new scala.collection.mutable.ArrayBuffer[String](previewN)
          words.foreach { w =>
            val syms = encodeWord(w)
            nSub += syms.length
            var i = 0
            while (i < syms.length && preview.length < previewN) {
              preview += syms(i); i += 1
            }
          }
          (id, words.length.toLong, nSub, preview.mkString(" "))
        }
      }
      .toDF(idCol, "n_tokens", "n_subwords", "subword_preview")
  }

  /** The greedy lowest-rank-first BPE word encoder as a reusable,
    * memoizing closure — ONE instance per partition (the memo is the
    * Zipf cache). Shared by [[bpeEncode]]-style passes and the
    * token-id export ([[bpeEncodeIds]]). */
  private[graft] def subwordEncoder(
      ranks: Map[(String, String), Int]): String => Array[String] = {
    val memo = new java.util.HashMap[String, Array[String]]()
    (w: String) => {
      val hit = memo.get(w)
      if (hit != null) hit
      else {
        var syms = w.map(_.toString).toArray
        if (syms.nonEmpty)
          syms(syms.length - 1) = syms(syms.length - 1) + Eow
        var continue = syms.length >= 2
        while (continue) {
          var bestI = -1
          var bestR = Int.MaxValue
          var i = 0
          while (i < syms.length - 1) {
            val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
            if (r < bestR) { bestR = r; bestI = i }
            i += 1
          }
          if (bestI < 0) continue = false
          else {
            val out = new Array[String](syms.length - 1)
            System.arraycopy(syms, 0, out, 0, bestI)
            out(bestI) = syms(bestI) + syms(bestI + 1)
            System.arraycopy(syms, bestI + 2, out, bestI + 1,
              syms.length - bestI - 2)
            syms = out
            continue = syms.length >= 2
          }
        }
        memo.put(w, syms)
        syms
      }
    }
  }

  /** Deterministic subword VOCABULARY for a merge list over a corpus:
    * every distinct subword the encode emits, sorted ascending, id =
    * 0-based rank — the `vocab.json` a shipped tokenizer carries.
    * Driver-side map (a vocabulary is bounded by merges + alphabet,
    * thousands of entries, never corpus-scale). */
  def bpeVocab(docs: DataFrame, merges: Seq[BpeMerge],
      textCol: String = "text"): Map[String, Int] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rankOf = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val bc = spark.sparkContext.broadcast(rankOf)
    docs.select(col(textCol)).as[String]
      .mapPartitions { it =>
        val enc = subwordEncoder(bc.value)
        val seen = new java.util.HashSet[String]()
        it.foreach { text =>
          text.split(" ").iterator.filter(_.nonEmpty)
            .foreach(w => enc(w).foreach(seen.add))
        }
        import scala.jdk.CollectionConverters._
        seen.iterator().asScala
      }
      .distinct().collect().sorted.zipWithIndex.toMap
  }

  /** Encode the corpus into TOKEN-ID space: per document, the chunk
    * table of its subword-id sequence — `(doc_id, chunk_idx, n_ids,
    * ids_sum)` with the [[graft.functions.Sketch.chunkTexts]] walk
    * (`nChunks = (len-1)/stride + 1`, empty doc → one empty chunk)
    * applied to the ID ARRAY. The ids themselves never shuffle — only
    * the narrow per-chunk stats leave the encode pass (the 100 TB
    * export writes ids partition-locally; `ids_sum` is the checksum a
    * consumer verifies a shard against). OOV subwords (absent from the
    * vocabulary) map to -1. */
  def bpeChunkIds(docs: DataFrame, merges: Seq[BpeMerge],
      vocab: Map[String, Int], chunkSize: Int, stride: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(chunkSize > 0 && stride > 0,
      "chunkSize and stride must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val rankOf = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val bcRanks = spark.sparkContext.broadcast(rankOf)
    val bcVocab = spark.sparkContext.broadcast(vocab)
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .flatMap { case (id, text) =>
        val enc = encoderTL.get()(bcRanks.value)
        val v = bcVocab.value
        val ids = text.split(" ").iterator.filter(_.nonEmpty)
          .flatMap(w => enc(w).iterator.map(sw => v.getOrElse(sw, -1)))
          .toArray
        val n = ids.length
        val nChunks = if (n == 0) 1 else (n - 1) / stride + 1
        (0 until nChunks).iterator.map { c =>
          val start = c * stride
          val end = math.min(n, start + chunkSize)
          var s = 0L
          var i = start
          while (i < end) { s += ids(i); i += 1 }
          (id, c.toLong, (end - start).toLong, s)
        }
      }
      .toDF(idCol, "chunk_idx", "n_ids", "ids_sum")
  }

  // one memoizing encoder per (thread, rank-map identity): flatMap has
  // no per-partition hook, and rebuilding the memo per DOCUMENT would
  // forfeit the Zipf cache that makes the encode cheap
  private val encoderTL: ThreadLocal[
      Map[(String, String), Int] => (String => Array[String])] =
    ThreadLocal.withInitial { () =>
      var last: Map[(String, String), Int] = null
      var lastEnc: String => Array[String] = null
      (ranks: Map[(String, String), Int]) => {
        if (lastEnc == null || (ranks ne last)) {
          last = ranks
          lastEnc = subwordEncoder(ranks)
        }
        lastEnc
      }
    }
}
