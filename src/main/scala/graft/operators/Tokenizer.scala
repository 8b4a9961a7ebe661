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
        graft.functions.Sketch.token_tf(TextAnalysis.tokens(col(textCol)))).as("p"))
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
    * its input, separated for testability. Each round counts weighted
    * adjacent-symbol pairs across all types, merges the most frequent
    * pair everywhere, and stops early when no pair repeats.
    */
  private[graft] def trainFromTypes(types: Array[(String, Long)],
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
}
