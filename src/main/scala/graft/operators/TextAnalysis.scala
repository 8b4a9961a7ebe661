package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.CacheRegistry

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. Everything
  * is a row-local projection built from codegen'd built-ins (no UDF, no
  * shuffle) — at 100 TB these run at parquet-scan speed and feed the
  * dedup / filtering stages.
  */
object TextAnalysis {

  import graft.functions.{PiiScan, TextStats}

  /** Non-empty whitespace tokens. */
  def tokens(c: Column): Column = filter(split(c, " "), t => t =!= "")

  /** The fused single-pass stats kernel (see
    * [[graft.functions.TextStats]]): every count below is one array
    * element of one native expression evaluated once per row —
    * replacing the 4-6 interpreted HOF passes the first formulation
    * made over each document.
    */
  def stats(c: Column): Column = TextStats.text_stats(c)

  // ------------------------------------------------------- token counting

  /** Whitespace token count. */
  def tokenCountWhitespace(c: Column): Column = stats(c).getItem(1)

  /** BPE-ish subword count: letter runs, digit runs, and single
    * punctuation marks each count as one token (the usual pre-tokenizer
    * regex shape `[a-z]+|[0-9]+|[^a-z0-9 ]` over the lowercase text).
    */
  def tokenCountBpe(c: Column): Column = stats(c).getItem(8)

  // ------------------------------------------------------ quality scoring

  val StopwordsEn: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "it", "on", "for")

  /** Length / punctuation-ratio / stopword-ratio quality features.
    * try_divide: an EMPTY document has 0 chars and 0 tokens, and a
    * plain division aborts the job under ANSI (Spark 4's default) —
    * routine crawl input must score null ratios, not kill the pass. */
  def qualityFeatures(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val st = stats(col(textCol))
    docs.select(col(idCol),
      st.getItem(0).as("n_chars_c"),
      st.getItem(1).as("n_tokens"),
      round(try_divide(st.getItem(2).cast("double"), st.getItem(0)), 4)
        .as("punct_ratio"),
      round(try_divide(st.getItem(3).cast("double"), st.getItem(1)), 4)
        .as("stopword_ratio"))
  }

  // -------------------------------------------------------- language ID

  /** Tiny per-language function-word lists — the n-gram-free heuristic:
    * count function-word hits per language, argmax with a fixed
    * tie-break order (en > de > fr > es). (The lists are compiled into
    * the [[graft.functions.TextStats]] kernel.)
    */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "que"),
    "es" -> Seq("el", "los", "y", "es", "en", "un", "una", "por"),
  )

  /** Per-language hit counts + predicted language. */
  def langId(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val st = stats(col(textCol))
    val hits = Seq("en", "de", "fr", "es").zipWithIndex.map {
      case (lang, i) => lang -> st.getItem(4 + i)
    }
    val Seq(en, de, fr, es) = hits.map(_._2)
    docs.select(Seq(col(idCol)) ++
      hits.map { case (lang, c) => c.as(s"hits_$lang") } :+
      when(en >= de && en >= fr && en >= es, "en")
        .when(de >= fr && de >= es, "de")
        .when(fr >= es, "fr")
        .otherwise("es").as("pred_lang"): _*)
  }

  /** Hashed char-n-gram features (2–3-grams over the lowercased text
    * with a leading boundary space), count-normalized — the fastText
    * langid feature family. Shared by training and scoring so the two
    * can never skew. */
  private[graft] def charNgramFeatures(text: String, dim: Int): Array[Double] = {
    val f = new Array[Double](dim)
    if (text == null || text.isEmpty) return f
    val t = " " + text.toLowerCase
    var total = 0
    var n = 2
    while (n <= 3) {
      var i = 0
      while (i + n <= t.length) {
        var h = 7 * 31 + n
        var j = i
        while (j < i + n) { h = h * 31 + t.charAt(j); j += 1 }
        f(math.floorMod(h, dim)) += 1.0
        total += 1
        i += 1
      }
      n += 1
    }
    if (total > 0) {
      var i = 0
      while (i < dim) { f(i) /= total; i += 1 }
    }
    f
  }

  /** Trainable language-id — q40's PRODUCTION form (the fastText/CLD
    * shape): a multiclass softmax head over hashed char-n-gram
    * features, fit with the q87 classifier discipline — a BOUNDED,
    * hash-ordered, deterministic driver-side sample (never a
    * corpus-scale collect) and full-batch GD — on whatever labels the
    * caller supplies (typically the q40 stopword rule's, the p21
    * self-training pattern). Returns the label vocabulary in score
    * order and the (nc × dim+1) weight matrix (bias last).
    */
  def trainLangId(labeled: DataFrame, dim: Int = 512, epochs: Int = 40,
      lr: Double = 4.0, sampleN: Int = 4096, textCol: String = "text",
      labelCol: String = "lang", idCol: String = "doc_id")
      : (IndexedSeq[String], Array[Array[Double]]) = {
    val spark = labeled.sparkSession
    import spark.implicits._
    val sample = labeled
      .select(col(idCol).cast("long").as("id"), col(textCol).as("t"),
        col(labelCol).as("y"))
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(sampleN)
      .as[(Long, String, String)].collect().sortBy(_._1)
    require(sample.nonEmpty, "trainLangId needs a non-empty corpus")
    val langs = sample.map(_._3).distinct.sorted.toIndexedSeq
    val idx = langs.zipWithIndex.toMap
    val nc = langs.size
    val feats = sample.map(r => (charNgramFeatures(r._2, dim), idx(r._3)))
    val w = Array.ofDim[Double](nc, dim + 1)
    var ep = 0
    while (ep < epochs) {
      val g = Array.ofDim[Double](nc, dim + 1)
      feats.foreach { case (x, y) =>
        val logits = Array.tabulate(nc) { c =>
          var z = w(c)(dim)
          var i = 0
          while (i < dim) { z += w(c)(i) * x(i); i += 1 }
          z
        }
        val mx = logits.max
        val exps = logits.map(v => math.exp(v - mx))
        val zsum = exps.sum
        var c = 0
        while (c < nc) {
          val grad = exps(c) / zsum - (if (y == c) 1.0 else 0.0)
          var i = 0
          while (i < dim) { g(c)(i) += grad * x(i); i += 1 }
          g(c)(dim) += grad
          c += 1
        }
      }
      var c = 0
      while (c < nc) {
        var i = 0
        while (i <= dim) { w(c)(i) -= lr * g(c)(i) / feats.length; i += 1 }
        c += 1
      }
      ep += 1
    }
    (langs, w)
  }

  /** Score the corpus with a trained language-id head: one broadcast
    * row-local pass → (id, pred_lang). Argmax ties break to the
    * smaller label index (deterministic). */
  def scoreLangId(docs: DataFrame, langs: IndexedSeq[String],
      weights: Array[Array[Double]], dim: Int = 512,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast((langs, weights))
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val (ls, w) = bc.value
        val nc = ls.size
        it.map { case (id, text) =>
          val x = charNgramFeatures(text, dim)
          var best = 0
          var bestZ = Double.NegativeInfinity
          var c = 0
          while (c < nc) {
            var z = w(c)(dim)
            var i = 0
            while (i < dim) { z += w(c)(i) * x(i); i += 1 }
            if (z > bestZ) { bestZ = z; best = c }
            c += 1
          }
          (id, ls(best))
        }
      }
      .toDF(idCol, "pred_lang")
  }

  // ------------------------------------------------------ fingerprinting

  /** Set fingerprint: digest of the sorted distinct normalized token
    * set — equal iff the docs share exactly the same vocabulary
    * (order/multiplicity-insensitive near-dup key). The
    * normalize→split→distinct→sort→join chain is the native
    * [[graft.functions.TextStats.vocab_key]] kernel; md5 stays a
    * codegen'd built-in.
    */
  def vocabularyFingerprint(c: Column): Column =
    md5(TextStats.vocab_key(c).cast("binary"))

  /** Winnowing-style fingerprint set (rolling-hash document sketch):
    * hash every `k`-token shingle, then keep the minimum hash of each
    * sliding window of `w` consecutive shingle hashes (MOSS scheme).
    * Row-local; the distinct sketch is typically ~|shingles|/w values.
    */
  def winnowingFingerprints(c: Column, k: Int = 3, w: Int = 4): Column =
    // fused (round 13): tokenize + shingle + xxhash64 in one native
    // pass over the raw text — the distinct first-seen hash sequence
    // is byte-identical to the transform chain (winnowing is
    // position-sensitive, so the DISTINCT kernel, not the minhash
    // stream; DedupSpec parity pin)
    graft.functions.Sketch.winnow_min(
      graft.functions.Sketch.shingle_hash_distinct_text(c, k), w)

  // ------------------------------------------------- keyword extraction

  /** Rarity-weighted keywords: top-`k` tokens per document scored by
    * `tf × N/df` (term frequency × inverse document frequency as a
    * plain ratio). The ratio form is deliberate: `ln(N/df)` would rank
    * identically but puts a libm call between engines — IEEE division
    * is correctly rounded everywhere, `log` is only faithfully rounded,
    * and the declared queries hash across engines.
    *
    * Shape at scale: term frequencies come from the row-local native
    * `token_tf` kernel — the built-in route explodes every token
    * OCCURRENCE into a corpus-wide (doc, tok) hash aggregation, this
    * plan explodes only the per-doc DISTINCT (tok, tf) pairs with no
    * aggregation needed. The document-frequency side is a tiny
    * map-side-combined count joined back as a broadcast HASH join (not
    * a map-column `element_at`, which is a linear scan per lookup and
    * measured 20× slower on a 10³ vocabulary). One up-front exchange
    * on doc_id lets the final top-k group run shuffle-free; top-k
    * itself is a row-local collect+sort, (-score, tok) struct order ==
    * (score DESC, tok ASC), the declared tie-break. N comes from
    * parquet row-group metadata (count on the unprojected scan — no
    * data read).
    */
  def keywordScores(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", k: Int = 3): DataFrame = {
    // corpus size N as a broadcast 1-row aggregate, NOT docs.count():
    // the eager count was a whole extra job (scan + job-submission
    // floor) paid before the real one ever started; as a broadcast
    // subquery it rides the same action, and the count-only subtree
    // reads parquet row-group metadata, not data
    val nRow = docs.agg(count(lit(1)).as("n"))
    // the df aggregation and the scored join both consume the exploded
    // pairs, re-evaluating token_tf above the reused doc_id exchange.
    // Measured trade (sf1 probe): re-running the row-local kernel costs
    // less than a second exchange of the exploded pairs (1.31 s vs
    // 1.35 s) and far less than losing the scan fan-out (2.9 s).
    val exploded = docs
      .repartition(col(idCol))
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.Sketch.token_tf_text(col(textCol))).as("p"))
      .select(col("doc_id"), col("p.tok").as("tok"), col("p.tf").as("tf"))
    val dfs = exploded.groupBy("tok").agg(count(lit(1)).as("df"))
    exploded.join(broadcast(dfs), "tok")
      .crossJoin(broadcast(nRow))
      .withColumn("score", round(col("tf") * col("n") / col("df"), 4))
      .groupBy("doc_id")
      .agg(slice(array_sort(collect_list(
        struct((-col("score")).as("s"), col("tok").as("tok"), col("score").as("score")))),
        1, k).as("top"))
      .select(col("doc_id"), posexplode(col("top")).as(Seq("pos", "kv")))
      .select(col("doc_id"), (col("pos") + 1).cast("bigint").as("rnk"),
        col("kv.tok").as("tok"), col("kv.score").as("score"))
  }

  // ------------------------------------------------------ corpus filters

  /** Percentile length-band filter: keep documents whose length lies in
    * the [lo, hi] percentile band — the standard too-short/too-long cut
    * of a training-data pipeline. The two quantiles reduce to a single
    * broadcast row; the corpus itself is filtered in place (no shuffle,
    * no second scan of text).
    */
  def lengthBandFilter(docs: DataFrame, lenCol: String = "n_chars",
      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    val bounds = docs.agg(
      expr(s"percentile($lenCol, $lo)").as("lo"),
      expr(s"percentile($lenCol, $hi)").as("hi"))
    docs.crossJoin(broadcast(bounds))
      .filter(col(lenCol) >= col("lo") && col(lenCol) <= col("hi"))
      .drop("lo", "hi")
  }

  /** Deterministic hash-split sampling: a document lands in the sample
    * iff the leading hex byte of `md5(id)` falls below the threshold —
    * the reproducible train/validation split every pipeline needs
    * (`rand()` re-rolls per retry/run; a content-independent id hash
    * never does). `thresholdHex` of "2a" keeps ≈ 42/256 ≈ 16.4%.
    * Row-local, no shuffle.
    */
  def hashSample(docs: DataFrame, idCol: String = "doc_id",
      thresholdHex: String = "2a"): DataFrame =
    docs.withColumn("bucket", substring(md5(col(idCol).cast("string")), 1, 2))
      .filter(col("bucket") < thresholdHex)

  /** Group-aware train/val/test split (GroupShuffleSplit): the split is
    * a function of the GROUP key's hash, never the row, so every row of
    * a group (all events of a user, all documents of a source) lands in
    * the same fold — the leakage guard a per-row split silently lacks.
    * Row-local projection, no shuffle; thresholds are hex prefixes of
    * md5 ("cc" = 204/256 ≈ 80% train, "e6" = 230/256 ≈ +10% val).
    */
  def groupSplit(rows: DataFrame, groupCol: String,
      trainHex: String = "cc", valHex: String = "e6"): DataFrame = {
    require(trainHex < valHex, "trainHex must sort below valHex")
    rows.withColumn("_gb", substring(md5(col(groupCol).cast("string")), 1, 2))
      .withColumn("split",
        when(col("_gb") < trainHex, "train")
          .when(col("_gb") < valHex, "val")
          .otherwise("test"))
      .drop("_gb")
  }

  /** Deterministic shuffled shard assignment — the corpus → training
    * shards export. Shard = first hex char of the id hash (16 shards
    * here; thousands in a real export), position = rank of (hash, id)
    * within the shard, so the emitted order is a content-independent
    * global shuffle that is exactly reproducible across runs and
    * engines. The window over the shard key IS the write pattern:
    * one exchange on shard + in-partition sort, the same plan
    * `repartition(shard).sortWithinPartitions(hash)` would produce for
    * the actual file write, and parallelism scales with shard count.
    */
  def shardExport(rows: DataFrame, idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rowsH = rows.withColumn("_h", md5(col(idCol).cast("string")))
      .withColumn("shard", substring(col("_h"), 1, 1))
    val w = Window.partitionBy("shard").orderBy(col("_h"), col(idCol))
    rowsH.withColumn("pos", row_number().over(w).cast("bigint")).drop("_h")
  }

  /** Corpus vocabulary: token → total occurrences + document frequency,
    * df-pruned, top-N by count — the tokenizer-training / coverage-
    * audit pass. Reuses the row-local `token_tf` kernel (distinct
    * (tok, tf) pairs per document, so df is a plain count), one shuffle
    * on tok with map-side partial aggregation, and the top-N is
    * TakeOrderedAndProject — never a global sort of the vocabulary.
    */
  def vocabulary(docs: DataFrame, textCol: String = "text",
      minDf: Int = 5, topN: Int = 100): DataFrame =
    docs.select(explode(graft.functions.Sketch.token_tf_text(col(textCol))).as("p"))
      .select(col("p.tok").as("tok"), col("p.tf").as("tf"))
      .groupBy("tok")
      .agg(sum("tf").cast("bigint").as("n_occurrences"),
        count(lit(1)).cast("bigint").as("df"))
      .filter(col("df") >= minDf)
      .orderBy(col("n_occurrences").desc, col("tok"))
      .limit(topN)

  // ------------------------------------------------------------ chunking

  /** Fixed-size overlapping token windows — the standard corpus →
    * training-example split (chunk of `chunkSize` tokens every `stride`
    * tokens; `stride < chunkSize` gives the usual overlap so no span is
    * lost at a boundary). Pure row-local projection: the token array is
    * built once per row, window starts come from `sequence`, each chunk
    * is a `slice` — no shuffle, no UDF, chunking 100 TB runs at scan
    * speed. Empty documents emit one empty chunk (chunk_idx 0), so
    * every input doc is represented downstream.
    */
  def chunkDocuments(docs: DataFrame, chunkSize: Int = 64, stride: Int = 48,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    // one row-local native pass (see [[graft.functions.Sketch
    // .chunkTexts]]): exploding start positions first duplicates the
    // token array once per chunk (≈ len/stride × the corpus for long
    // documents), and the transform-lambda route pays interpreted
    // per-element evaluation
    docs
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.Sketch.chunk_texts(
          tokens(col(textCol)), chunkSize, stride)).as("c"))
      .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
        col("c.n_tokens").as("n_tokens"), col("c.chunk_text").as("chunk_text"))
  }

  /** Greedy sequence packing — the step between [[chunkDocuments]] and
    * a training run: pack chunks, in (doc_id, chunk_idx) order, into
    * training sequences holding at most `seqBudget` tokens (close the
    * open sequence exactly when the next chunk would overflow it; an
    * oversized chunk sits alone). Packing is scoped per
    * [[tokenBudgetShards]] shard — the distribution unit a training
    * job reads — which is what makes the stateful walk scale-correct:
    * a shard's chunks are bounded by its token budget, so per-shard
    * packing is a bounded in-memory `flatMapGroups` walk, and shards
    * pack in parallel. One shuffle on `shard`; the narrow
    * (shard, doc_id, chunk_idx, n_tokens) projection is all that
    * moves. Deterministic: the walk is a pure function of the ordered
    * chunk list. Caveat: zero-token chunks (empty documents) do not
    * advance the shard prefix sum, so a corpus dominated by empties
    * concentrates them in one shard — run the curation cut (q60/q62)
    * before packing, as a real pipeline does.
    *
    * @return (shard, seq_idx, seq_pos, doc_id, chunk_idx, n_tokens) —
    *         `seq_idx` counts sequences within the shard, `seq_pos`
    *         the 1-based chunk position within its sequence
    */
  def packSequences(docs: DataFrame, seqBudget: Long = 256L,
      shardBudget: Long = 4000L, chunkSize: Int = 64, stride: Int = 48,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(seqBudget > 0, "seqBudget must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val chunks = chunkDocuments(docs, chunkSize, stride, textCol, idCol)
      .select(col("doc_id"), col("chunk_idx"), col("n_tokens"))
    val shards = tokenBudgetShards(docs, shardBudget, textCol, idCol)
      .select(col("doc_id"), col("shard"))
    chunks.join(shards, "doc_id")
      .select(col("shard"), col("doc_id"), col("chunk_idx"), col("n_tokens"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (shard, it) =>
        val rows = it.toArray.sortBy(r => (r._2, r._3))
        var seqIdx = 0L
        var fill = 0L
        var pos = 0L
        rows.iterator.map { case (_, docId, chunkIdx, n) =>
          if (fill > 0 && fill + n > seqBudget) { seqIdx += 1; fill = 0L; pos = 0L }
          fill += n
          pos += 1
          (shard, seqIdx, pos, docId, chunkIdx, n)
        }
      }
      .toDF("shard", "seq_idx", "seq_pos", "doc_id", "chunk_idx", "n_tokens")
  }

  /** [[packSequences]] in TOKEN-ID space — what a training job
    * actually consumes: documents encode through the PERSISTED BPE
    * merges + vocabulary ([[Tokenizer.bpeChunkIds]], broadcast
    * memoized encode — no re-learn), chunk windows walk the subword-id
    * sequence, shards cut by SUBWORD budget
    * ([[tokenBudgetShardsFromCounts]] — whitespace counts would skew
    * shard sizes by the fertility ratio), and the same greedy walk
    * packs chunks into ≤`seqBudget`-id training sequences. Output
    * carries `ids_sum` per chunk — the checksum an export consumer
    * verifies a shard against.
    *
    * Scale shape: ids never shuffle (the encode emits narrow per-chunk
    * stats); one exchange on `shard`; merges+vocab ride the closure
    * broadcast. Doc totals derive from the chunk table
    * (`(nChunks-1)·stride + lastLen` — chunk windows overlap, so
    * summing them would overcount), not a second encode pass.
    */
  def packSequencesBpe(docs: DataFrame,
      merges: Seq[graft.operators.Tokenizer.BpeMerge],
      vocab: Map[String, Int], seqBudget: Long = 256L,
      shardBudget: Long = 4000L, chunkSize: Int = 64, stride: Int = 48,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(seqBudget > 0, "seqBudget must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val chunks = CacheRegistry.persist(graft.operators.Tokenizer
      .bpeChunkIds(docs, merges, vocab, chunkSize, stride, textCol, idCol))
    val totals = chunks.groupBy(col(idCol).as("doc_id"))
      .agg(((max(col("chunk_idx"))) * lit(stride.toLong) +
        max_by(col("n_ids"), col("chunk_idx"))).as("n_tokens"))
    val shards = tokenBudgetShardsFromCounts(totals, shardBudget)
      .select(col("doc_id"), col("shard"))
    val out = chunks
      .select(col(idCol).as("doc_id"), col("chunk_idx"), col("n_ids"),
        col("ids_sum"))
      .join(shards, "doc_id")
      .select(col("shard"), col("doc_id"), col("chunk_idx"),
        col("n_ids"), col("ids_sum"))
      .as[(Long, Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (shard, it) =>
        val rows = it.toArray.sortBy(r => (r._2, r._3))
        var seqIdx = 0L
        var fill = 0L
        var pos = 0L
        rows.iterator.map { case (_, docId, chunkIdx, n, idsSum) =>
          if (fill > 0 && fill + n > seqBudget) {
            seqIdx += 1; fill = 0L; pos = 0L
          }
          fill += n
          pos += 1
          (shard, seqIdx, pos, docId, chunkIdx, n, idsSum)
        }
      }
      .toDF("shard", "seq_idx", "seq_pos", "doc_id", "chunk_idx",
        "n_ids", "ids_sum")
    out
  }

  // -------------------------------------------------------- PII redaction

  /** Deterministic email/phone regexes — kept dialect-neutral (no
    * lookaround, no shorthand classes that differ) so the same pattern
    * runs under Java regex here and RE2 in the DuckDB oracle. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9][0-9 ]{7,}[0-9]"

  /** PII scrub: count and redact email addresses and international
    * phone numbers (the minimum viable pre-training scrub). Row-local,
    * no shuffle. The regex formulation (even `contains`-gated on the
    * pattern anchor chars) was the one 8× bench miss at sf1 — Java's
    * backtracking engine pays O(text × run-length) per PII-bearing
    * document where an automaton pays O(text). [[PiiScan]] replaces it
    * with hand-rolled leftmost-greedy scanners (fuzz-verified
    * equivalent to the regexes) that anchor on indexOf probes: counts
    * on the original text, redaction composed email-then-phone, one
    * struct kernel per row inside whole-stage codegen. The projection
    * boundary below keeps the kernel evaluated once (the q62 lesson:
    * conditional consumers defeat codegen subexpression elimination).
    */
  def redactPii(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        PiiScan.pii_scan(col(textCol)).as("_pii"))
      .select(col("doc_id"),
        col("_pii.n_emails").as("n_emails"),
        col("_pii.n_phones").as("n_phones"),
        col("_pii.redacted").as("redacted"))
      .withColumn("redacted_len", length(col("redacted")).cast("bigint"))

  // ---------------------------------------------------- class rebalancing

  /** Balanced class sample: downsample every stratum to the size of the
    * rarest one, keeping each class's rows with the smallest id-hash —
    * the deterministic class-rebalancing pass of a labeled-data
    * pipeline (`rand()` re-rolls per run; the hash never does).
    *
    * Distributed selection, not a per-class sort. A window rank over
    * each stratum caps parallelism at the number of classes (5 event
    * types = 5 tasks, measured 2.8× at sf1) and sorts every row of a
    * hot class. Instead: the md5 ordering is uniform, so split each
    * stratum into 256 hash-prefix buckets, build the per-bucket
    * histogram (map-side partial agg; strata × 256 rows), prefix-sum it
    * to locate each stratum's threshold bucket, then
    *  - buckets wholly below the cut pass with a broadcast join and NO
    *    shuffle of row data;
    *  - only the single boundary bucket per stratum (~1/256 of the
    *    class) is ranked, partitioned by (stratum, bucket).
    * The selected set is bit-identical to the rank-≤-nmin formulation
    * because the bucket is a prefix of the sort key. The histogram is
    * collected to the driver (strata × ≤256 rows — bounded for label
    * spaces, the operator's declared domain; same bounded-collect
    * contract as IVF's probe table) so the cut is computed once in
    * local code instead of as a chain of broadcast-construction jobs
    * that each rescan the source. The source is scanned twice
    * (pass-through branch + boundary branch) — at the design point two
    * narrow scans beat one full shuffle-sort of the corpus.
    */
  def balancedSample(rows: DataFrame, stratumCol: String,
      idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType}
    val spark = rows.sparkSession
    val h = md5(col(idCol).cast("string"))
    // the hashed projection feeds THREE consumers (histogram job,
    // pass-through branch, boundary branch) plus any report sort the
    // caller adds; persist() so the source is scanned and hashed
    // once — the histogram collect below is the action that
    // materializes the cache (no separate checkpoint job), and the
    // input is the caller's (id, stratum, …) projection, not the full
    // corpus row, so the cached footprint is small
    val withH = rows.withColumn("_h", h)
      .withColumn("_hb", substring(col("_h"), 1, 2))
      .transform(CacheRegistry.persist(_))
    val hist = withH.groupBy(col(stratumCol).as("_s"), col("_hb").as("_b"))
      .agg(count(lit(1)).as("_n")).collect()
    val byStratum = hist.groupBy(_.get(0))
    val nmin = if (byStratum.isEmpty) 0L
      else byStratum.valuesIterator.map(_.map(_.getLong(2)).sum).min
    val cut = byStratum.valuesIterator.flatMap { bs =>
      var before = 0L
      bs.sortBy(_.getString(1)).iterator.map { r =>
        val take = math.min(r.getLong(2), nmin - before)
        before += r.getLong(2)
        Row(r.get(0), r.getString(1), take, take < r.getLong(2))
      }.filter(_.getLong(2) > 0L)
    }.toSeq
    val cutSchema = StructType(Seq(
      StructField("_s", rows.schema(stratumCol).dataType),
      StructField("_b", StringType), StructField("_take", LongType),
      StructField("_partial", BooleanType)))
    def joined(p: Boolean) = withH.join(
      broadcast(spark.createDataFrame(
        spark.sparkContext.parallelize(cut.filter(_.getBoolean(3) == p), 1),
        cutSchema)),
      col(stratumCol) === col("_s") && col("_hb") === col("_b"))
    val whole = joined(p = false)
    val wr = Window.partitionBy(col(stratumCol), col("_hb"))
      .orderBy(col("_h"), col(idCol))
    val partial = joined(p = true)
      .withColumn("_rk", row_number().over(wr))
      .filter(col("_rk") <= col("_take"))
      .drop("_rk")
    whole.unionByName(partial)
      .drop("_h", "_hb", "_s", "_b", "_take", "_partial")
  }

  // ---------------------------------------------------- repetition ratio

  /** Intra-document repetition: the fraction of a document's word
    * bigrams that are repeats of a bigram already seen in the same
    * document (a Gopher-style quality signal — high values flag
    * boilerplate, keyword stuffing, decoding loops). Pure row-local
    * arithmetic: total bigrams = tokens-1, distinct bigrams from the
    * native shingle kernel; no shuffle, parquet-scan speed.
    */
  def repetitionFeatures(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = tokens(col(textCol))
    val total = greatest(size(toks) - 1, lit(1)).cast("bigint")
    val distinctGrams = size(Dedup.shingles(toks, 2)).cast("bigint")
    docs.select(col(idCol),
      total.as("n_bigrams"),
      distinctGrams.as("n_distinct"),
      round(lit(1.0) - distinctGrams.cast("double") / total, 4).as("rep_ratio"))
  }

  /** Gopher-style within-document repetition profile (Rae et al. 2021
    * §A1.1 "repetitious text" filters, the two signals q58's distinct-
    * bigram ratio doesn't capture): the character fraction taken by the
    * single most frequent 2-gram, and the fraction of token positions
    * covered by any 5-gram occurring at least twice in the document —
    * the standard cuts for keyword-stuffing and decoding-loop text.
    * One row-local [[graft.functions.Sketch.rep_gram_stats]] kernel
    * pass per document (no shuffle — runs at parquet-scan speed like
    * q58/q63); ties on the top gram break to the lexicographically
    * smallest so the profile is deterministic and oracle-checkable.
    */
  def repetitionProfile(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", nTop: Int = 2, nDup: Int = 5): DataFrame = {
    val toks = tokens(col(textCol))
    // projection boundary: materialize the kernel struct once (same
    // CollapseProject rule as curationDecisions — referencing the
    // kernel from several output columns must not re-run it)
    docs.select(col(idCol), length(col(textCol)).cast("bigint").as("nc"),
        size(toks).cast("bigint").as("n_tokens"),
        graft.functions.Sketch.rep_gram_stats(toks, nTop, nDup).as("st"))
      .select(col(idCol), col("n_tokens"),
        col("st.top_gram").as("top_gram"),
        col("st.top_cnt").as("top_cnt"),
        round(col("st.top_cnt") * length(col("st.top_gram")) /
          greatest(col("nc"), lit(1L)), 4).as("top_char_frac"),
        col("st.dup_covered").as("dup5_covered"),
        round(col("st.dup_covered").cast("double") /
          greatest(col("n_tokens"), lit(1L)), 4).as("dup5_frac"))
  }

  // ---------------------------------------------------- corpus curation

  /** End-to-end curation decision (the C4-style keep/drop pass): one
    * row per document with a keep flag and the FIRST failing rule as
    * the reason — length band, predicted language, repetition,
    * stopword floor, in that order. Everything row-local off the fused
    * [[graft.functions.TextStats]] kernel plus one broadcast quantile
    * row; the corpus text is scanned once.
    *
    * Thresholds are declared constants calibrated on the synthetic
    * corpus (see QueriesSpec); a production pipeline tunes them
    * per-corpus — the operator shape is the artifact.
    */
  def curationDecisions(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", lenCol: String = "n_chars",
      pLo: Double = 0.05, pHi: Double = 0.95,
      maxRep: Double = 0.06, minStopword: Double = 0.01,
      frozenBounds: Option[(Double, Double)] = None): DataFrame = {
    // frozenBounds: the incremental-funnel discipline — a delivery is
    // judged against the STORED corpus percentile bounds (q110-style
    // persisted stats), not its own tiny distribution
    val bounds = frozenBounds match {
      case Some((lo, hi)) =>
        docs.sparkSession.range(1).select(lit(lo).as("len_lo"),
          lit(hi).as("len_hi"))
      case None => docs.agg(
        expr(s"percentile($lenCol, $pLo)").as("len_lo"),
        expr(s"percentile($lenCol, $pHi)").as("len_hi"))
    }
    // Stage 1 materializes each expensive kernel exactly once as a
    // column. The projection boundary is load-bearing: referencing
    // `text_stats(text)` straight from the `when`-chain re-evaluates
    // the kernel per reference (conditional branches defeat codegen
    // subexpression elimination — measured 2.6× on this query), while
    // CollapseProject keeps a non-cheap alias referenced more than
    // once un-inlined.
    val signals = docs.crossJoin(broadcast(bounds)).select(
      col(idCol), col(lenCol), col("len_lo"), col("len_hi"),
      stats(col(textCol)).as("st"),
      size(Dedup.shingles(tokens(col(textCol)), 2)).cast("double")
        .as("n_distinct_bigrams"))
    val st = col("st")
    val Seq(en, de, fr, es) = (0 until 4).map(i => st.getItem(4 + i))
    val predLang = when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr").otherwise("es")
    // st[1] is the whitespace token count — same denominator as the
    // tokens()-based formulation, one kernel instead of a re-split
    val repRatio = lit(1.0) -
      col("n_distinct_bigrams") / greatest(st.getItem(1) - 1, lit(1)).cast("double")
    // try_divide: an empty doc (0 tokens) otherwise aborts under ANSI
    // whenever the too_short branch doesn't catch it first (len_lo = 0)
    val stopRatio = try_divide(st.getItem(3).cast("double"), st.getItem(1))
    val reason = when(col(lenCol) < col("len_lo"), "too_short")
      .when(col(lenCol) > col("len_hi"), "too_long")
      .when(predLang =!= "en", "lang")
      .when(round(repRatio, 4) > maxRep, "repetitive")
      .when(round(stopRatio, 4) < minStopword, "low_stopword")
      .otherwise("ok")
    signals.select(col(idCol), reason.as("reason"))
      .select(col(idCol), col("reason"), (col("reason") === "ok").as("keep"))
  }

  // -------------------------------------------------- span contamination

  /** Per-document exact-substring contamination: the fraction of a
    * document's distinct `n`-token shingles that also occur in at least
    * one OTHER document — the statistic behind span-level training-data
    * dedup (remove or down-weight documents made of recycled passages).
    *
    * Scale shape: shingling is the row-local native
    * [[graft.operators.Dedup.shingles]] kernel; both shuffles (the
    * document-frequency groupBy and the join back) carry only the
    * 8-byte `xxhash64` of each shingle, never shingle text. Collision
    * budget at 10^10 distinct shingles: ~10^-9 of grams mis-counted —
    * below any decision threshold this statistic feeds.
    */
  def spanContamination(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 8): DataFrame = {
    val exploded = docs
      .select(col(idCol).as("doc_id"),
        explode(Dedup.shingles(tokens(col(textCol)), n)).as("gram"))
      .select(col("doc_id"), xxhash64(col("gram")).as("gh"))
    val docFreq = exploded.groupBy("gh")
      .agg(count_distinct(col("doc_id")).as("df"))
    exploded.join(docFreq, "gh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("shared_ratio",
        round(col("n_shared").cast("double") / col("n_shingles"), 4))
  }

  // ------------------------------------------------- shared-span removal

  /** Cross-document shared-span REMOVAL — the repair counterpart of
    * [[spanContamination]]'s statistic (the "dedup repeated substrings
    * across the corpus" operator of the exact-substring-dedup
    * literature): every token covered by an `n`-token shingle that
    * occurs in ≥ `minDf` documents is dropped, and the document is
    * re-assembled from the surviving tokens.
    *
    * Scale shape: only the 8-byte hash of each shingle moves through
    * the shuffle (collision semantics equivalent to
    * [[spanContamination]]); the per-document start-position sets are
    * small (bounded by token count) and join back to the text by
    * `doc_id` exactly once. For the default `minDf = 2`, "shared"
    * reduces to `min(doc_id) ≠ max(doc_id)` computed as a window over
    * the gram hash — the exploded positions shuffle by `gh` exactly
    * ONCE and the surviving (doc_id, pos) rows flow straight into the
    * per-document aggregation, where the aggregate+semi-join
    * formulation shuffles them by `gh` twice (measured 20% slower at
    * sf1). The general `minDf` path keeps the aggregate + semi-join
    * (distinct aggregates are not supported in window frames).
    * Per-start hashing and the covered-position test are native
    * codegen kernels ([[graft.functions.Sketch.gramHashPositions]],
    * [[graft.functions.Sketch.removeCovered]]): the HOF formulation
    * (`transform` over `sequence` + `filter`×`exists`) re-evaluates
    * arrays per element and scans starts per token — O(tokens·n²) and
    * O(tokens·starts) where the kernels are O(tokens·n) and
    * O(tokens + starts).
    */
  def removeSharedSpans(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 8, minDf: Int = 2): DataFrame = {
    // df >= 1 would be degenerate (every gram-covered token removed), and
    // the fast path below implements exactly df >= 2 — reject anything
    // lower rather than silently substituting df >= 2 semantics
    require(minDf >= 2, s"minDf must be >= 2 (got $minDf): df >= 1 would remove every gram-covered token")
    import graft.functions.Sketch
    // fused kernels (round 13): gram hashes and reassembly both run
    // straight over the raw text bytes — no token array materializes
    // and the corpus-scale token cache of the earlier formulation is
    // gone; the reassembly side re-reads the text, a plain columnar
    // re-scan
    val norm = docs.select(col(idCol).as("doc_id"),
      coalesce(col(textCol), lit("")).as("text"))
    val pos = norm.select(col("doc_id"),
      posexplode(Sketch.gram_hash_positions_text(col("text"), n))
        .as(Seq("pos", "gh")))
    val starts =
      if (minDf == 2) {
        // df >= 2 ⟺ min(doc_id) ≠ max(doc_id) over the gram's window:
        // one shuffle by gh, and the surviving rows feed the doc_id
        // aggregation directly
        val w = org.apache.spark.sql.expressions.Window.partitionBy("gh")
        pos
          .withColumn("_a", min(col("doc_id")).over(w))
          .withColumn("_b", max(col("doc_id")).over(w))
          .filter(col("_a") =!= col("_b"))
          .groupBy("doc_id")
          .agg(sort_array(collect_set(col("pos"))).as("starts"))
      } else {
        val shared = pos.groupBy("gh")
          .agg(count_distinct(col("doc_id")).as("df"))
          .filter(col("df") >= minDf).select("gh")
        pos.join(shared, Seq("gh"), "left_semi")
          .groupBy("doc_id")
          .agg(sort_array(collect_set(col("pos"))).as("starts"))
      }
    reassembleCutFused(norm, starts, n)
  }

  /** Shared reassembly tail of the span-cut family
    * ([[removeSharedSpans]], [[removeSharedSpansIncremental]],
    * [[decontaminateSpans]]): left-join the per-document sorted start
    * positions onto the tokenized corpus (absent = nothing cut), drop
    * covered tokens with the O(tokens + starts) native kernel, and
    * emit the family's output contract
    * (`doc_id`, `n_tokens`, `n_removed`, `cleaned_text`). */
  private def reassembleCutFused(norm: DataFrame, starts: DataFrame,
      n: Int): DataFrame = {
    import graft.functions.Sketch
    norm.join(starts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        Sketch.remove_covered_text(col("text"),
          coalesce(col("starts"), array().cast("array<int>")), n).as("r"))
      .select(col("doc_id"),
        col("r.n_tokens").as("n_tokens"),
        col("r.n_removed").as("n_removed"),
        col("r.cleaned_text").as("cleaned_text"))
  }

  /** Span-level decontamination — the surgical form of benchmark
    * leakage removal: cut from every corpus document each token
    * covered by an `n`-token window that occurs ANYWHERE in the
    * benchmark, keeping the document's clean remainder (where
    * [[graft.operators.Dedup.decontaminate]] drops whole documents on
    * exact text match and q96 only reports gram counts, this removes
    * the quoted eval item while saving the surrounding prose — the
    * Lee-et-al treatment applied to eval leakage). Output columns are
    * [[removeSharedSpans]]' (`n_tokens`, `n_removed`, `cleaned_text`).
    *
    * Scale shape: the benchmark reduces to a distinct 8-byte gram-hash
    * set that BROADCASTS (eval sets are tiny next to a training
    * corpus); the corpus's window hashes are row-local
    * (`gram_hash_positions`), matched `(doc_id, pos)` rows — leak-
    * bounded, not corpus-bounded — are the only exchange, and text
    * rides only the final per-document reassembly join.
    */
  def decontaminateSpans(corpus: DataFrame, benchmark: DataFrame,
      n: Int = 8, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    import graft.functions.Sketch
    val benchGrams = benchmark.select(
        explode(array_distinct(
          Sketch.gram_hash_positions_text(
            coalesce(col(textCol), lit("")), n))).as("gh"))
      .distinct()
    val norm = corpus.select(col(idCol).as("doc_id"),
      coalesce(col(textCol), lit("")).as("text"))
    val starts = norm.select(col("doc_id"),
        posexplode(Sketch.gram_hash_positions_text(col("text"), n))
          .as(Seq("pos", "gh")))
      .join(broadcast(benchGrams), Seq("gh"), "left_semi")
      .groupBy("doc_id")
      .agg(sort_array(collect_set(col("pos"))).as("starts"))
    reassembleCutFused(norm, starts, n)
  }

  // ----------------------------------------------- segment-level dedup

  /** Fixed-width segment-level exact deduplication — the
    * paragraph/line-dedup pass of the C4/CCNet/RefinedWeb lineage
    * applied at a fixed token granularity (this corpus carries no
    * newline structure, so the "line" is a `width`-token window): the
    * corpus is cut into non-overlapping `width`-token segments, each
    * distinct segment content keeps its FIRST global occurrence
    * (smallest `(doc_id, seg_idx)`) and every other occurrence —
    * including repeats inside the same document — is dropped, then
    * each document is re-assembled from its surviving segments.
    *
    * Differs from [[removeSharedSpans]] in both granularity and
    * policy: q74 cuts every occurrence of any ≥`minDf`-shared sliding
    * window (no keeper), while this keeps one canonical copy of each
    * segment, the boilerplate-removal semantics that preserve corpus
    * coverage (exactly one copy of every paragraph survives).
    *
    * Scale shape: segments are formed ROW-LOCAL (`transform` over a
    * bounded `sequence` + `slice`), and only `(gh, doc_id, seg_idx)`
    * — 8-byte hash plus ids, never text — reaches the one exchange by
    * `gh`, where keeper = `min(struct(doc_id, seg_idx))` over the
    * hash's window (the q74 one-shuffle discipline; collision
    * semantics equivalent, ~1e-7 at 1M segments). Loser rows
    * aggregate to per-document drop lists and join back to the
    * tokenized corpus by `doc_id` exactly once; re-assembly is
    * row-local. A degenerate segment shared by 10⁶ documents costs
    * 10⁶ window rows — linear, never the C(n,2) of a pair join.
    */
  def segmentDedup(docs: DataFrame, width: Int = 16,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(width >= 1, s"width must be >= 1 (got $width)")
    // null text coalesces to "" so the fused kernels see a real string
    val norm = docs.select(col(idCol).as("doc_id"),
      coalesce(col(textCol), lit("")).as("text"))
    // fused hashing: tokenize + window-hash in ONE native pass over
    // the raw text bytes — no token array is materialized, and the
    // corpus-scale token-array cache the pre-round-13 formulation
    // persisted (a 100 TB liability in executor storage) is gone; the
    // reassembly side re-reads the text instead, a plain columnar
    // re-scan
    val segs = norm.select(col("doc_id"),
        posexplode(graft.functions.Sketch
          .segment_hashes_text(col("text"), width))
          .as(Seq("seg_idx", "gh")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("gh")
    val drops = segs
      .withColumn("keeper", min(struct(col("doc_id"), col("seg_idx"))).over(w))
      .filter(col("keeper.doc_id") =!= col("doc_id") ||
        col("keeper.seg_idx") =!= col("seg_idx"))
      .groupBy("doc_id")
      .agg(sort_array(collect_set(col("seg_idx"))).as("drops"))
    reassembleSegmentsFused(norm, drops, width)
  }

  /** Shared q121/q121b reassembly: join the per-document sorted drop
    * lists back to the `(doc_id, text)` projection (ONE join by
    * doc_id) and rebuild each document in one fused native pass over
    * the raw text bytes — `remove_segments_text` tokenizes, skips
    * dropped windows and counts segments together (O(bytes + drops)),
    * so neither side of q121 ever materializes a token array and the
    * corpus-scale token cache of the pre-round-13 formulation is
    * gone. */
  private def reassembleSegmentsFused(norm: DataFrame, drops: DataFrame,
      width: Int): DataFrame =
    norm.join(drops, Seq("doc_id"), "left")
      .select(col("doc_id"),
        // coalesce the ARRAY before size(), never size() before
        // coalesce: with spark.sql.ansi.enabled=false, size(null) is
        // -1 (not null) and would pass straight through the coalesce
        size(coalesce(col("drops"), array().cast("array<int>")))
          .cast("bigint").as("n_dropped"),
        graft.functions.Sketch.remove_segments_text(col("text"),
          coalesce(col("drops"), array().cast("array<int>")), width)
          .as("r"))
      .select(col("doc_id"), col("r.n_segments").as("n_segments"),
        col("n_dropped"), col("r.cleaned_text").as("cleaned_text"))

  /** Segment keeper table — the PERSISTABLE state behind
    * [[segmentDedupIncremental]]: one `(gh, k_doc, k_seg)` row per
    * distinct segment content, carrying the smallest `(doc_id,
    * seg_idx)` occurrence seen (the [[segmentDedup]] keeper). Flat
    * columns, not a struct, so parquet zone maps prune on `gh` and the
    * schema stays engine-portable. */
  def segmentKeepers(docs: DataFrame, width: Int = 16,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        coalesce(col(textCol), lit("")).as("text"))
      .select(col("doc_id"),
        posexplode(graft.functions.Sketch
          .segment_hashes_text(col("text"), width))
          .as(Seq("seg_idx", "gh")))
      .groupBy(col("gh"))
      .agg(min(struct(col("doc_id"), col("seg_idx"))).as("k"))
      .select(col("gh"), col("k.doc_id").as("k_doc"),
        col("k.seg_idx").as("k_seg"))

  /** Incremental [[segmentDedup]] — the keep-first paragraph dedup at
    * DELIVERY time (q121b; what [[removeSharedSpansIncremental]] is to
    * q74): cut from each delivery document every segment occurrence
    * that is not the global first across `stored ∪ delivery`, where
    * the stored corpus is represented ONLY by its [[segmentKeepers]]
    * table. Because the keeper rule is a pure min over `(doc_id,
    * seg_idx)` and the doc sets are disjoint, the result is IDENTICAL
    * to running the batch operator over the full union and keeping the
    * delivery rows — a delivery occurrence survives iff it is the
    * delivery-side min for its hash AND no stored keeper precedes it.
    *
    * Scale shape (the q117 delivery discipline): the stored keeper
    * table is corpus-segment-scale and is NEVER broadcast — it is
    * scanned once, left-semi-pruned by the (delivery-bounded,
    * broadcast) delivery hash set; the min-merge aggregate runs AFTER
    * the prune, so `storedKeepers` may be the raw multi-delta union
    * ([[loadSegmentKeeperIndex]]) without a corpus-scale shuffle per
    * delivery. Everything after the prune is delivery-sized; text
    * appears only in the final reassembly. Output columns are the
    * batch operator's (`n_segments`, `n_dropped`, `cleaned_text`).
    *
    * `storedPrecedes = true` switches the keeper rule from the batch
    * operator's global `(doc_id, seg_idx)` min to CHRONOLOGICAL
    * precedence: a segment present in the stored state always drops
    * the delivery occurrence, whatever the ids. This is the rule a
    * STREAMING host needs — its earlier cleaned outputs are immutable,
    * so a later delivery carrying a smaller doc_id must lose to the
    * already-published copy or the corpus ends up with two (the
    * default bidirectional min is for the batch-split form, q121b,
    * whose oracle is batch-over-the-union and whose "stored" rows are
    * re-derivable).
    */
  def segmentDedupIncremental(delivery: DataFrame, storedKeepers: DataFrame,
      width: Int = 16, textCol: String = "text",
      idCol: String = "doc_id", storedPrecedes: Boolean = false): DataFrame = {
    // delivery-bounded: persisting the raw text is cheap and feeds
    // both the hash pass and the reassembly
    val norm = delivery.select(col(idCol).as("doc_id"),
        coalesce(col(textCol), lit("")).as("text"))
      .transform(CacheRegistry.persist(_))
    val segs = norm.select(col("doc_id"),
        posexplode(graft.functions.Sketch
          .segment_hashes_text(col("text"), width))
          .as(Seq("seg_idx", "gh")))
      .transform(CacheRegistry.persist(_))
    // stored keepers pruned to the delivery's hashes BEFORE the merge:
    // the broadcast build is the delivery hash set (delivery-bounded),
    // the corpus-scale keeper table streams through as the probe side;
    // the per-hash min-merge (raw deltas may repeat a hash) runs on the
    // delivery-sized remainder
    val sk = storedKeepers
      .join(broadcast(segs.select("gh").distinct()), Seq("gh"), "left_semi")
      .groupBy("gh")
      .agg(min(struct(col("k_doc").as("doc_id"),
        col("k_seg").as("seg_idx"))).as("skeeper"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("gh")
    // <= not <, so a delivery occurrence EQUAL to its stored keeper
    // (a redelivery after its own keepers were folded — outside the
    // disjoint-sets contract but not worth silently corrupting) stays
    // kept exactly as the pre-refactor `row > skeeper` drop rule kept it
    val storedLoses =
      if (storedPrecedes) lit(false)
      else struct(col("doc_id"), col("seg_idx")) <= col("skeeper")
    val drops = segs
      .withColumn("dkeeper", min(struct(col("doc_id"), col("seg_idx"))).over(w))
      .join(sk, Seq("gh"), "left")
      .filter(col("dkeeper.doc_id") =!= col("doc_id") ||
        col("dkeeper.seg_idx") =!= col("seg_idx") ||
        (col("skeeper").isNotNull && !storedLoses))
      .groupBy("doc_id")
      .agg(sort_array(collect_set(col("seg_idx"))).as("drops"))
    reassembleSegmentsFused(norm, drops, width)
  }

  /** Fold a delivery's keepers into the stored table under the BATCH
    * operator's bidirectional rule: the merged keeper per hash is the
    * min across both sides (disjoint doc sets make this exactly the
    * batch keeper over the union corpus) — the state update for a
    * q121b-style batch-split lifecycle, and the merge
    * [[compactSegmentKeeperIndex]] applies to live parts. The
    * STREAMING host deliberately does NOT use it: its outputs are
    * immutable once published, so it stores first-arrival keepers
    * (an anti-join of new hashes) instead of re-minimizing. */
  def foldSegmentKeepers(stored: DataFrame, deliveryKeepers: DataFrame): DataFrame =
    stored.unionByName(deliveryKeepers)
      .groupBy("gh")
      .agg(min(struct(col("k_doc").as("doc_id"),
        col("k_seg").as("seg_idx"))).as("k"))
      .select(col("gh"), col("k.doc_id").as("k_doc"),
        col("k.seg_idx").as("k_seg"))

  /** Persisted form of the [[segmentKeepers]] state — a fourth
    * [[graft.state.SlotStore]] client with the span-df lifecycle:
    * deliveries land as self-committing `seg-delta-<slot>` dirs
    * (O(delta) writes, stored deltas never rewritten), compactions as
    * `seg-snap-<slot>` (supersede every part with slot ≤ k BY
    * CONSTRUCTION — crash-safe), torn writes (no _SUCCESS) ignored. */
  def saveSegmentKeeperDelta(spark: org.apache.spark.sql.SparkSession,
      path: String, keepers: DataFrame, slot: Option[Long] = None,
      snapshot: Boolean = false): Unit = {
    val parts = segKeeperParts(spark, path)
    val next = slot.getOrElse(parts.map(_._2).foldLeft(-1L)(math.max) + 1)
    graft.state.SlotStore.requireNotSuperseded(parts, "seg-snap", next,
      "saveSegmentKeeperDelta")
    val kind = if (snapshot) "snap" else "delta"
    keepers.write.mode("overwrite").parquet(s"$path/seg-$kind-$next")
  }

  private def segKeeperParts(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, Long, String)] =
    graft.state.SlotStore.committedParts(spark, path,
      Seq("seg-delta", "seg-snap"))

  /** Committed slot numbers (deltas AND snapshots) — the replay-skip
    * set for a streaming host. */
  def committedSegmentKeeperSlots(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[Long] =
    segKeeperParts(spark, path).map(_._2)

  /** LIVE slot numbers: the latest snapshot (if any) plus every delta
    * after it — what [[loadSegmentKeeperIndex]] actually reads. */
  def liveSegmentKeeperSlots(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(Long, Boolean)] =
    graft.state.SlotStore.liveParts(segKeeperParts(spark, path),
      "seg-delta", "seg-snap")
      .map(p => (p._2, p._1 == "seg-snap"))

  /** Load the keeper index as the RAW union of live parts (latest
    * snapshot + later deltas) — a hash may appear once per part; the
    * per-hash min-merge is the consumer's job AFTER its own pruning
    * ([[segmentDedupIncremental]] merges post-semi-join, so a delivery
    * never pays a corpus-scale shuffle to read state). ONE flat
    * multi-path scan — the plan stays constant-size however many
    * deltas accrete. */
  def loadSegmentKeeperIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val parts = graft.state.SlotStore.liveParts(segKeeperParts(spark, path),
      "seg-delta", "seg-snap")
    require(parts.nonEmpty, s"no committed segment-keeper parts under $path")
    graft.state.SlotStore.readParts(spark, parts.map(_._3))
  }

  /** Fold every live part under `from` into ONE merged snapshot at
    * `to` (slot 0), sorted by hash for zone-map prunes under future
    * semi-joins. `to` must be a fresh dir. */
  def compactSegmentKeeperIndex(spark: org.apache.spark.sql.SparkSession,
      from: String, to: String): Unit = {
    require(segKeeperParts(spark, to).isEmpty,
      s"compactSegmentKeeperIndex target $to already holds committed " +
        "parts — compact into a fresh dir")
    val live = loadSegmentKeeperIndex(spark, from)
    // one merge definition: the fold of the live parts with nothing —
    // min per hash across however many parts repeat it (a no-op per
    // hash when the parts are the streaming host's gh-disjoint deltas)
    saveSegmentKeeperDelta(spark, to,
      foldSegmentKeepers(live, live.limit(0)).sortWithinPartitions("gh"),
      slot = Some(0L), snapshot = true)
  }

  /** Delete every committed part a snapshot has superseded — pure
    * housekeeping (load already ignores them). */
  def sweepSegmentKeeperIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Int =
    graft.state.SlotStore.sweepSuperseded(spark, path, "seg-delta", "seg-snap")

  /** Gram-document-frequency table for INCREMENTAL shared-span removal
    * — the persisted state [[removeSharedSpansIncremental]] reads: one
    * `(gh, df)` row per distinct `n`-token window content, `df` = how
    * many distinct documents contain it (the same FNV-1a-64 window
    * hashing as [[removeSharedSpans]], so incremental and batch agree
    * hash-for-hash). Distinct-per-document grams are computed ROW-LOCAL
    * (`array_distinct` before the explode), so the one exchange carries
    * 8-byte hashes, never text or positions.
    */
  def spanGramDfs(docs: DataFrame, n: Int = 8, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    import graft.functions.Sketch
    docs.select(col(idCol).as("doc_id"),
        explode(array_distinct(
          Sketch.gram_hash_positions_text(
            coalesce(col(textCol), lit("")), n))).as("gh"))
      .groupBy("gh").agg(count(lit(1)).as("df"))
  }

  /** Incremental [[removeSharedSpans]] — the Lee-et-al exact-substring
    * dedup at DELIVERY time: cut from each delivery document every
    * token covered by an `n`-token window whose document frequency
    * across `stored ∪ delivery` is ≥ `minDf`, where the stored corpus
    * is represented ONLY by its [[spanGramDfs]] table. Because the
    * stored and delivery document sets are disjoint, the union's
    * per-gram df is exactly `df_stored + df_delivery` — so the result
    * is IDENTICAL (not approximately) to running the batch operator
    * over the full union and keeping the delivery rows, without ever
    * rescanning stored text. DedupSpec pins that equivalence; the q117
    * oracle checks it end-to-end against DuckDB.
    *
    * Scale shape (the q105b delivery discipline): the stored-df table
    * is corpus-gram-scale and is NEVER broadcast — it is scanned once,
    * left-semi-pruned by the (delivery-bounded, broadcast) delivery
    * gram set. Everything after the prune is delivery-sized; text
    * appears only in the final per-document reassembly. Output columns
    * are the batch operator's (`n_tokens`, `n_removed`, `cleaned_text`).
    *
    * Declared divergence from a full recompute (shared with q105b):
    * STORED documents that newly cross the df threshold because of
    * delivery grams are not rewritten — stored text is immutable here;
    * a compaction re-runs the batch operator when cut-backs matter.
    */
  def removeSharedSpansIncremental(delivery: DataFrame, storedDfs: DataFrame,
      n: Int = 8, minDf: Int = 2, textCol: String = "text",
      idCol: String = "doc_id",
      deliveryDfs: Option[DataFrame] = None): DataFrame = {
    require(minDf >= 2,
      s"minDf must be >= 2 (got $minDf): df >= 1 would remove every gram-covered token")
    import graft.functions.Sketch
    // delivery-bounded: persisting the raw text is cheap and feeds the
    // position explode, the df pass and the reassembly
    val norm = delivery.select(col(idCol).as("doc_id"),
        coalesce(col(textCol), lit("")).as("text"))
      .transform(CacheRegistry.persist(_))
    val pos = norm.select(col("doc_id"),
      posexplode(Sketch.gram_hash_positions_text(col("text"), n))
        .as(Seq("pos", "gh")))
    // delivery-side per-gram df (distinct docs row-local, 8-byte rows);
    // persisted: it feeds the stored-side prune AND the threshold join.
    // A host that already materialized the delivery's [[spanGramDfs]]
    // (the streaming span-dedup saves it as the state delta) passes it
    // in instead of paying the tokenize+hash+aggregate pass twice.
    val ddf = deliveryDfs match {
      case Some(dfs) => dfs.select(col("gh"), col("df").as("ddf"))
      case None => norm.select(col("doc_id"),
          explode(array_distinct(
            Sketch.gram_hash_positions_text(col("text"), n))).as("gh"))
        .groupBy("gh").agg(count(lit(1)).as("ddf"))
        .transform(CacheRegistry.persist(_))
    }
    // stored dfs pruned to the delivery's grams BEFORE anything else:
    // the broadcast build is the delivery gram set (delivery-bounded);
    // the corpus-scale df table streams through as the probe side. The
    // df-sum aggregate runs AFTER the prune — `storedDfs` may be the
    // raw multi-delta union ([[loadSpanDfIndex]]), and aggregating it
    // first would shuffle the ENTIRE gram table per delivery where the
    // pruned aggregate is delivery-sized (summing an already-aggregated
    // single-snapshot table is a no-op semantically)
    val sdf = storedDfs.join(broadcast(ddf.select("gh")), Seq("gh"),
        "left_semi")
      .groupBy("gh").agg(sum("df").as("df"))
    val shared = ddf.join(sdf, Seq("gh"), "left")
      .filter(col("ddf") + coalesce(col("df"), lit(0L)) >= minDf)
      .select("gh")
    val starts = pos.join(shared, Seq("gh"), "left_semi")
      .groupBy("doc_id")
      .agg(sort_array(collect_set(col("pos"))).as("starts"))
    reassembleCutFused(norm, starts, n)
  }

  /** Fold a delivery's gram dfs into the stored table — the state
    * update after [[removeSharedSpansIncremental]] admits a delivery.
    * Disjoint doc sets sum exactly, so folding then serving equals
    * re-summarizing the union corpus. */
  def foldSpanGramDfs(stored: DataFrame, deliveryDfs: DataFrame): DataFrame =
    stored.unionByName(deliveryDfs)
      .groupBy("gh").agg(sum("df").as("df"))

  /** Persisted form of the [[spanGramDfs]] state: each delivery lands
    * as a self-committing `dfs-delta-<slot>` parquet dir (O(delta)
    * write — stored deltas never rewritten, the funnel-state / IVF
    * codes-delta discipline; an explicit slot makes a replayed batch's
    * overwrite idempotent). Compactions land as `dfs-snap-<slot>` —
    * the SNAPSHOT kind is what makes the lifecycle crash-safe: a
    * snapshot at slot k supersedes every part with slot ≤ k BY
    * CONSTRUCTION ([[loadSpanDfIndex]] ignores them), so deleting the
    * superseded dirs is pure housekeeping and a crash between the
    * snapshot's commit marker and the deletes cannot double-count a
    * gram on replay. Torn writes (no _SUCCESS) are ignored by load. */
  def saveSpanDfDelta(spark: org.apache.spark.sql.SparkSession,
      path: String, dfs: DataFrame, slot: Option[Long] = None,
      snapshot: Boolean = false): Unit = {
    val parts = spanDfParts(spark, path)
    val next = slot.getOrElse(parts.map(_._2).foldLeft(-1L)(math.max) + 1)
    // a low-slot SNAPSHOT is just as lost as a low-slot delta: load
    // serves only the LATEST snapshot, and the next sweep deletes the
    // low one — the shared guard rejects both
    graft.state.SlotStore.requireNotSuperseded(parts, "dfs-snap", next,
      "saveSpanDfDelta")
    val kind = if (snapshot) "snap" else "delta"
    dfs.write.mode("overwrite").parquet(s"$path/dfs-$kind-$next")
  }

  /** Delete every committed part a snapshot has superseded (slot <
    * the latest snapshot's) plus torn dirs below it — housekeeping
    * only: load already ignores them ([[graft.state.SlotStore]]'s
    * shared sweep). Returns the number of dirs removed. Call after a
    * compaction snapshot commits; also sweeps orphans a crashed
    * earlier compaction left behind. */
  def sweepSpanDfIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Int =
    graft.state.SlotStore.sweepSuperseded(spark, path, "dfs-delta", "dfs-snap")

  /** Committed (prefix, slot, dir) parts under a span-df index path —
    * one listing via the shared slotted-state core. */
  private def spanDfParts(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, Long, String)] =
    graft.state.SlotStore.committedParts(spark, path,
      Seq("dfs-delta", "dfs-snap"))

  /** Committed slot numbers (deltas AND snapshots) under a persisted
    * span-df index path — the replay-skip set for streaming hosts. */
  def committedSpanDfSlots(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[Long] =
    spanDfParts(spark, path).map(_._2)

  /** LIVE slot numbers: the latest snapshot (if any) plus every delta
    * after it — what [[loadSpanDfIndex]] actually reads. */
  def liveSpanDfSlots(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(Long, Boolean)] =
    graft.state.SlotStore.liveParts(spanDfParts(spark, path),
      "dfs-delta", "dfs-snap")
      .map(p => (p._2, p._1 == "dfs-snap"))

  /** Load the span-df index as the RAW union of live parts (latest
    * snapshot + later deltas) — a gram may appear once per part; the
    * per-gram sum is the consumer's job AFTER its own pruning
    * ([[removeSharedSpansIncremental]] aggregates post-semi-join, so a
    * delivery never pays a corpus-gram-scale shuffle just to read the
    * state). Parts a snapshot superseded are ignored even if their
    * dirs still exist (the crash-safety contract above). */
  def loadSpanDfIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val parts = graft.state.SlotStore.liveParts(spanDfParts(spark, path),
      "dfs-delta", "dfs-snap")
    require(parts.nonEmpty, s"no committed span-df parts under $path")
    // ONE flat multi-path scan, not a per-part union chain — the plan
    // stays constant-size however many deltas a stream accretes
    graft.state.SlotStore.readParts(spark, parts.map(_._3))
  }

  /** Fold every live part under `from` into ONE aggregated delta at
    * `to` (slot 0), sorted by gram hash so parquet zone maps can skip
    * row groups under future semi-join prunes. `to` must be a fresh
    * index dir — compacting INTO a dir with committed parts would race
    * its slot numbering. */
  def compactSpanDfIndex(spark: org.apache.spark.sql.SparkSession,
      from: String, to: String): Unit = {
    require(spanDfParts(spark, to).isEmpty,
      s"compactSpanDfIndex target $to already holds committed parts — " +
        "compact into a fresh dir")
    saveSpanDfDelta(spark, to,
      loadSpanDfIndex(spark, from).groupBy("gh").agg(sum("df").as("df"))
        .sortWithinPartitions("gh"),
      slot = Some(0L))
  }

  // --------------------------------------------------- BM25 ranked search

  /** BM25 ranked retrieval for a fixed term set — the keyword-search
    * face of the corpus (dedup-adjacent: the same tf/df machinery as
    * [[keywordScores]], scored per query instead of per document).
    *
    * Uses the rational-idf BM25 variant `idf = (N - df + ½)/(df + ½)`
    * (no logarithm): like q59's scoring this keeps the float math to
    * divisions and multiplications whose IEEE results are identical
    * across engines — `ln` is the one piece libm and the JVM may round
    * differently. Rank order equals log-idf BM25's whenever all query
    * terms have df < N/2 (idf monotone in df either way).
    *
    * Scale shape: document length and every per-term tf come out of
    * ONE row-local pass (the native `token_tf` kernel builds the
    * distinct-token tf map; per-term extraction scans that small map,
    * not the token array, once per term); the narrow result
    * (doc_id, dl, tf…) ≈ 8·(terms+2) bytes/doc is persisted so
    * the corpus-stats aggregate and the top-N selection don't re-scan
    * and re-tokenize the corpus. Corpus-level (N, Σdl, df…) statistics
    * are ONE tiny aggregate row broadcast back; top-N is
    * TakeOrderedAndProject (never a global sort). Σdl is summed
    * exactly over integers so `avgdl` is one deterministic division,
    * not an order-sensitive float mean.
    */
  def bm25Rank(docs: DataFrame, terms: Seq[String], topN: Int = 20,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty, "bm25Rank needs at least one query term")
    // k1 = 1.2, b = 0.75 — written as the exact double literals the
    // oracle SQL uses (1.2e0 etc.) so both engines run bit-identical
    // IEEE expressions; do NOT fold (k1+1) at a different precision
    val toked = docs.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("toks"))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      coalesce(
        try_element_at(filter(col("tfs"), e => e.getField("tok") === t), lit(1))
          .getField("tf"),
        lit(0L)).as(s"tf$i")
    }
    // persist, not localCheckpoint: the stats aggregate below is the
    // action that materializes this narrow cache (one fused job), and
    // the top-N pass re-reads ~8·(terms+2) bytes/doc from it
    val d = toked
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        graft.functions.Sketch.token_tf(col("toks")).as("tfs"))
      .select(col("doc_id") +: col("dl") +: tfCols: _*)
      .transform(CacheRegistry.persist(_))
    val aggCols = sum(col("dl")).as("sdl") +:
      count(lit(1)).as("n") +:
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stats = d.agg(aggCols.head, aggCols.tail: _*)
    val avgdl = col("sdl").cast("double") / col("n")
    val score = terms.indices.map { i =>
      ((col("n") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5))) *
        (col(s"tf$i") * lit(2.2)) /
        (col(s"tf$i") + lit(1.2) * (lit(0.25) + lit(0.75) *
          (col("dl").cast("double") / avgdl)))
    }.reduce(_ + _)
    val top = d.crossJoin(broadcast(stats))
      .select(col("doc_id"), col("dl"), score.as("raw_score"))
      .orderBy(col("raw_score").desc, col("doc_id"))
      .limit(topN)
    // rank over the already-taken topN rows only (single partition of
    // `topN` rows — not a global window)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("raw_score").desc, col("doc_id"))
    top.select(row_number().over(w).cast("bigint").as("rn"),
      col("doc_id"), col("dl"), round(col("raw_score"), 4).as("score"))
  }

  // ------------------------------------------- token-budget shard packing

  /** Contiguous token-budget sharding — assign each document (in
    * `doc_id` order) to the training shard its running token count
    * lands in: shard = ⌊exclusive-prefix-sum(n_tokens) / budget⌋. The
    * deterministic "cut the corpus into ~budget-token files" step in
    * front of tokenizer/sequence-packing jobs.
    *
    * Scale shape: a distributed two-pass prefix sum, NOT a global
    * single-partition window. Pass 1 range-partitions the narrow
    * (doc_id, n_tokens) projection by doc_id and computes one partial
    * sum per partition (collects exactly `numPartitions` longs); pass 2
    * re-walks each partition with its broadcast base offset. The
    * narrow projection is localCheckpointed BEFORE the range exchange
    * (the range partitioner's sampling job would otherwise re-scan and
    * re-tokenize the corpus a second time), and the ranged result once
    * more so both passes see identical partitioning — nothing wider
    * than 16 bytes/doc is ever materialized or moved.
    */
  def tokenBudgetShards(docs: DataFrame, budget: Long = 4000L,
      textCol: String = "text", idCol: String = "doc_id",
      numPartitions: Int = 32): DataFrame =
    tokenBudgetShardsFromCounts(
      docs.select(col(idCol).cast("long").as("doc_id"),
        tokenCountWhitespace(col(textCol)).cast("long").as("n_tokens")),
      budget, numPartitions)

  /** [[tokenBudgetShards]] over a PRE-COMPUTED (doc_id, n_tokens)
    * frame — the id-space export path counts subword ids, not
    * whitespace tokens, but shards by the same prefix-sum machinery. */
  def tokenBudgetShardsFromCounts(counts: DataFrame, budget: Long = 4000L,
      numPartitions: Int = 32): DataFrame = {
    val sess = counts.sparkSession
    import sess.implicits._
    val ranged = counts
      .select(col("doc_id").cast("long").as("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"))
      .transform(CacheRegistry.localCheckpoint(_))
      .repartitionByRange(numPartitions, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .as[(Long, Long)]
      .transform(CacheRegistry.localCheckpoint(_))
    val partSums: Array[(Int, Long)] = ranged.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var acc = 0L
      while (it.hasNext) acc += it.next()._2
      Iterator.single((pid, acc))
    }.collect()
    val offsets: Map[Int, Long] = {
      val sorted = partSums.sortBy(_._1)
      sorted.map(_._1).zip(sorted.scanLeft(0L)(_ + _._2)).toMap
    }
    val bOffsets = sess.sparkContext.broadcast(offsets)
    ranged.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var run = bOffsets.value.getOrElse(pid, 0L)
      it.map { case (id, nt) =>
        val shard = run / budget
        run += nt
        (id, nt, shard)
      }
    }.toDF("doc_id", "n_tokens", "shard")
  }

  // ---------------------------------------------------- mixture sampling

  /** Source-mixture sampling — resample the corpus so each source
    * contributes tokens in proportion to a target weight (the data-
    * mixing step that turns "whatever we crawled" into the training
    * mix). For each source `s` with available tokens `T_s` and
    * normalized weight `w_s`, the acceptance rate is
    * `min(1, budget·w_s / T_s)`; a document is kept iff the first 8 hex
    * chars of `md5(doc_id)` fall below the rate's 32-bit threshold —
    * the same content-independent reproducible-hash rule as
    * [[hashSample]], so the chosen subset never re-rolls across runs,
    * engines, or cluster layouts.
    *
    * Scale shape: per-source token totals are ONE aggregate whose
    * output is #sources rows; weights and rates live on that tiny
    * frame, which broadcast-joins back to the corpus (AQE picks
    * broadcast at any corpus size — the build side scales with source
    * count, not data). The keep test is row-local. Nothing wider than
    * the (source, rate) pair ever moves, and the corpus text is scanned
    * exactly once: the narrow (doc_id, source, n_tokens) projection is
    * persisted and feeds both the per-source aggregate and the
    * sampled output (the aggregate materializes the cache — no
    * separate checkpoint job).
    */
  def mixtureSample(docs: DataFrame, weights: Map[String, Double],
      defaultWeight: Double = 1.0, budgetFrac: Double = 0.4,
      textCol: String = "text", idCol: String = "doc_id",
      sourceCol: String = "source"): DataFrame = {
    val sess = docs.sparkSession
    val narrow = narrowTokenCounts(docs, textCol, idCol, sourceCol)
    val perSource = narrow
      .groupBy("source")
      .agg(sum(col("n_tokens")).as("toks"))
    val wdf = sess.createDataFrame(weights.toSeq).toDF("source", "w")
    val weighted = perSource.join(broadcast(wdf), Seq("source"), "left")
      .select(col("source"), col("toks"),
        coalesce(col("w"), lit(defaultWeight)).as("w"))
    sampleByWeights(narrow, weighted, budgetFrac)
  }

  /** Temperature-based mixture resampling — the multilingual/
    * multi-domain reweighting rule (weight per source = toks^alpha,
    * alpha < 1 flattens the source distribution so small sources are
    * upsampled relative to their share): the [[mixtureSample]]
    * machinery with weights DERIVED from the corpus instead of given.
    * `alpha = 0.5` is computed via `sqrt` (correctly-rounded IEEE op,
    * so the declared query hashes across engines; `pow` is only
    * faithfully rounded).
    */
  def temperatureSample(docs: DataFrame, alpha: Double = 0.5,
      budgetFrac: Double = 0.4, textCol: String = "text",
      idCol: String = "doc_id", sourceCol: String = "source"): DataFrame = {
    val narrow = narrowTokenCounts(docs, textCol, idCol, sourceCol)
    val w = if (alpha == 0.5) sqrt(col("toks").cast("double"))
      else pow(col("toks").cast("double"), lit(alpha))
    val weighted = narrow
      .groupBy("source")
      .agg(sum(col("n_tokens")).as("toks"))
      .select(col("source"), col("toks"), w.as("w"))
    sampleByWeights(narrow, weighted, budgetFrac)
  }

  private def narrowTokenCounts(docs: DataFrame, textCol: String,
      idCol: String, sourceCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        col(sourceCol).as("source"),
        tokenCountWhitespace(col(textCol)).cast("long").as("n_tokens"))
      .transform(CacheRegistry.persist(_))

  /** Shared rate computation + reproducible keep rule over the
    * persisted narrow projection and a tiny (source, toks, w) frame.
    * Normalizes over the sources actually present; the weighted frame
    * is #sources rows so the cross join of its own totals stays
    * driver-free, and rates broadcast back to the corpus.
    */
  private def sampleByWeights(narrow: DataFrame, weighted: DataFrame,
      budgetFrac: Double): DataFrame = {
    val totals = weighted.agg(sum("w").as("sw"), sum("toks").as("tt"))
    val rates = weighted.crossJoin(broadcast(totals))
      .select(col("source"),
        least(lit(1.0),
          (lit(budgetFrac) * col("tt") * (col("w") / col("sw"))) / col("toks"))
          .as("rate"))
      .select(col("source"), col("rate"),
        lower(format_string("%08x",
          floor(col("rate") * lit(4294967296.0)).cast("long"))).as("thresh"))
    narrow.join(broadcast(rates), Seq("source"))
      .filter(col("rate") >= 1.0 ||
        substring(md5(col("doc_id").cast("string")), 1, 8) < col("thresh"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        round(col("rate"), 4).as("rate"))
  }

  /** Bigram-LM surprisal (q98) — [[unigramSurprisal]]'s higher-order
    * sibling, one step toward the 5-gram KenLM filter of the CCNet
    * recipe: add-1-smoothed conditional model
    * P(w2|w1) = (c12 + 1) / (c1 + V), per-document mean surprisal over
    * its bigram stream. Same determinism discipline as q79: each
    * bigram's surprisal is rounded to integer micronats once, so the
    * per-document accumulation is order-free and the declared query
    * hashes across engines.
    *
    * Scale shape: per-document (gram, tf) pairs are row-local — ONE
    * `lm_gram_tf_text` kernel pass emits the distinct unigram and
    * bigram streams together, persisted for its three consumers; the
    * model is two hash-keyed aggregates and one V-row broadcast; every
    * exchange carries an 8-byte gram hash, never gram text. Documents
    * shorter than 2 tokens fall back to the whole-text gram (the
    * [[Dedup.shingles]] convention, declared in the oracle).
    */
  def bigramSurprisal(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", broadcastModel: Boolean = true): DataFrame = {
    // MODEL SIDE in one kernel pass (round 15, VERDICT r14 #7): the
    // `lm_gram_tf_text` kernel emits the distinct unigram AND bigram
    // tf streams together, so the bigram counts and the unigram counts
    // — two separate passes + shuffles before (bigram kernel +
    // tokenPairs) — fold into ONE pass and ONE hash-keyed exchange,
    // aggregated to a vocab-sized counts frame that persists cheaply
    // for its three readers. No token or gram string ever leaves the
    // kernel; the model join keys on 8-byte FNV hashes end to end
    // (the q51/q74 discipline). Collision budget: ~vocab²/2^65 of
    // grams mis-merged (~1e-7 at 1M grams), below any filter threshold
    // this score feeds; a unigram collision additionally decrements V
    // by one (same class). Caching the DOC-level gram frame instead
    // was measured slower (5.1 s vs this shape at sf1) — the exploded
    // cache round-trip costs more than a second kernel pass, the same
    // finding as round 13's bg-persist experiment.
    val counts = CacheRegistry.persist(
      docs.select(explode(graft.functions.Sketch.lm_gram_tf_text(
          col(textCol))).as("p"))
        .groupBy(col("p.n").as("n"), col("p.gh").as("gh"),
          col("p.w1h").as("w1h"))
        .agg(sum(col("p.tf")).as("c")))
    // SCORING SIDE: per-doc bigram tf, bigram-only kernel, fused into
    // the scoring join's stage (not persisted — see above)
    val bg = docs.select(col(idCol).as("doc_id"),
        explode(graft.functions.Sketch.bigram_hash_tf_text(
          col(textCol))).as("p"))
      .select(col("doc_id"), col("p.gh").as("gh"),
        col("p.tf").cast("long").as("tf"))
    val c12 = counts.filter(col("n") === 2)
      .select(col("gh"), col("w1h"), col("c").as("c12"))
    val uni = counts.filter(col("n") === 1)
      .select(col("gh").as("w1h"), col("c").as("c1"))
    val vocabSize = uni.agg(count(lit(1)).as("v"))
    // the finished (gh, micronats) model is SHARED (the tokenPairs hub
    // discipline, one level up): a bigram LM is a train-once/score-many
    // artifact — a warm session serves every scoring batch from the
    // same 16-byte-per-gram frame, and plan-keyed dedupe applies (no
    // lambdas in the plan). The cold path (one lm_gram_tf_text pass +
    // one hash-keyed exchange + the vocab-sized model join) replaces
    // the previous two separate count passes and string-keyed join.
    val model = CacheRegistry.persist(
      c12.join(uni, Seq("w1h"))
        .crossJoin(broadcast(vocabSize))
        .select(col("gh"),
          round(log((col("c1") + col("v")).cast("double") /
            (col("c12") + lit(1L))) * lit(1e6)).cast("long").as("micronats")),
      shared = true)
    // q79's broadcastVocab rule, one n up: the (gh, micronats) model is
    // 16 bytes per distinct bigram — ship it to the cached pairs so the
    // scoring side never shuffles; set false when the bigram vocabulary
    // outgrows a broadcast and the same plan runs as a shuffle join
    val modelSide = if (broadcastModel) broadcast(model) else model
    val perDoc = bg.join(modelSide, Seq("gh"))
      .groupBy("doc_id")
      .agg(sum(col("tf") * col("micronats")).as("sn"), sum("tf").as("dl"))
    docs.select(col(idCol).as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("dl"), lit(0L)).cast("bigint").as("dl"),
        round(coalesce(col("sn").cast("double") /
          (col("dl") * lit(1e6)), lit(0.0)), 4).as("surprisal"))
  }

  /** 5-gram stupid-backoff surprisal — the production CCNet/KenLM
    * filter shape: an n-gram LM trained on a REFERENCE slice (`refPred`
    * — Wikipedia in CCNet; `source='src0'` in the declared query)
    * scores every document in the corpus by mean per-token surprisal.
    * Stupid backoff (Brants et al. 2007): at token position i with
    * context length k = min(maxN, i+1), take the LONGEST n ≤ k whose
    * n-gram ending at i occurs in the reference, and score
    * `S = alpha^(k−n) · c_n(gram)/c_{n−1}(prefix)` (unigram base
    * `c_1(w)/N`); a token absent from the reference vocabulary scores
    * `alpha^(k−1) / N`. Training on a reference slice (not the scored
    * corpus itself) is what makes backoff live: self-trained counts
    * would contain every scored n-gram by construction.
    *
    * Cross-engine determinism: the per-step backoff penalty is the
    * integer constant `round(ln(1/0.4)·1e6) = 916291` micronats and the
    * count-ratio term is rounded ONCE to integer micronats, so the
    * per-document accumulation is an exact integer sum (the q79/q98
    * discipline); only the final division is float. `alpha` is fixed at
    * 0.4 (the published constant) to keep the penalty integral.
    *
    * Scale shape: the model is built from the reference slice only
    * (counts for n = 1..maxN joined to their own n−1 prefixes —
    * reference-sized work); the corpus explodes each token position
    * into its ≤ maxN candidate suffix grams IN ONE pass over the token
    * array (no per-position array duplication) and shuffles only
    * (n, gram-hash-sized) rows through the scoring join, then two
    * narrow integer aggregations (per-position best-n, per-document
    * sum). The corpus text itself is never shuffled.
    */
  def stupidBackoffSurprisal(docs: DataFrame, refPred: Column,
      maxN: Int = 5, textCol: String = "text",
      idCol: String = "doc_id", broadcastModel: Boolean = true): DataFrame = {
    val Pen = 916291L // round(ln(1/0.4)*1e6): one backoff step
    val toked = docs.select(col(idCol).as("doc_id"), refPred.as("is_ref"),
      tokens(col(textCol)).as("toks"))
    // all (pos, n, gram[, prefix]) candidates in one row-local kernel
    // pass (optimization round r16: the nested transform/flatten HOF
    // chain paid a sequence/slice/array_join allocation per (pos, n)
    // and dominated the line — [[graft.functions.Sketch
    // .backoffCandidates]] builds the same structs with cumulative
    // prepends, fuzz-pinned ≡ the HOF form). The prefix string is
    // generated ONLY for the model side (the scoring explode is 5 rows
    // per corpus token — carrying a second string per row through the
    // join would double its width for nothing)
    def candCol(withPrefix: Boolean) =
      explode(graft.functions.Sketch.backoff_candidates(
        col("toks"), maxN, withPrefix)).as("g")
    def cands(frame: DataFrame, withPrefix: Boolean = false) = {
      val cols = Seq(col("g.pos").as("pos"), col("g.k").as("k"),
        col("g.n").as("n"), col("g.gram").as("gram")) ++
        (if (withPrefix) Seq(col("g.prefix").as("prefix")) else Nil)
      frame.filter(size(col("toks")) > 0)
        .select(col("doc_id"), candCol(withPrefix))
        .select(col("doc_id") +: cols: _*)
    }
    // reference model: c_n(gram) with c_{n-1}(prefix); n=1 backs onto N
    val counts = cands(toked.filter(col("is_ref")), withPrefix = true)
      .groupBy("n", "gram", "prefix").agg(count(lit(1)).as("cn"))
      .transform(CacheRegistry.persist(_))
    val totals = counts.filter(col("n") === 1)
      .agg(greatest(sum("cn"), lit(1L)).as("nt"))
    val model = counts.as("c")
      .join(counts.as("p"),
        col("c.n") === col("p.n") + 1 && col("c.prefix") === col("p.gram"),
        "left")
      .select(col("c.n").as("n"), col("c.gram").as("gram"),
        col("c.cn").as("cn"), col("p.cn").as("cp"))
    // per-position best (longest matched n); positions with no match
    // at any n are out-of-vocabulary
    val corpus = cands(toked)
    // reference LMs are corpus-fraction-sized (CCNet: Wikipedia): ship
    // the model to the candidates so the 5-per-token gram explode never
    // shuffles — the unigramSurprisal broadcastVocab rule; set false
    // for a reference corpus too large to broadcast and the same plan
    // runs as a shuffle join
    val modelSide = if (broadcastModel) broadcast(model) else model
    // r17 (guide §2.4): the model join is LEFT and the per-position
    // aggregate derives everything the scorer needs — k rides every
    // candidate (constant per position) and the longest matched order
    // is the struct-max over matched rows (structs compare
    // lexicographically, so max picks the highest matched n with its
    // cn/cp; unmatched rows are nulled out and a position with no
    // match at any n surfaces as a null struct = out-of-vocabulary).
    // This removes the separate (doc_id, pos, k) position frame and
    // its corpus-scale join back: one exchange and one pass over the
    // token arrays fewer — every position has an n=1 candidate, so
    // aggregate coverage equals the position enumeration exactly.
    val best = corpus.join(modelSide, Seq("n", "gram"), "left")
      .groupBy("doc_id", "pos")
      .agg(max(col("k")).as("k"),
        max(when(col("cn").isNotNull,
          struct(col("n"), col("cn"), col("cp")))).as("b"))
    val scored = best
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        when(col("b").isNull,
          round(log(col("nt").cast("double")) * lit(1e6)).cast("long") +
            (col("k") - 1) * Pen)
          .otherwise((col("k") - col("b.n")) * Pen +
            round(log(coalesce(col("b.cp"), col("nt")).cast("double") /
              col("b.cn")) * lit(1e6)).cast("long"))
          .as("mn"))
    val perDoc = scored.groupBy("doc_id")
      .agg(sum("mn").as("sn"), count(lit(1)).as("dl"))
    docs.select(col(idCol).as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("dl"), lit(0L)).cast("bigint").as("dl"),
        round(coalesce(col("sn").cast("double") /
          (col("dl") * lit(1e6)), lit(0.0)), 4).as("surprisal"))
  }

  // ------------------------------------------- shared tokenized projection

  /** The shared (doc_id, tok, tf) projection every corpus-statistics
    * operator consumes: one distinct (token, tf) pair per document from
    * the row-local `token_tf` kernel. `persist()` (MEMORY_AND_DISK, the
    * same local-disk size class the previous `localCheckpoint` wrote)
    * instead of an eager checkpoint: Spark's cache manager keys on the
    * canonicalized logical plan, so (a) the corpus-stats aggregate of a
    * consumer FUSES into whichever action materializes the cache —
    * no separate checkpoint job per query — and (b) [[invertedIndex]]
    * and [[unigramSurprisal]] over the same docs frame share ONE
    * tokenize pass per warm session instead of each paying their own.
    */
  def tokenPairs(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // carry `source` through the cache when the frame has it: the
    // per-source consumers (heavy hitters) then share the SAME cached
    // tokenize pass as the per-token ones (inverted index, surprisal)
    // — columnar cache reads prune the extra column for consumers that
    // never touch it, so they pay nothing for the wider cache row
    val carry = docs.columns.filter(_ == "source").toSeq.map(col)
    docs.select(col(idCol).as("doc_id") +: carry :+
        explode(graft.functions.Sketch.token_tf_text(col(textCol))).as("p"): _*)
      .select(col("doc_id") +: carry :+ col("p.tok").as("tok") :+
        col("p.tf").cast("long").as("tf"): _*)
      .transform(CacheRegistry.persist(_, shared = true))
  }

  /** Per-source heavy hitters over the SHARED [[tokenPairs]] cache —
    * the q91 form of [[graft.operators.Sampling.heavyHitters]] (which
    * stays the generic any-frame variant): in a warm session the
    * tokenize pass is already cached by the other corpus-statistics
    * queries, so this costs two small aggregations.
    */
  def sourceHeavyHitters(docs: DataFrame, k: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val counts = tokenPairs(docs, textCol, idCol)
      .groupBy(col("source"), col("tok"))
      .agg(sum("tf").as("cnt"))
    counts.groupBy(col("source"))
      .agg(graft.functions.BoundedAgg.collect_min_k_by_str(
        -col("cnt").cast("double"), col("tok"), k).as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("source"), (col("pos") + 1).cast("long").as("rn"),
        col("p.value").as("tok"), (-col("p.score")).cast("long").as("cnt"))
  }

  // ----------------------------------------------------- inverted index

  /** Inverted-index postings export: token → full document frequency +
    * the first `cap` doc ids in id order — the retrieval-index-building
    * pass over a curated corpus, emitted in the truncated-postings form
    * real systems use for high-df terms (a stopword's full posting list
    * is O(corpus); capping bounds every emitted row AND every
    * aggregation buffer). One shuffle of (tok, doc_id) pairs — distinct
    * per doc via the row-local `token_tf` kernel, so a token repeated
    * 100× in a doc contributes ONE pair; the cap is the native
    * `collect_min_k` bounded aggregate, so partial AND final buffers
    * never exceed `cap` ids per token, truncation happens map-side
    * like any partial aggregate, and no shuffle+sort window pass is
    * needed (one hash-agg exchange total).
    */
  def invertedIndex(docs: DataFrame, minDf: Int = 3, cap: Int = 100,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    tokenPairs(docs, textCol, idCol)
      .select(col("doc_id"), col("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).cast("bigint").as("df"),
        graft.functions.BoundedAgg.collect_min_k(col("doc_id"), cap).as("ids"))
      .filter(col("df") >= minDf)
      .select(col("tok"), col("df"),
        array_join(col("ids").cast("array<string>"), ",").as("postings"))

  // ------------------------------------------------- unigram LM scoring

  /** Unigram-LM surprisal scoring — the perplexity-style quality filter
    * (CCNet-shape): train a unigram model on the corpus itself
    * (`P(tok) = count/total`), score each document by its mean token
    * surprisal `Σ tf·(−ln P) / dl` in nats. High-surprisal documents
    * are gibberish/rare-token soup; low-surprisal ones are repetitive
    * boilerplate — both tails are the standard cut candidates.
    *
    * Cross-engine determinism: each token's surprisal is rounded ONCE
    * to integer micro-nats (`round(ln(total/count)·1e6)`), so the
    * per-document accumulation is an exact integer sum — immune to
    * float addition order across partitions and engines — and only the
    * final division by `dl·1e6` is float. Scale shape: the model is one
    * token aggregate over the shared persisted (doc_id, tok, tf) distinct
    * pairs (tokenized once); `broadcastVocab` (default) ships the tiny
    * model to the pairs so scoring never shuffles them — set it false
    * for a vocabulary too large to broadcast and the same plan runs as
    * a shuffle join; empty documents score 0 via the left join. (A
    * driver-collected literal-map variant was measured 3× SLOWER than
    * this join: the scoring lambda leaves whole-stage codegen and the
    * map literal is probed by linear scan.)
    */
  def unigramSurprisal(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", broadcastVocab: Boolean = true): DataFrame = {
    // the shared persisted (doc_id, tok, tf) pairs feed BOTH the model
    // aggregate and the scoring join — tokenized once, and the model
    // aggregate fuses into the action that materializes the cache
    val tf = tokenPairs(docs, textCol, idCol)
    val vocab = tf.groupBy("tok").agg(sum("tf").as("cnt")).transform(CacheRegistry.persist(_))
    val total = vocab.agg(sum("cnt").as("total"))
    val terms = vocab.crossJoin(broadcast(total))
      .select(col("tok"),
        round(log(col("total").cast("double") / col("cnt")) * lit(1e6))
          .cast("long").as("micronats"))
    val termSide = if (broadcastVocab) broadcast(terms) else terms
    val perDoc = tf.join(termSide, Seq("tok"))
      .groupBy("doc_id")
      .agg(sum(col("tf") * col("micronats")).as("sn"), sum("tf").as("dl"))
    docs.select(col(idCol).as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("dl"), lit(0L)).cast("bigint").as("dl"),
        round(coalesce(col("sn").cast("double") /
          (col("dl") * lit(1e6)), lit(0.0)), 4).as("surprisal"))
  }

  // ------------------------------------------ trainable quality filter

  /** Hashed normalized bag-of-tokens feature vector (the fastText-style
    * embedding-free featurization): each whitespace token hashes into
    * one of `dim` buckets; counts normalize by document length so the
    * score scale is length-invariant. Deterministic (fixed 31-hash). */
  private[graft] def hashedFeatures(text: String, dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    if (text == null) return v
    var n = 0
    var start = 0
    var i = 0
    val len = text.length
    while (i <= len) {
      if (i == len || text.charAt(i) == ' ') {
        if (i > start) {
          var h = 7
          var j = start
          while (j < i) { h = h * 31 + text.charAt(j); j += 1 }
          v(math.floorMod(h, dim)) += 1f
          n += 1
        }
        start = i + 1
      }
      i += 1
    }
    if (n > 0) { var k = 0; while (k < dim) { v(k) /= n; k += 1 } }
    v
  }

  /** Trainable quality-classifier scoring — the FineWeb/CCNet-style
    * "train a cheap linear classifier on a seed rule, score the whole
    * corpus with it" filter: logistic regression over hashed
    * bag-of-tokens features, trained by deterministic SGD on the
    * bounded hash-ordered sample (fixed doc_id order, fixed epochs —
    * bit-identical runs), then one broadcast row-local scoring pass.
    *
    * Scale shape: the [[Similarity.trainIvfCentroids]] discipline —
    * training touches `sampleN` documents on the driver (a linear model
    * over `dim` hashed buckets is exactly what fits there; every
    * executor needs the finished weights anyway), scoring is one
    * `mapPartitions` projection, the corpus is never shuffled.
    *
    * @param targetPred boolean column marking the positive seed class
    * @return (doc_id, score, predicted) — score = σ(w·φ(text)) rounded
    *         to 4 decimals, predicted = score ≥ 0.5
    */
  def classifierScores(docs: DataFrame, targetPred: Column, dim: Int = 1024,
      epochs: Int = 20, lr: Double = 5.0, sampleN: Int = 4096,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    scoreWithClassifier(docs,
      trainClassifier(docs, targetPred, dim, epochs, lr, sampleN,
        textCol, idCol),
      textCol, idCol)

  /** The training half of [[classifierScores]]: deterministic SGD over
    * the bounded hash-ordered sample, returning the weight vector
    * (bias at the last index) — the model artifact a pipeline trains
    * once and applies to every corpus shard (and to a stream: scoring
    * is stateless, see [[scoreWithClassifier]]). */
  def trainClassifier(docs: DataFrame, targetPred: Column, dim: Int = 1024,
      epochs: Int = 20, lr: Double = 5.0, sampleN: Int = 4096,
      textCol: String = "text", idCol: String = "doc_id"): Array[Double] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sample = docs
      .select(col(idCol).cast("long").as("id"), col(textCol).as("t"),
        targetPred.cast("boolean").as("y"))
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(sampleN)
      .as[(Long, String, Boolean)].collect().sortBy(_._1)
    require(sample.nonEmpty, "classifierScores needs a non-empty corpus")
    // class-balanced gradient weighting: a seed rule typically marks a
    // small slice, and unweighted SGD then just learns the base rate
    // (the bias absorbs everything, scores compress around n⁺/n) — an
    // upweighted positive class learns the token signal instead
    val nPos = sample.count(_._3).toDouble
    val nNeg = sample.length - nPos
    val posW = if (nPos > 0 && nNeg > 0) nNeg / nPos else 1.0
    val d = dim
    val w = new Array[Double](d + 1) // bias at index d
    var ep = 0
    while (ep < epochs) {
      sample.foreach { case (_, text, y) =>
        val f = hashedFeatures(text, d)
        var z = w(d)
        var i = 0
        while (i < d) { z += w(i) * f(i); i += 1 }
        val p = 1.0 / (1.0 + math.exp(-z))
        val g = ((if (y) 1.0 else 0.0) - p) * (if (y) posW else 1.0)
        i = 0
        while (i < d) { w(i) += lr * g * f(i); i += 1 }
        w(d) += lr * g
      }
      ep += 1
    }
    w
  }

  /** The scoring half of [[classifierScores]]: one broadcast row-local
    * `mapPartitions` pass — stateless, so the SAME definition scores a
    * streaming corpus incrementally (StreamingSpec replay parity). */
  def scoreWithClassifier(docs: DataFrame, weights: Array[Double],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bw = spark.sparkContext.broadcast(weights)
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val wv = bw.value
        val dd = wv.length - 1
        it.map { case (id, text) =>
          val f = hashedFeatures(text, dd)
          var z = wv(dd)
          var i = 0
          while (i < dd) { z += wv(i) * f(i); i += 1 }
          val p = 1.0 / (1.0 + math.exp(-z))
          (id, math.round(p * 1e4) / 1e4, p >= 0.5)
        }
      }
      .toDF("doc_id", "score", "predicted")
  }

  // ------------------------------------------- importance resampling

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by the mean per-token log-ratio of a TARGET unigram LM
    * (trained on the slice matching `targetPred`) against the RAW-corpus
    * unigram LM, add-1 smoothed over the raw vocabulary, and keep the
    * `topN` highest-scoring documents — the "select web data that looks
    * like the target domain" pass. DSIR proper uses hashed n-gram
    * features; the unigram form keeps the estimator exactly
    * SQL-expressible so the whole selection is oracle-checkable.
    *
    * Determinism: both LMs are integer counts; each token's log-ratio
    * `ln((cnt_t+1)/(total_t+V)) − ln((cnt_r+1)/(total_r+V))` is rounded
    * ONCE to integer micro-nats (the [[unigramSurprisal]] rule), so
    * per-document accumulation is an exact integer sum and ranking
    * compares identical doubles on every engine.
    *
    * Scale shape: tokenize once into checkpointed (doc_id, matches,
    * tok, tf) pairs feeding both LM aggregates and the scoring join;
    * the model is vocabulary-sized and broadcast; the final top-N is
    * TakeOrderedAndProject (O(topN) per partition, no global sort).
    * The target slice rides the same pairs — the corpus is scanned and
    * tokenized exactly once.
    */
  def dsirSelect(docs: DataFrame, targetPred: Column, topN: Int = 200,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // rides the SHARED tokenPairs projection when the target predicate
    // can be evaluated over its carried columns (doc_id + source —
    // the by-source slice every DSIR run in this engine uses): in a
    // warm session the tokenize pass is already cached by the other
    // corpus-statistics queries, and both consumers read it for free.
    // Predicates over other columns fall back to a dedicated pass. The
    // raw and target counts come out of ONE conditional aggregation —
    // one exchange and no raw⋈target join.
    val sharedCols = Set("doc_id") ++
      (if (docs.columns.contains("source")) Set("source") else Set.empty)
    val predRefs = org.apache.spark.sql.graftbridge.ColumnBridge
      .expression(targetPred).references.map(_.name).toSet
    val tf =
      if ((predRefs -- sharedCols).isEmpty && idCol == "doc_id")
        tokenPairs(docs, textCol, idCol).withColumn("is_target", targetPred)
      else docs.select(col(idCol).as("doc_id"), targetPred.as("is_target"),
          explode(graft.functions.Sketch.token_tf_text(col(textCol))).as("p"))
        .select(col("doc_id"), col("is_target"), col("p.tok").as("tok"),
          col("p.tf").cast("long").as("tf"))
    val model0 = tf.groupBy("tok").agg(sum("tf").as("cnt_r"),
      coalesce(sum(when(col("is_target"), col("tf"))), lit(0L)).as("cnt_t"))
    val totals = model0.agg(count(lit(1)).as("v"), sum("cnt_r").as("total_r"),
      sum("cnt_t").as("total_t"))
    val model = model0.crossJoin(broadcast(totals))
      .select(col("tok"),
        round((log((col("cnt_t") + 1).cast("double") / (col("total_t") + col("v"))) -
               log((col("cnt_r") + 1).cast("double") / (col("total_r") + col("v"))))
          * lit(1e6)).cast("long").as("microw"))
    val perDoc = tf.join(broadcast(model), Seq("tok"))
      .groupBy("doc_id")
      .agg(sum(col("tf") * col("microw")).as("sw"), sum("tf").as("dl"))
    perDoc
      .select(col("doc_id"), col("dl").cast("bigint").as("dl"),
        (col("sw").cast("double") / (col("dl") * lit(1e6))).as("w0"))
      .orderBy(col("w0").desc, col("doc_id"))
      .limit(topN)
      .select(col("doc_id"), col("dl"), round(col("w0"), 4).as("logratio"))
  }
}
