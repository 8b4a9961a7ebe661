package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. Everything
  * is a row-local projection built from codegen'd built-ins (no UDF, no
  * shuffle) — at 100 TB these run at parquet-scan speed and feed the
  * dedup / filtering stages.
  */
object TextAnalysis {

  /** Non-empty whitespace tokens. */
  def tokens(c: Column): Column = filter(split(c, " "), t => t =!= "")

  // ------------------------------------------------------- token counting

  /** Whitespace token count. */
  def tokenCountWhitespace(c: Column): Column =
    size(tokens(c)).cast("bigint")

  /** BPE-ish subword count: letter runs, digit runs, and single
    * punctuation marks each count as one token (the usual pre-tokenizer
    * regex shape).
    */
  def tokenCountBpe(c: Column): Column =
    size(regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
      .cast("bigint")

  // ------------------------------------------------------ quality scoring

  val StopwordsEn: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "it", "on", "for")

  /** Length / punctuation-ratio / stopword-ratio quality features. */
  def qualityFeatures(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = tokens(col(textCol))
    docs.select(col(idCol),
      length(col(textCol)).cast("bigint").as("n_chars_c"),
      size(toks).cast("bigint").as("n_tokens"),
      round(length(regexp_replace(col(textCol), "[a-z0-9 ]", "")).cast("double") /
        length(col(textCol)), 4).as("punct_ratio"),
      round(size(filter(toks, t => t.isin(StopwordsEn: _*))).cast("double") /
        size(toks), 4).as("stopword_ratio"))
  }

  // -------------------------------------------------------- language ID

  /** Tiny per-language function-word lists — the n-gram-free heuristic:
    * count function-word hits per language, argmax with a fixed
    * tie-break order (en > de > fr > es).
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
    val toks = tokens(col(textCol))
    val hits = LangStopwords.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isin(words: _*))).cast("bigint")
    }
    val Seq(en, de, fr, es) = hits.map(_._2)
    docs.select(Seq(col(idCol)) ++
      hits.map { case (lang, c) => c.as(s"hits_$lang") } :+
      when(en >= de && en >= fr && en >= es, "en")
        .when(de >= fr && de >= es, "de")
        .when(fr >= es, "fr")
        .otherwise("es").as("pred_lang"): _*)
  }

  // ------------------------------------------------------ fingerprinting

  /** Set fingerprint: digest of the sorted distinct normalized token
    * set — equal iff the docs share exactly the same vocabulary
    * (order/multiplicity-insensitive near-dup key).
    */
  def vocabularyFingerprint(c: Column): Column = {
    val norm = regexp_replace(lower(c), "[^a-z0-9 ]", "")
    md5(concat_ws(" ", array_sort(array_distinct(tokens(norm)))).cast("binary"))
  }

  /** Winnowing-style fingerprint set (rolling-hash document sketch):
    * hash every `k`-token shingle, then keep the minimum hash of each
    * sliding window of `w` consecutive shingle hashes (MOSS scheme).
    * Row-local; the distinct sketch is typically ~|shingles|/w values.
    */
  def winnowingFingerprints(c: Column, k: Int = 3, w: Int = 4): Column =
    graft.functions.Sketch.winnow_min(
      transform(Dedup.shingles(tokens(c), k), x => xxhash64(x)), w)
}
