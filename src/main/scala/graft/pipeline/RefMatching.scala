package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Citation → reference content-id matching as joins (SURVEY.md F1/F2,
  * G8; reference `processors/ref_matching.py:19-105`).
  *
  * The reference builds per-document dictionaries and probes them per
  * citation; at corpus scale that is exactly an equi-join on a
  * normalized key, with the partial matcher becoming an inverted-index
  * token join + vote count + tie rejection. The chained matcher's
  * early-exit (`ChainedContentIdMatcher:96-105`) becomes a `coalesce`
  * over the staged join results — Catalyst evaluates all stages but
  * each is a hash join on compact keys.
  */
object RefMatching {

  /** get_normalized_key_text (ref_matching.py:19-27): lowercase,
    * strip everything but [a-z0-9]. */
  def normalizedKey(c: Column): Column =
    graft.functions.TextStats.normalized_key(c)

  /** Token-prefix key variant
    * (ref_matching.py:27-33 `get_token_prefix_normalized_key_text`):
    * per whitespace token, keep the whole token if it contains a digit,
    * else its first `prefixLength` characters; normalize each part and
    * concatenate. ("Fig 1" and "Figure 1" share the prefix-3 key
    * "fig1"; "F 1" does not.)
    */
  /** Duplicate-key winner for join-form matchers: natural id order —
    * (prefix, digit-run length, digits), so `b10` beats `b9` and
    * `fig_10` beats `fig_9` — the same ordering
    * [[GraphicMatching.assignDocument]] sorts by. The reference's
    * dict keeps the LAST-inserted candidate in document order; for
    * `iter_ids`-generated ids within one family that IS natural
    * order. Across mixed families (fig_/tab_ interleaved) document
    * order is not derivable from ids at all — this is the declared
    * deterministic stand-in; the per-document fold form keeps exact
    * dict order. */
  def lastIdNatural(c: Column): Column = {
    val digits = regexp_extract(c, "([0-9]+)$", 1)
    max_by(c, struct(regexp_replace(c, "[0-9]+$", ""),
      length(digits), digits))
  }

  def tokenPrefixKey(c: Column, prefixLength: Int = 1): Column =
    concat_ws("", transform(
      filter(split(c, "\\s+"), t => t =!= ""),
      t => regexp_replace(
        lower(when(t.rlike("[0-9]"), t).otherwise(substring(t, 1, prefixLength))),
        "[^a-z0-9]", "")))

  /** Match citations to candidate targets within each document.
    *
    * @param citations (doc_id, item_id, text)
    * @param candidates (doc_id, content_id, label_text)
    * @return (doc_id, item_id, content_id) — best match or no row
    *
    * Stage 1 (SimpleContentIdMatcher): exact normalized-key equi-join,
    * then token-prefix key equi-join for the leftovers.
    * Stage 2 (PartialContentIdMatcher): explode citation tokens against
    * an inverted index of candidate tokens, count votes per (citation,
    * candidate), keep the strict top-1 (ties rejected —
    * ref_matching.py:79-93).
    */
  /** SimpleContentIdMatcher as joins: exact normalized-key equi-join,
    * then token-prefix key equi-join for the leftovers. Returns
    * (doc_id, item_id, text, content_id?) with content_id null for
    * still-unmatched citations. */
  private def simpleStage(citations: DataFrame, candidates: DataFrame): DataFrame = {
    val cit = citations.select(col("doc_id"), col("item_id"),
      normalizedKey(col("text")).as("k1"),
      tokenPrefixKey(col("text")).as("k2"),
      col("text"))
    val cand = candidates.select(col("doc_id"), col("content_id"),
      normalizedKey(col("label_text")).as("k1"),
      tokenPrefixKey(col("label_text")).as("k2"))

    // duplicate keys: deterministic winner (the reference builds a
    // dict in candidate order, so duplicates overwrite; DataFrames
    // carry no row order, so [[lastIdNatural]] is the deterministic
    // stand-in; the per-document fold form keeps exact dict last-wins
    // order). Without the aggregate a duplicate key would fan the
    // citation into several rows and the final dropDuplicates would
    // keep an arbitrary one. No empty-key filter: the reference's
    // dicts keep the '' key (ref_matching.py:51-63).
    val exact = cit.join(
      cand.select(col("doc_id"), col("k1"), col("content_id"))
        .groupBy("doc_id", "k1")
        .agg(lastIdNatural(col("content_id")).as("m1")),
      Seq("doc_id", "k1"), "left")
    val prefix = exact.join(
      cand.select(col("doc_id"), col("k2"), col("content_id"))
        .groupBy("doc_id", "k2")
        .agg(lastIdNatural(col("content_id")).as("m2")),
      Seq("doc_id", "k2"), "left")

    prefix.withColumn("content_id", coalesce(col("m1"), col("m2")))
      .select("doc_id", "item_id", "text", "content_id")
  }

  /** The generic chain with the partial matcher over the candidates'
    * own label text (the shape the reference unit tests exercise). */
  def matchContentIds(citations: DataFrame, candidates: DataFrame): DataFrame =
    matchContentIds(citations, candidates, candidates)

  /** The reference-citation chain (`processor.py:244-251`): Simple
    * over `candidates` (labels), then Partial token-vote over
    * `partialCandidates` (raw reference texts) — the two stages read
    * DIFFERENT text sources, as `ChainedContentIdMatcher` does.
    *
    * DECLARED DIVERGENCE of this corpus-scale form: the vote stage
    * keeps the strict top-1-by-votes winner over distinct
    * alphanumeric tokens, where the reference's
    * `PartialContentIdMatcher` counts duplicate and
    * punctuation-normalized-empty tokens and returns the FIRST
    * candidate in Counter insertion order (`ref_matching.py:85-93`).
    * The per-document fold form ([[Processor.matchContentIdsLocal]])
    * — the path the document pipeline actually runs — implements the
    * reference's exact semantics; this join form trades that
    * order-dependence (meaningless under a shuffle) for the
    * deterministic vote count. Both agree on the reference's own
    * matcher test matrix. */
  def matchContentIds(citations: DataFrame, candidates: DataFrame,
      partialCandidates: DataFrame): DataFrame = {
    val direct = simpleStage(citations, candidates)

    // partial vote matching only for still-unmatched citations
    val unmatched = direct.filter(col("content_id").isNull)
      .select(col("doc_id"), col("item_id"), col("text"))
    val citTokens = unmatched.select(col("doc_id"), col("item_id"),
      explode(array_distinct(filter(split(lower(col("text")), "[^a-z0-9]+"),
        t => t =!= ""))).as("tok"))
    val candTokens = partialCandidates.select(col("doc_id"), col("content_id"),
      explode(array_distinct(filter(split(lower(col("label_text")), "[^a-z0-9]+"),
        t => t =!= ""))).as("tok"))
    val votes = citTokens.join(candTokens, Seq("doc_id", "tok"))
      .groupBy("doc_id", "item_id", "content_id")
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy("doc_id", "item_id").orderBy(col("votes").desc)
    val partial = votes
      .withColumn("rk", rank().over(w))
      .withColumn("nTop", count(when(col("rk") === 1, 1)).over(
        Window.partitionBy("doc_id", "item_id")))
      .filter(col("rk") === 1 && col("nTop") === 1) // tie → no match
      .select(col("doc_id"), col("item_id"), col("content_id").as("m3"))

    direct.select(col("doc_id"), col("item_id"), col("content_id"))
      .join(partial, Seq("doc_id", "item_id"), "left")
      .withColumn("content_id", coalesce(col("content_id"), col("m3")))
      .filter(col("content_id").isNotNull)
      .select("doc_id", "item_id", "content_id")
      .dropDuplicates("doc_id", "item_id")
  }

  /** F2: figure/table citation → content-id assignment — the SIMPLE
    * matcher only against figure/table *labels*
    * (`processors/fulltext/processor.py:252-267` chains no partial
    * matcher for figures/tables; ids `fig_0…`/`tab_0…` from
    * `Extractors.assignContentIds`).
    */
  def matchFigureTableIds(citations: DataFrame, figures: DataFrame): DataFrame =
    simpleStage(citations, figures)
      .filter(col("content_id").isNotNull)
      .select("doc_id", "item_id", "content_id")
      .dropDuplicates("doc_id", "item_id")

  /** G7: affiliation-by-marker grouping for TEI author building
    * (`document/tei_document.py:68-73`): markers map each author's
    * marker references to affiliation content ids.
    * @param affiliations (doc_id, content_id, marker_text)
    * @return (doc_id, marker_text, affiliation_ids sorted)
    */
  def affiliationsByMarker(affiliations: DataFrame): DataFrame =
    affiliations
      .groupBy("doc_id", "marker_text")
      .agg(sort_array(collect_list(col("content_id"))).as("affiliation_ids"))
}
