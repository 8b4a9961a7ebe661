package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BoundedAgg

/** Bounded per-group selection operators — the "k rows per key" family
  * a training-data pipeline runs constantly (per-source QA samples,
  * per-source vocabulary dashboards). Both operators refuse the
  * window-rank formulation: `row_number() OVER (PARTITION BY g ORDER BY
  * s)` shuffles and SORTS every row of the corpus to keep k per group,
  * while the bounded aggregates here truncate to k map-side and plan
  * one hash-agg exchange of ≤ k·groups rows — the difference between a
  * corpus-wide sort and a dashboard-sized shuffle at 100 TB.
  */
object Sampling {

  /** Deterministic multiplicative hash score in [0, 1000003): a
    * reproducible "uniform" draw both engines compute exactly with
    * 64-bit integer arithmetic (no float, no engine-specific hash).
    * Knuth's 2654435761 multiplier; exact while id < 2^31.5 (the
    * product must stay inside the oracle's checked BIGINT), which a
    * per-table sequential id satisfies far past 10^9 documents.
    */
  def hashScore(id: Column): Column = (id * lit(2654435761L)) % lit(1000003L)

  /** Fail fast on a non-integral id: a silent cast-to-null would make
    * the hash-keyed selection drop every row and return an empty
    * sample. */
  private def requireIntegralId(df: DataFrame, idCol: String,
      op: String): Unit = {
    val idType = df.schema(idCol).dataType
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(idType),
      s"$op needs an integral id column; $idCol is $idType")
  }

  /** k documents per group, selected by the deterministic [[hashScore]]
    * order (score asc, id asc) — a reproducible per-group random sample
    * (QA/eyeball sets, per-source eval carve-outs). One bounded
    * hash aggregate; no window, no sort of the corpus.
    *
    * Output: (group, rank 1-based, id) rows.
    */
  def groupSample(df: DataFrame, groupCol: String, idCol: String,
      k: Int): DataFrame = {
    requireIntegralId(df, idCol, "groupSample")
    val scored = df.select(col(groupCol), col(idCol).cast("long").as("__id"),
      hashScore(col(idCol).cast("long")).cast("double").as("__s"))
    scored.groupBy(col(groupCol))
      .agg(BoundedAgg.collect_min_k_by(col("__s"), col("__id"), k).as("top"))
      .select(col(groupCol), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col(groupCol), (col("pos") + 1).cast("long").as("rn"),
        col("p.id").as(idCol))
  }

  /** Per-group document CAP — the FineWeb-style domain/host cap at the
    * `groupCol` granularity: keep at most `cap` documents per group,
    * preferring the highest `scoreCol` (ties → smallest id), so one
    * over-represented domain cannot dominate the training mixture. The
    * window formulation (`row_number() OVER (PARTITION BY group ORDER
    * BY score DESC, id)`) funnels every group through one reducer and
    * sorts the whole corpus — the class-count parallelism ceiling at
    * 100 TB with a handful of domains; the bounded `collect_min_k_by`
    * aggregate truncates to `cap` (−score, id) pairs map-side, so the
    * only exchange carries ≤ cap·groups rows and no sort happens
    * anywhere. Scores must stay < 2^53 for the double to hold them
    * exactly (lengths/token counts do).
    *
    * Output: (group, id, rank 1-based) keeper rows; left-semi join the
    * ids back to materialize the capped corpus — ids only, the text
    * never shuffles.
    */
  def groupCap(df: DataFrame, groupCol: String, cap: Int,
      scoreCol: String = "n_chars", idCol: String = "doc_id"): DataFrame = {
    requireIntegralId(df, idCol, "groupCap")
    // null scores rank LAST (the window's `score DESC NULLS LAST, id`)
    // rather than being dropped: the bounded aggregate skips null
    // score inputs, which would silently evict null-score documents
    // from the capped corpus even with cap headroom. The sentinel is
    // NaN — java.lang.Double.compare sorts it strictly after +Inf, so
    // a -Infinity or -Double.MaxValue score still ranks ABOVE every
    // null (a finite sentinel collides or inverts there). The one case
    // outside the window-parity guarantee is a NaN SCORE: it ties with
    // nulls here, where the window's DESC would rank NaN first.
    df.select(col(groupCol), col(idCol).cast("long").as("__id"),
        coalesce(negate(col(scoreCol).cast("double")),
          lit(Double.NaN)).as("__s"))
      .groupBy(col(groupCol))
      .agg(BoundedAgg.collect_min_k_by(col("__s"), col("__id"), cap).as("top"))
      .select(col(groupCol), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col(groupCol), col("p.id").as(idCol),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** Top-k most frequent tokens per group (the per-source vocabulary
    * dashboard / domain-signature report). Stage 1: one map-side
    * combined count per (group, token). Stage 2: bounded string-payload
    * top-k per group — score = -count so smallest-k = most frequent,
    * ties broken by token bytes ascending, matching `ORDER BY cnt DESC,
    * tok` exactly. Counts < 2^53 stay exact in the double score.
    *
    * Output: (group, rank 1-based, tok, cnt) rows.
    */
  def heavyHitters(df: DataFrame, groupCol: String, textCol: String,
      k: Int): DataFrame = {
    // row-local tf first (native token_tf kernel): the exploded stream
    // carries one row per DISTINCT token per document, not one per
    // occurrence — in-document repetition collapses before any shuffle
    val toks = df.select(col(groupCol),
      explode(graft.functions.Sketch.token_tf_text(col(textCol))).as("p"))
    val counts = toks.groupBy(col(groupCol), col("p.tok").as("tok"))
      .agg(sum(col("p.tf")).as("cnt"))
    counts.groupBy(col(groupCol))
      .agg(BoundedAgg.collect_min_k_by_str(
        -col("cnt").cast("double"), col("tok"), k).as("top"))
      .select(col(groupCol), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col(groupCol), (col("pos") + 1).cast("long").as("rn"),
        col("p.value").as("tok"), (-col("p.score")).cast("long").as("cnt"))
  }

  /** Weighted sample WITHOUT replacement — k documents drawn with
    * probability proportional to a weight column (tokens, chars, a
    * quality score): the "sample tokens, not documents" draw behind
    * representative QA sets and weighted eval carve-outs. The
    * Efraimidis–Spirakis exponential-key order: each row gets
    * `key = -ln(u) / w` for a uniform `u` and weight `w`, and the k
    * SMALLEST keys are exactly a weighted draw without replacement.
    * `u` is the deterministic [[hashScore]] uniform (content- and
    * layout-independent, so the draw never re-rolls across runs,
    * engines, or cluster layouts) shifted to (0,1) — `ln(0)` cannot
    * occur; the key is rounded to integer micronats once (the q79
    * discipline) so the declared query hashes across engines, with id
    * as the total-order tie-break. Non-positive weights clamp to 1.
    *
    * Scale shape: one narrow scan, then `TakeOrderedAndProject` — each
    * partition surrenders at most k rows; no full sort, no window, and
    * the corpus never shuffles.
    */
  def weightedSample(df: DataFrame, weightCol: String, idCol: String,
      k: Int): DataFrame = {
    requireIntegralId(df, idCol, "weightedSample")
    val u = (hashScore(col(idCol).cast("long")).cast("double") + lit(0.5)) /
      lit(1000003.0)
    val key = round(-log(u) /
        greatest(col(weightCol).cast("double"), lit(1.0)) * lit(1e6))
      .cast("long")
    df.withColumn("key_m", key)
      .orderBy(col("key_m"), col(idCol))
      .limit(k)
  }

  /** Approximate heavy hitters — [[heavyHitters]]'s 100 TB path for
    * when the distinct (group, token) count table itself outgrows its
    * exchange (a web-scale corpus carries billions of distinct tokens;
    * the exact form shuffles every one of them once). Per-partition
    * frequent-items summaries (Spark's `approx_top_k`, a Misra–Gries
    * sketch capped at `maxTracked` counters) merge map-side, so the
    * only exchange is O(groups × maxTracked) sketch entries however
    * large the vocabulary. Counts are EXACT while a group's vocabulary
    * fits inside `maxTracked` — the regime the shared q91 oracle
    * checks — and carry the standard n/maxTracked over-count bound
    * beyond it. The sketch's own output order is not contractual, so
    * the final top-k re-ranks with the bounded (count desc, token asc)
    * aggregate over the DASHBOARD-sized estimate rows (≤ sketchK per
    * group), never the corpus.
    *
    * Output: (group, rank 1-based, tok, cnt) rows — [[heavyHitters]]'s
    * exact shape.
    */
  def approxHeavyHitters(df: DataFrame, groupCol: String, textCol: String,
      k: Int, sketchK: Int = 64, maxTracked: Int = 4096): DataFrame = {
    require(k <= sketchK, s"k=$k must not exceed sketchK=$sketchK")
    val toks = df.select(col(groupCol),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val est = toks.groupBy(col(groupCol))
      .agg(expr(s"approx_top_k(tok, $sketchK, $maxTracked)").as("top"))
      .select(col(groupCol), explode(col("top")).as("p"))
      .select(col(groupCol), col("p.item").as("tok"),
        col("p.count").as("cnt"))
    rerank(est, groupCol, k)
  }

  /** Incremental heavy-hitters index, accumulate half: summarize a
    * corpus snapshot (or one delivery) into a per-group mergeable
    * sketch STATE — the q102 persisted-index discipline applied to the
    * vocabulary dashboard. The state is a plain struct (parquet-
    * persistable); [[heavyHittersCombine]] folds a delivery's states
    * into the stored ones without rescanning the corpus, and
    * [[heavyHittersEstimate]] serves the dashboard from state alone.
    */
  def heavyHittersAccumulate(df: DataFrame, groupCol: String,
      textCol: String, maxTracked: Int = 4096): DataFrame =
    df.select(col(groupCol),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy(col(groupCol))
      .agg(expr(s"approx_top_k_accumulate(tok, $maxTracked)").as("state"))

  /** Incremental heavy-hitters index, combine half: fold any number of
    * per-group states (stored index + new deliveries, unioned) into
    * one state per group. Sketch-sized rows in, sketch-sized rows out.
    */
  def heavyHittersCombine(states: DataFrame, groupCol: String,
      maxTracked: Int = 4096): DataFrame =
    states.groupBy(col(groupCol))
      .agg(expr(s"approx_top_k_combine(state, $maxTracked)").as("state"))

  /** Incremental heavy-hitters index, serve half: the (group, rn, tok,
    * cnt) dashboard from sketch state alone — no corpus scan. */
  def heavyHittersEstimate(states: DataFrame, groupCol: String, k: Int,
      sketchK: Int = 64): DataFrame = {
    require(k <= sketchK, s"k=$k must not exceed sketchK=$sketchK")
    val est = states
      .select(col(groupCol),
        explode(expr(s"approx_top_k_estimate(state, $sketchK)")).as("p"))
      .select(col(groupCol), col("p.item").as("tok"),
        col("p.count").as("cnt"))
    rerank(est, groupCol, k)
  }

  /** Deterministic (count desc, token asc) top-k over sketch-estimate
    * rows via the bounded aggregate — the input is dashboard-sized
    * (≤ sketchK rows per group), so this never touches the corpus. */
  private def rerank(est: DataFrame, groupCol: String, k: Int): DataFrame =
    est.groupBy(col(groupCol))
      .agg(BoundedAgg.collect_min_k_by_str(
        -col("cnt").cast("double"), col("tok"), k).as("top"))
      .select(col(groupCol), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col(groupCol), (col("pos") + 1).cast("long").as("rn"),
        col("p.value").as("tok"), (-col("p.score")).cast("long").as("cnt"))
}
