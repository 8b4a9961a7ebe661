package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table/corpus profiling — the data-validation pass a pipeline runs
  * before committing a corpus to training (the `SUMMARIZE` shape):
  * per-column null count, exact distinct count, and min/max rendered
  * as strings.
  */
object Profiling {

  /** One-pass per-column profile. All statistics for every column are
    * computed in a SINGLE aggregate over the table (Catalyst plans the
    * multi-distinct via Expand + partial aggregation — one scan, one
    * exchange); the collected result is exactly ONE row, unpivoted
    * driver-side into the per-column report. `count_distinct` is exact
    * to stay oracle-checkable — substitute `approx_count_distinct`
    * for a cheap 100 TB sweep where ±2% is fine.
    */
  def profileTable(df: DataFrame, columns: Seq[String] = Nil,
      exact: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cs = if (columns.nonEmpty) columns else df.columns.toSeq
    require(cs.nonEmpty, "profileTable needs at least one column")
    val aggs = cs.flatMap { c =>
      // exact=false is the 100 TB sweep: HLL sketches replace the
      // multi-distinct, which removes the Expand (cols+1 row copies)
      // AND the distinct-key exchange — the whole profile becomes one
      // ordinary partial/final aggregate pass (±~2% on distincts)
      val distinctAgg =
        if (exact) count_distinct(col(c)) else approx_count_distinct(col(c))
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__n_$c"),
        distinctAgg.as(s"__d_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    def longAt(i: Int): Long = if (row.isNullAt(i)) 0L else row.getLong(i)
    def strAt(i: Int): String = if (row.isNullAt(i)) null else row.getString(i)
    cs.zipWithIndex.map { case (c, i) =>
      (c, longAt(i * 4), longAt(i * 4 + 1), strAt(i * 4 + 2), strAt(i * 4 + 3))
    }.toDF("column_name", "n_nulls", "n_distinct", "min_value", "max_value")
  }

  /** Key-skew diagnostic — the pre-join/pre-aggregation check that
    * finds hot keys BEFORE they melt an executor at 100 TB (and sizes
    * the mitigation: `skew` is how many fair shares of the table the
    * key holds, i.e. the salt factor a q101-style salted aggregation
    * or an AQE skew-join split needs). Reports the k hottest keys with
    * count, share of all rows, and skew factor = count / (rows /
    * distinct keys).
    *
    * Scale shape: per-key counts are ONE map-side-combined aggregate;
    * the totals (rows + distinct keys) are one tiny aggregate over the
    * counts frame — the corpus is scanned once and never rescanned;
    * the hottest-k selection is the bounded string-payload top-k
    * (partial buffers truncate to k map-side), so no window and no
    * sort anywhere. Keys render as strings so any key type profiles.
    */
  def skewReport(df: DataFrame, keyCol: String, k: Int = 20): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum("cnt").cast("double").as("total"),
      count(lit(1)).cast("double").as("nkeys"))
    counts.agg(graft.functions.BoundedAgg.collect_min_k_by_str(
        -col("cnt").cast("double"), col("key"), k).as("top"))
      .crossJoin(broadcast(totals))
      .select(posexplode(col("top")).as(Seq("pos", "p")),
        col("total"), col("nkeys"))
      .select((col("pos") + 1).cast("long").as("rank"),
        col("p.value").as("key"),
        (-col("p.score")).cast("long").as("cnt"),
        round(-col("p.score") / col("total"), 4).as("share"),
        round(-col("p.score") * col("nkeys") / col("total"), 4).as("skew"))
  }

  /** Per-group distinct-vocabulary sketch — the HLL state half of an
    * incremental distinct-count index (Spark's DataSketches
    * `hll_sketch_agg`): summarize a snapshot or delivery ONCE into one
    * binary sketch row per group, persist as parquet, and keep folding
    * deliveries in with [[vocabCombine]] — distinct-token tracking
    * across snapshots without ever rescanning the corpus. Sketches are
    * exact in HLL's sparse regime (small vocabularies) and ±~2%
    * beyond.
    */
  def vocabSketch(docs: DataFrame, groupCol: String = "source",
      textCol: String = "text"): DataFrame =
    docs.select(col(groupCol),
        explode(graft.operators.TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy(col(groupCol))
      .agg(expr("hll_sketch_agg(tok)").as("state"))

  /** Fold any number of per-group vocabulary sketches (stored index +
    * new deliveries, unioned) into one state row per group. */
  def vocabCombine(states: DataFrame, groupCol: String = "source"): DataFrame =
    states.groupBy(col(groupCol))
      .agg(expr("hll_union_agg(state)").as("state"))

  /** Vocabulary growth a delivery introduces per group — the drift /
    * anomaly signal that catches a broken scraper or an injected
    * corpus as a vocabulary explosion: distinct-token estimate before
    * (the stored index), after (index ∪ delivery), and the newly-added
    * difference. Everything is sketch-sized after the delivery's one
    * summarization pass; groups absent from either side report 0.
    */
  def vocabGrowth(baseState: DataFrame, delivery: DataFrame,
      groupCol: String = "source", textCol: String = "text"): DataFrame = {
    val before = baseState
      .select(col(groupCol),
        expr("hll_sketch_estimate(state)").as("vocab_before"))
    val after = vocabCombine(
        baseState.unionByName(vocabSketch(delivery, groupCol, textCol)),
        groupCol)
      .select(col(groupCol),
        expr("hll_sketch_estimate(state)").as("vocab_after"))
    before.join(after, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        coalesce(col("vocab_before"), lit(0L)).as("vocab_before"),
        coalesce(col("vocab_after"), lit(0L)).as("vocab_after"),
        (coalesce(col("vocab_after"), lit(0L)) -
          coalesce(col("vocab_before"), lit(0L))).as("vocab_new"))
  }

  /** Per-group distinct-vocabulary THETA sketch — [[vocabSketch]]'s
    * set-algebra sibling (DataSketches theta supports union,
    * intersection AND difference, where HLL only unions): same
    * summarize-once, parquet-persistable, `theta_union_agg`-foldable
    * state discipline. */
  def vocabThetaSketch(docs: DataFrame, groupCol: String = "source",
      textCol: String = "text"): DataFrame =
    docs.select(col(groupCol),
        explode(graft.operators.TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy(col(groupCol))
      .agg(expr("theta_sketch_agg(tok)").as("state"))

  /** Vocabulary Venn report between two snapshot states — the full
    * between-snapshot set algebra [[vocabGrowth]] cannot express
    * (union-only HLL has no "lost"): per group, distinct tokens only
    * in A (vocab_lost — types that disappeared from the refresh, the
    * signature of a source going dark or a filter overtightening),
    * shared, and only in B (vocab_gained). Sketch-sized everywhere;
    * groups absent from one side report zeros on that side. Exact in
    * theta's sparse regime, ±~2% beyond.
    */
  def vocabVenn(stateA: DataFrame, stateB: DataFrame,
      groupCol: String = "source"): DataFrame = {
    val a = stateA.select(col(groupCol), col("state").as("__sa"))
    val b = stateB.select(col(groupCol), col("state").as("__sb"))
    a.join(b, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        when(col("__sa").isNull, lit(0L))
          .when(col("__sb").isNull,
            expr("theta_sketch_estimate(__sa)"))
          .otherwise(expr(
            "theta_sketch_estimate(theta_difference(__sa, __sb))"))
          .as("vocab_lost"),
        when(col("__sa").isNull || col("__sb").isNull, lit(0L))
          .otherwise(expr(
            "theta_sketch_estimate(theta_intersection(__sa, __sb))"))
          .as("vocab_shared"),
        when(col("__sb").isNull, lit(0L))
          .when(col("__sa").isNull,
            expr("theta_sketch_estimate(__sb)"))
          .otherwise(expr(
            "theta_sketch_estimate(theta_difference(__sb, __sa))"))
          .as("vocab_gained"))
  }

  /** Incremental quantile statistics (Spark's DataSketches KLL
    * built-ins) — corpus distribution stats maintained as a persisted
    * MERGEABLE sketch instead of recomputed with a corpus-wide
    * percentile pass per refresh: sketch each delivery once into one
    * binary row, fold into the stored state with [[quantileCombine]],
    * and read any quantile from state alone ([[quantilesFromSketch]],
    * [[lengthBandFilterFromSketch]]). Rank error ~1.65% at the
    * default sketch size — a band boundary moves by at most that rank
    * error vs the exact two-pass bounds.
    */
  def quantileSketch(df: DataFrame, valueCol: String): DataFrame =
    df.agg(expr(s"kll_sketch_agg_bigint(CAST(`$valueCol` AS BIGINT))")
      .as("state"))

  /** Fold any number of quantile-sketch states (stored + deliveries,
    * unioned) into one. */
  def quantileCombine(states: DataFrame): DataFrame =
    states.agg(expr("kll_merge_agg_bigint(state)").as("state"))

  /** (quantile, value) rows read from sketch state alone. */
  def quantilesFromSketch(state: DataFrame, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty, "quantilesFromSketch needs at least one quantile")
    state.select(explode(array(qs.map(q =>
        struct(lit(q).as("quantile"),
          expr(s"kll_sketch_get_quantile_bigint(state, ${q}d)")
            .as("value"))): _*)).as("r"))
      .select(col("r.quantile"), col("r.value"))
  }

  /** The q60 length-band corpus cut with bounds served from the
    * persisted sketch: one broadcast bounds row, row-local filter —
    * the corpus is never scanned to FIND the band, only to apply it. */
  def lengthBandFilterFromSketch(docs: DataFrame, state: DataFrame,
      lo: Double = 0.05, hi: Double = 0.95,
      lengthCol: String = "n_chars"): DataFrame = {
    val bounds = state.select(
      expr(s"kll_sketch_get_quantile_bigint(state, ${lo}d)").as("__lo"),
      expr(s"kll_sketch_get_quantile_bigint(state, ${hi}d)").as("__hi"))
    docs.crossJoin(broadcast(bounds))
      .filter(col(lengthCol) >= col("__lo") && col(lengthCol) <= col("__hi"))
      .drop("__lo", "__hi")
  }

  /** Source-mixture drift between two corpus snapshots — the
    * governance check that a refresh did not silently shift the
    * training mixture: per source, token totals and shares in each
    * snapshot plus the log share ratio (integer micronats, the q79
    * rounding discipline, so the value hashes across engines; 0 for a
    * source present in only one snapshot is encoded as null).
    *
    * Scale shape: each snapshot reduces to one #sources-row aggregate
    * (map-side combined token sums); everything after is
    * dashboard-sized.
    */
  def mixtureDrift(a: DataFrame, b: DataFrame, textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    def shares(df: DataFrame, n: String) = {
      val t = df.groupBy(col(sourceCol).as("source"))
        .agg(sum(size(graft.operators.TextAnalysis.tokens(col(textCol))))
          .cast("long").as(s"toks_$n"))
      t.crossJoin(broadcast(t.agg(sum(s"toks_$n").cast("double").as(s"tt_$n"))))
        .select(col("source"), col(s"toks_$n"),
          (col(s"toks_$n") / col(s"tt_$n")).as(s"share_$n"))
    }
    shares(a, "a").join(shares(b, "b"), Seq("source"), "full_outer")
      .select(col("source"),
        coalesce(col("toks_a"), lit(0L)).as("toks_a"),
        coalesce(col("toks_b"), lit(0L)).as("toks_b"),
        round(coalesce(col("share_a"), lit(0.0)), 4).as("share_a"),
        round(coalesce(col("share_b"), lit(0.0)), 4).as("share_b"),
        // null drift when either side is absent or zero-token: log of
        // 0 or of Inf is not a drift number, and the oracle's CASE
        // guard mirrors exactly this
        when(col("share_a") > 0.0 && col("share_b") > 0.0,
          round(log(col("share_b") / col("share_a")) * lit(1e6))
            .cast("long")).as("drift_micronats"))
  }
}
