package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Extended relational coverage beyond the §2.B list: statistical
  * aggregates, exact percentiles, pivot, higher-order array functions,
  * conditional functions — each oracle-checked against DuckDB.
  */
object Extended {
  type Q = (SparkSession, String) => DataFrame

  /** Q45 statistical aggregates (Welford vs two-pass agree to 4dp on
    * integer-valued quantities). */
  def q45(s: SparkSession, d: String): DataFrame =
    Tables(s, d).lineitem
      .groupBy("l_returnflag")
      .agg(round(stddev_samp(col("l_quantity")), 4).as("sd"),
        round(var_samp(col("l_quantity")), 4).as("vr"),
        round(avg(col("l_quantity")), 4).as("av"))
      .orderBy("l_returnflag")

  /** Q46 exact percentiles / median. */
  def q46(s: SparkSession, d: String): DataFrame =
    Tables(s, d).lineitem
      .groupBy("l_linestatus")
      .agg(round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_quantity, 0.9)"), 4).as("p90"),
        round(expr("percentile(l_quantity, 0.99)"), 4).as("p99"))
      .orderBy("l_linestatus")

  /** Q47 pivot (conditional aggregation under the hood). */
  def q47(s: SparkSession, d: String): DataFrame =
    Tables(s, d).lineitem
      .groupBy("l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(round(sum(col("l_quantity")), 4))
      .orderBy("l_linestatus")

  /** Q48 higher-order array semantics over document tokens (exists /
    * filter-count / aggregate-sum / transform-max), fused into the
    * single-pass [[graft.functions.TextStats]] kernel: the HOF
    * formulation re-split the text and re-walked the token array once
    * per output column (8.2× DuckDB marginal); the kernel computes all
    * four in one scan with identical declared semantics.
    */
  def q48(s: SparkSession, d: String): DataFrame = {
    // masked kernel: q48 reads 4 of the 13 stats, so the word-set
    // lookups and the lowercase second pass are skipped entirely
    val st = graft.functions.TextStats.text_stats(col("text"), Seq(9, 10, 11, 12))
    Tables(s, d).documents.select(col("doc_id"),
      (st.getItem(9) === 1).cast("string").as("has_the"),
      st.getItem(10).as("n_long"),
      st.getItem(11).as("total_len"),
      st.getItem(12).as("max_len"))
      .orderBy("doc_id")
  }

  /** Q49 conditional scalar functions. */
  def q49(s: SparkSession, d: String): DataFrame =
    Tables(s, d).lineitem.filter(col("l_orderkey") <= 200)
      .select(col("l_orderkey"), col("l_linenumber").cast("bigint").as("l_linenumber"),
        when(col("l_quantity") > 25, "H").otherwise("L").as("bucket"),
        nullif(col("l_returnflag"), lit("N")).as("nf"),
        round(greatest(col("l_discount"), col("l_tax")), 4).as("gt"),
        round(least(col("l_discount"), col("l_tax")), 4).as("lt"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Q52 CUBE: all four grouping combinations in one pass (the ROLLUP
    * companion of q15). `grouping_id` disambiguates the super-aggregate
    * rows instead of COALESCE sentinels. Physically a single Expand +
    * partial/final agg — one shuffle regardless of grouping-set count.
    */
  def q52(s: SparkSession, d: String): DataFrame =
    Tables(s, d).lineitem
      .cube("l_returnflag", "l_linestatus")
      .agg(grouping_id().cast("bigint").as("gid"),
        count(lit(1)).as("n"), round(sum(col("l_quantity")), 4).as("sq"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("f"),
        coalesce(col("l_linestatus"), lit("ALL")).as("st"),
        col("gid"), col("n"), col("sq"))
      .orderBy("f", "st")

  /** Q54 ordered string aggregation (listagg): deterministic because the
    * per-group collection is sorted before joining — `collect_list`
    * order is otherwise partition-dependent. */
  def q54(s: SparkSession, d: String): DataFrame =
    Tables(s, d).supplier
      .groupBy(col("s_nationkey").cast("bigint").as("nk"))
      .agg(array_join(array_sort(collect_list(col("s_name"))), ",").as("names"),
        count(lit(1)).as("n"))
      .orderBy("nk")

  /** Q55 regression aggregates (corr / covar / slope / intercept). Both
    * variables are integer-valued so every accumulated moment is exact
    * in double and the result is order-independent — the same trick q45
    * leans on to make Welford-style streaming moments hashable. */
  def q55(s: SparkSession, d: String): DataFrame =
    Tables(s, d).lineitem
      .groupBy("l_returnflag")
      .agg(round(corr(col("l_quantity"), col("l_linenumber")), 4).as("cr"),
        round(covar_samp(col("l_quantity"), col("l_linenumber")), 4).as("cv"),
        round(expr("regr_slope(l_quantity, l_linenumber)"), 4).as("sl"),
        round(expr("regr_intercept(l_quantity, l_linenumber)"), 4).as("ic"))
      .orderBy("l_returnflag")

  /** Q56 sliding-window aggregation (1 h window, 30 min slide): each
    * event lands in exactly two windows; Spark's `window()` expands
    * map-side, so the shuffle carries (window, type) keys — same
    * single-shuffle shape as the tumbling q29. Declared-oracle form:
    * slide-aligned buckets b and b-30min per event. */
  def q56(s: SparkSession, d: String): DataFrame =
    Tables(s, d).events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w"),
        col("event_type"), col("n"), col("sv"))
      .orderBy("w", "event_type")

  /** Q57 native session windows (30 min gap) — Spark's `session_window`
    * verified against the first-principles lag/running-sum SQL oracle
    * (q30's formulation with the boundary at ts >= prev + gap, matching
    * session_window's overlap-merge semantics). Session starts are
    * rendered with microseconds: two sessions of one user can start in
    * the same second, and the hash needs a total order. */
  def q57(s: SparkSession, d: String): DataFrame =
    Tables(s, d).events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ss"),
        col("n"))
      .orderBy("user_id", "ss")

  val queries: Map[String, Q] = Map(
    "q45_stats_agg" -> q45, "q46_percentiles" -> q46, "q47_pivot" -> q47,
    "q48_higher_order" -> q48, "q49_conditional" -> q49,
    "q52_cube" -> q52, "q54_string_agg" -> q54, "q55_regr" -> q55,
    "q56_window_sliding" -> q56, "q57_session_window" -> q57,
  )

  val oracleSql: Map[String, String] = Map(
    "q45_stats_agg" ->
      """SELECT l_returnflag, ROUND(STDDEV_SAMP(l_quantity),4) AS sd,
         ROUND(VAR_SAMP(l_quantity),4) AS vr, ROUND(AVG(l_quantity),4) AS av
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q46_percentiles" ->
      """SELECT l_linestatus, ROUND(QUANTILE_CONT(l_quantity, 0.5),4) AS p50,
         ROUND(QUANTILE_CONT(l_quantity, 0.9),4) AS p90,
         ROUND(QUANTILE_CONT(l_quantity, 0.99),4) AS p99
         FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",
    "q47_pivot" ->
      """SELECT l_linestatus,
         ROUND(SUM(CASE WHEN l_returnflag='A' THEN l_quantity END),4) AS "A",
         ROUND(SUM(CASE WHEN l_returnflag='N' THEN l_quantity END),4) AS "N",
         ROUND(SUM(CASE WHEN l_returnflag='R' THEN l_quantity END),4) AS "R"
         FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",
    "q48_higher_order" ->
      """SELECT doc_id,
         CAST(LEN(LIST_FILTER(STRING_SPLIT(text,' '), t -> t = 'the')) > 0 AS VARCHAR) AS has_the,
         CAST(LEN(LIST_FILTER(STRING_SPLIT(text,' '), t -> LENGTH(t) > 5)) AS BIGINT) AS n_long,
         CAST(LIST_SUM(LIST_TRANSFORM(STRING_SPLIT(text,' '), t -> LENGTH(t))) AS BIGINT) AS total_len,
         CAST(LIST_MAX(LIST_TRANSFORM(STRING_SPLIT(text,' '), t -> LENGTH(t))) AS BIGINT) AS max_len
         FROM documents ORDER BY doc_id""",
    "q49_conditional" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         CASE WHEN l_quantity > 25 THEN 'H' ELSE 'L' END AS bucket,
         NULLIF(l_returnflag, 'N') AS nf,
         ROUND(GREATEST(l_discount, l_tax),4) AS gt,
         ROUND(LEAST(l_discount, l_tax),4) AS lt
         FROM lineitem WHERE l_orderkey <= 200 ORDER BY l_orderkey, l_linenumber""",
    "q52_cube" ->
      """SELECT COALESCE(l_returnflag,'ALL') AS f, COALESCE(l_linestatus,'ALL') AS st,
         CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         COUNT(*) AS n, ROUND(SUM(l_quantity),4) AS sq
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus) ORDER BY f, st""",
    "q54_string_agg" ->
      """SELECT CAST(s_nationkey AS BIGINT) AS nk,
         STRING_AGG(s_name, ',' ORDER BY s_name) AS names, COUNT(*) AS n
         FROM supplier GROUP BY nk ORDER BY nk""",
    "q55_regr" ->
      """SELECT l_returnflag, ROUND(CORR(l_quantity, l_linenumber),4) AS cr,
         ROUND(COVAR_SAMP(l_quantity, l_linenumber),4) AS cv,
         ROUND(REGR_SLOPE(l_quantity, l_linenumber),4) AS sl,
         ROUND(REGR_INTERCEPT(l_quantity, l_linenumber),4) AS ic
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q56_window_sliding" ->
      """SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS w, event_type,
         COUNT(*) AS n, ROUND(SUM(value),4) AS sv
         FROM (SELECT UNNEST([TIME_BUCKET(INTERVAL '30 minutes', ts),
                              TIME_BUCKET(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE]) AS ws,
                      event_type, value FROM events)
         GROUP BY ws, event_type ORDER BY w, event_type""",
    "q57_session_window" ->
      """SELECT user_id, STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS ss, COUNT(*) AS n FROM
         (SELECT user_id, ts, SUM(new_s) OVER
            (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
          FROM (SELECT user_id, ts, event_id,
                CASE WHEN ts >= LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          + INTERVAL 30 MINUTE
                     OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_s FROM events))
         GROUP BY user_id, session_id ORDER BY user_id, ss""",
  ).map { case (k, v) => k -> v.stripMargin.replaceAll("\\s+", " ").trim }
}
