package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational operator surface (SURVEY.md §2.B, Q01-Q32).
  *
  * Each query is a plain DataFrame program — Catalyst supplies predicate
  * pushdown, column pruning, join selection (broadcast for the small
  * dims), partial aggregation and whole-stage codegen. Every query is
  * deterministic: fully ORDER BY-ed on a unique key, doubles ROUND-ed to
  * 4 digits, timestamps rendered as ISO strings, and every computed
  * integer column cast to BIGINT so the Spark parquet schema matches the
  * DuckDB oracle's default integer widths.
  *
  * The reference (elifesciences/sciencebeam-parser) has no SQL surface;
  * these are the relational decompositions of its dataflow operators
  * cited per-query in SURVEY.md §2.B (e.g. Q10 as-of join ↔ the
  * graphic-distance matching F3, Q30 sessionization ↔ BIO span grouping
  * `models/model.py:61-79`).
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  private def r4(c: Column): Column = round(c, 4)

  // ---------------------------------------------------------------- scans
  /** Q01 scan: full-table count + sum; parquet scan reads 1 column. */
  def q01(s: SparkSession, d: String): DataFrame =
    Tables(s, d).lineitem
      .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("s"))

  /** Q02 projection: arithmetic projection, no shuffle. */
  def q02(s: SparkSession, d: String): DataFrame =
    Tables(s, d).lineitem
      .select(col("l_orderkey"), col("l_linenumber").cast("bigint").as("l_linenumber"),
        r4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Q03 filter: AND/BETWEEN/IN — all pushed to the parquet scan. */
  def q03(s: SparkSession, d: String): DataFrame =
    Tables(s, d).lineitem
      .filter(col("l_returnflag") === "R" &&
        col("l_quantity").between(10, 20) &&
        col("l_linestatus").isin("F", "O"))
      .select(col("l_orderkey"), col("l_linenumber").cast("bigint").as("l_linenumber"))
      .orderBy("l_orderkey", "l_linenumber")

  // ---------------------------------------------------------------- joins
  /** Q04 inner equi-join; filter on orders pushed below the join. */
  def q04(s: SparkSession, d: String): DataFrame = {
    val t = Tables(s, d)
    t.orders.filter(col("o_totalprice") > 100000)
      .join(t.customer, col("o_custkey") === col("c_custkey"), "inner")
      .select("o_orderkey", "c_name")
      .orderBy("o_orderkey")
  }

  /** Q05 broadcast join: nation/region are tiny dims — broadcast both so
    * the customer side never shuffles. */
  def q05(s: SparkSession, d: String): DataFrame = {
    val t = Tables(s, d)
    t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey", "n_name", "r_name")
      .orderBy("c_custkey")
  }

  /** Q06 left outer join. */
  def q06(s: SparkSession, d: String): DataFrame = {
    val t = Tables(s, d)
    t.customer.join(t.orders, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), coalesce(col("o_orderkey"), lit(-1L)).as("ok"))
      .orderBy("c_custkey", "ok")
  }

  /** Q07 left semi (EXISTS). */
  def q07(s: SparkSession, d: String): DataFrame = {
    val t = Tables(s, d)
    t.customer.join(t.orders.filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey").orderBy("c_custkey")
  }

  /** Q08 left anti (NOT EXISTS). */
  def q08(s: SparkSession, d: String): DataFrame = {
    val t = Tables(s, d)
    t.customer.join(t.orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey").orderBy("c_custkey")
  }

  /** Q09 theta join (graphic-distance analog F3): the equi part
    * (p_size = s_nationkey) hash-partitions; the inequality stays a
    * post-join filter — no nested-loop blowup. */
  def q09(s: SparkSession, d: String): DataFrame = {
    val t = Tables(s, d)
    t.part.filter(col("p_partkey") <= 200)
      .join(t.supplier,
        col("p_size") === col("s_nationkey") && col("p_retailprice") > col("s_acctbal"))
      .select("p_partkey", "s_suppkey")
      .orderBy("p_partkey", "s_suppkey")
  }

  /** Q10 as-of join (latest order date ≤ event date per user).
    *
    * Spark has no native as-of join; the naive formulation is a range
    * join (O(orders × events) within each user). This implementation is
    * the scale path: union orders and events tagged, one shuffle on the
    * user key, and a running MAX window — orders sort before events at
    * equal date so the `≤` is inclusive. Linear in input, no range join.
    */
  def q10(s: SparkSession, d: String): DataFrame = {
    val t = Tables(s, d)
    val o = t.orders.select(col("o_custkey").as("k"),
      to_date(col("o_orderdate")).as("d"), lit(null).cast("bigint").as("event_id"),
      lit(0).as("is_ev"))
    val e = t.events.select(col("user_id").as("k"),
      to_date(col("ts")).as("d"), col("event_id"), lit(1).as("is_ev"))
    val w = Window.partitionBy("k").orderBy("d", "is_ev")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.unionByName(e)
      .withColumn("last_od", max(when(col("is_ev") === 0, col("d"))).over(w))
      .filter(col("is_ev") === 1 && col("last_od").isNotNull)
      .select("event_id", "last_od")
      .orderBy("event_id")
  }

  /** Q65 interval/point range join via bucketization
    * ([[graft.operators.Partitioning.rangeJoinBucketed]]): every 100th
    * event opens a 1-hour incident window; count the events falling in
    * each window. A non-equi join like this plans as
    * BroadcastNestedLoopJoin — O(windows × events) — without the
    * bucket equi-key; bucketed at the window span it is a plain hash
    * join + in-bucket filter. Epochs floored to whole seconds on both
    * engines.
    */
  def q65(s: SparkSession, d: String): DataFrame = {
    val ev = Tables(s, d).events
    // the NTZ→TZ hop is an identity under the UTC session but makes the
    // epoch cast legal for both TIMESTAMP and TIMESTAMP_NTZ sources
    val epochS = col("ts").cast("timestamp").cast("long")
    val windows = ev.filter(pmod(col("event_id"), lit(100)) === 0)
      .select(col("event_id").as("w_id"),
        epochS.as("lo"), (epochS + 3600L).as("hi"))
    val points = ev.select(epochS.as("p"))
    graft.operators.Partitioning.rangeJoinBucketed(
        windows, points, "lo", "hi", "p", bucketWidth = 3600.0)
      .groupBy("w_id").agg(count(lit(1)).as("n"))
      .orderBy("w_id")
  }

  /** Q11 cross join (tiny × tiny). */
  def q11(s: SparkSession, d: String): DataFrame = {
    val t = Tables(s, d)
    val r1 = t.region.select(col("r_name").as("r_name_1"))
    val r2 = t.region.select(col("r_name").as("r_name_2"))
    r1.crossJoin(r2).orderBy("r_name_1", "r_name_2")
  }

  // ----------------------------------------------------------- aggregates
  /** Q12 hash agg (TPC-H Q1 shape): partial agg map-side, 2 group cols. */
  def q12(s: SparkSession, d: String): DataFrame =
    Tables(s, d).lineitem
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), r4(sum(col("l_quantity"))).as("sq"),
        r4(avg(col("l_extendedprice"))).as("ap"),
        r4(min(col("l_discount"))).as("md"), r4(max(col("l_tax"))).as("mt"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q13 distinct agg. */
  def q13(s: SparkSession, d: String): DataFrame =
    Tables(s, d).orders
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("u"))
      .orderBy("o_orderpriority")

  /** Q14 approx distinct (HLL) — BENCH-only, ±5% vs exact. */
  def q14(s: SparkSession, d: String): DataFrame =
    Tables(s, d).lineitem.agg(approx_count_distinct(col("l_partkey")).as("ad"))

  /** Q15 rollup with NULL group markers folded to 'ALL'. */
  def q15(s: SparkSession, d: String): DataFrame =
    Tables(s, d).lineitem
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("f"),
        coalesce(col("l_linestatus"), lit("ALL")).as("s"), col("n"))
      .orderBy("f", "s")

  // -------------------------------------------------------------- windows
  /** Q16 ranking window + top-5 per group (QUALIFY desugared). */
  def q16(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(r4(col("c_acctbal")).desc, col("c_custkey"))
    Tables(s, d).customer
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= 5)
      .select("c_mktsegment", "c_custkey", "rn")
      .orderBy("c_mktsegment", "rn")
  }

  /** Q17 lag (font-status feature C9 analog). */
  def q17(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    Tables(s, d).lineitem.filter(col("l_orderkey") <= 100)
      .withColumn("dq", col("l_quantity") - lag(col("l_quantity"), 1, 0).over(w))
      .select(col("l_orderkey"), col("l_linenumber").cast("bigint").as("l_linenumber"), col("dq"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Q18 running-sum frame (BIO span-id D4 analog). */
  def q18(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, d).lineitem.filter(col("l_orderkey") <= 100)
      .withColumn("rs", r4(sum(col("l_quantity")).over(w)))
      .select(col("l_orderkey"), col("l_linenumber").cast("bigint").as("l_linenumber"), col("rs"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Q19 ntile (linear-scaled position feature C13 analog). */
  def q19(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy(r4(col("c_acctbal")), col("c_custkey"))
    Tables(s, d).customer
      .withColumn("decile", ntile(10).over(w).cast("bigint"))
      .select("c_custkey", "decile")
      .orderBy("c_custkey")
  }

  /** Q20 global top-k → TakeOrderedAndProject (no full sort at scale). */
  def q20(s: SparkSession, d: String): DataFrame =
    Tables(s, d).orders
      .select(col("o_orderkey"), r4(col("o_totalprice")).as("tp"))
      .orderBy(col("tp").desc, col("o_orderkey"))
      .limit(25)

  // -------------------------------------------------------------- set ops
  /** Q21 union distinct. */
  def q21(s: SparkSession, d: String): DataFrame = {
    val t = Tables(s, d)
    t.nation.select(col("n_nationkey").cast("bigint").as("k"))
      .union(t.region.select(col("r_regionkey").cast("bigint").as("k")))
      .distinct().orderBy("k")
  }

  /** Q22 intersect. */
  def q22(s: SparkSession, d: String): DataFrame = {
    val t = Tables(s, d)
    t.nation.select(col("n_regionkey").cast("bigint").as("k"))
      .intersect(t.region.select(col("r_regionkey").cast("bigint").as("k")))
      .orderBy("k")
  }

  /** Q23 except. */
  def q23(s: SparkSession, d: String): DataFrame = {
    val t = Tables(s, d)
    t.customer.select(col("c_custkey").as("k"))
      .except(t.orders.select(col("o_custkey").as("k")))
      .orderBy("k")
  }

  // ------------------------------------------------------------ functions
  /** Q24 string functions (feature-gen C1-C7 / key-normalization F1 analogs). */
  def q24(s: SparkSession, d: String): DataFrame =
    Tables(s, d).part.select(col("p_partkey"),
      lower(substring(col("p_name"), 1, 4)).as("a"),
      regexp_replace(col("p_name"), "[^a-z]", "").as("b"),
      length(col("p_type")).cast("bigint").as("c"),
      concat_ws("-", col("p_brand"), col("p_size").cast("string")).as("dd"))
      .orderBy("p_partkey")

  /** Q25 date/time functions. */
  def q25(s: SparkSession, d: String): DataFrame =
    Tables(s, d).orders.select(col("o_orderkey"),
      year(col("o_orderdate")).cast("bigint").as("y"),
      month(col("o_orderdate")).cast("bigint").as("m"),
      date_trunc("month", col("o_orderdate")).cast("date").as("mo"),
      datediff(lit("2026-01-01").cast("date"), col("o_orderdate").cast("date"))
        .cast("bigint").as("age"))
      .orderBy("o_orderkey")

  /** Q26 math functions. */
  def q26(s: SparkSession, d: String): DataFrame =
    Tables(s, d).lineitem.filter(col("l_orderkey") <= 100)
      .select(col("l_orderkey"), col("l_linenumber").cast("bigint").as("l_linenumber"),
        ceil(col("l_quantity")).as("cq"),
        floor(col("l_tax") * 100).as("ft"),
        r4(abs(col("l_discount") - 0.05)).as("ad"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Q27 array functions: token counting over documents (B1 analog). */
  def q27(s: SparkSession, d: String): DataFrame =
    Tables(s, d).documents
      .select(col("doc_id"), size(split(col("text"), " ")).cast("bigint").as("n_tokens"))
      .orderBy("doc_id")

  /** Q27b posexplode variant (retokenize B1 / generator analog). */
  def q27b(s: SparkSession, d: String): DataFrame =
    Tables(s, d).documents.filter(col("doc_id") <= 20)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast("bigint").as("pos"), col("tok"))
      .orderBy("doc_id", "pos")

  /** Q28 JSON access on events.props. */
  def q28(s: SparkSession, d: String): DataFrame =
    Tables(s, d).events.filter(col("event_id") <= 1000)
      .select(col("event_id"), get_json_object(col("props"), "$.k").as("k"))
      .orderBy("event_id")

  /** Q29 tumbling-hour aggregation (batch form; same result as the
    * Structured Streaming replay — see graft.streaming). Window start is
    * rendered as an ISO string so both engines hash identically. */
  def q29(s: SparkSession, d: String): DataFrame =
    Tables(s, d).events
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), r4(sum(col("value"))).as("sv"))
      .orderBy("w", "event_type")

  /** Q30 sessionization (30-min gap) — the BIO-span sessionization
    * pattern (D4): boundary flag via lag, running sum assigns session id,
    * then per-session counts. One shuffle on user_id. */
  def q30(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val runSum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, d).events
      .withColumn("new_s",
        when(col("ts") > lag(col("ts"), 1).over(byUser) + expr("INTERVAL 30 MINUTE"), 1)
          .when(lag(col("ts"), 1).over(byUser).isNull, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_s")).over(runSum))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n"))
      .orderBy("user_id", "session_id")
  }

  // -------------------------------------------------- all queries + oracles
  val queries: Map[String, Q] = Map(
    "q01_scan" -> q01, "q02_project" -> q02, "q03_filter" -> q03,
    "q04_join_inner" -> q04, "q05_join_broadcast" -> q05,
    "q06_join_left" -> q06, "q07_join_semi" -> q07, "q08_join_anti" -> q08,
    "q09_join_theta" -> q09, "q10_asof_join" -> q10, "q11_cross_join" -> q11,
    "q12_agg_hash" -> q12, "q13_agg_distinct" -> q13,
    "q14_approx_distinct" -> q14, "q15_rollup" -> q15,
    "q16_window_rank" -> q16, "q17_window_lag" -> q17,
    "q18_window_frame" -> q18, "q19_window_ntile" -> q19, "q20_topk" -> q20,
    "q21_union" -> q21, "q22_intersect" -> q22, "q23_except" -> q23,
    "q24_string_fns" -> q24, "q25_date_fns" -> q25, "q26_math_fns" -> q26,
    "q27_array_fns" -> q27, "q27b_explode" -> q27b, "q28_json_fns" -> q28,
    "q29_window_tumbling" -> q29, "q30_sessionize" -> q30,
    "q65_range_join" -> q65,
  )

  /** DuckDB-dialect oracle SQL. Same column names, same ORDER BY, same
    * rounding; integer widths normalized to BIGINT on both sides.
    * q14 is BENCH-only (approximate) — no oracle entry.
    */
  val oracleSql: Map[String, String] = Map(
    "q01_scan" ->
      "SELECT COUNT(*) AS n, CAST(SUM(l_orderkey) AS BIGINT) AS s FROM lineitem",
    "q02_project" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         ROUND(l_extendedprice * (1 - l_discount), 4) AS net
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q03_filter" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber FROM lineitem
         WHERE l_returnflag = 'R' AND l_quantity BETWEEN 10 AND 20
           AND l_linestatus IN ('F','O')
         ORDER BY l_orderkey, l_linenumber""",
    "q04_join_inner" ->
      """SELECT o_orderkey, c_name FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_totalprice > 100000 ORDER BY o_orderkey""",
    "q05_join_broadcast" ->
      """SELECT c_custkey, n_name, r_name FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         ORDER BY c_custkey""",
    "q06_join_left" ->
      """SELECT c_custkey, COALESCE(o_orderkey, -1) AS ok FROM customer
         LEFT JOIN orders ON c_custkey = o_custkey ORDER BY c_custkey, ok""",
    "q07_join_semi" ->
      """SELECT c_custkey FROM customer WHERE EXISTS
         (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
         ORDER BY c_custkey""",
    "q08_join_anti" ->
      """SELECT c_custkey FROM customer WHERE NOT EXISTS
         (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q09_join_theta" ->
      """SELECT p_partkey, s_suppkey FROM part JOIN supplier
         ON p_size = s_nationkey AND p_retailprice > s_acctbal
         WHERE p_partkey <= 200 ORDER BY p_partkey, s_suppkey""",
    "q10_asof_join" ->
      """SELECT event_id, MAX(o.od) AS last_od FROM
         (SELECT event_id, user_id, CAST(ts AS DATE) AS ed FROM events) e
         JOIN (SELECT o_custkey, CAST(o_orderdate AS DATE) AS od FROM orders) o
         ON o.o_custkey = e.user_id AND o.od <= e.ed
         GROUP BY event_id ORDER BY event_id""",
    "q11_cross_join" ->
      """SELECT r1.r_name AS r_name_1, r2.r_name AS r_name_2
         FROM region r1 CROSS JOIN region r2 ORDER BY r_name_1, r_name_2""",
    "q12_agg_hash" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         ROUND(SUM(l_quantity),4) AS sq, ROUND(AVG(l_extendedprice),4) AS ap,
         ROUND(MIN(l_discount),4) AS md, ROUND(MAX(l_tax),4) AS mt
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q13_agg_distinct" ->
      """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS u FROM orders
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q15_rollup" ->
      """SELECT COALESCE(l_returnflag,'ALL') AS f, COALESCE(l_linestatus,'ALL') AS s,
         COUNT(*) AS n FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY f, s""",
    "q16_window_rank" ->
      """SELECT c_mktsegment, c_custkey, rn FROM
         (SELECT c_mktsegment, c_custkey, CAST(ROW_NUMBER() OVER
            (PARTITION BY c_mktsegment ORDER BY ROUND(c_acctbal,4) DESC, c_custkey)
            AS BIGINT) AS rn FROM customer)
         WHERE rn <= 5 ORDER BY c_mktsegment, rn""",
    "q17_window_lag" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         l_quantity - LAG(l_quantity, 1, 0) OVER
           (PARTITION BY l_orderkey ORDER BY l_linenumber) AS dq
         FROM lineitem WHERE l_orderkey <= 100 ORDER BY l_orderkey, l_linenumber""",
    "q18_window_frame" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         ROUND(SUM(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),4) AS rs
         FROM lineitem WHERE l_orderkey <= 100 ORDER BY l_orderkey, l_linenumber""",
    "q19_window_ntile" ->
      """SELECT c_custkey, CAST(NTILE(10) OVER
           (ORDER BY ROUND(c_acctbal,4), c_custkey) AS BIGINT) AS decile
         FROM customer ORDER BY c_custkey""",
    "q20_topk" ->
      """SELECT o_orderkey, ROUND(o_totalprice,4) AS tp FROM orders
         ORDER BY tp DESC, o_orderkey LIMIT 25""",
    "q21_union" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation
         UNION SELECT CAST(r_regionkey AS BIGINT) FROM region ORDER BY k""",
    "q22_intersect" ->
      """SELECT CAST(n_regionkey AS BIGINT) AS k FROM nation
         INTERSECT SELECT CAST(r_regionkey AS BIGINT) FROM region ORDER BY k""",
    "q23_except" ->
      """SELECT c_custkey AS k FROM customer
         EXCEPT SELECT o_custkey FROM orders ORDER BY k""",
    "q24_string_fns" ->
      """SELECT p_partkey, LOWER(SUBSTRING(p_name,1,4)) AS a,
         REGEXP_REPLACE(p_name,'[^a-z]','','g') AS b,
         CAST(LENGTH(p_type) AS BIGINT) AS c,
         CONCAT_WS('-', p_brand, CAST(p_size AS VARCHAR)) AS dd
         FROM part ORDER BY p_partkey""",
    "q25_date_fns" ->
      """SELECT o_orderkey, CAST(YEAR(o_orderdate) AS BIGINT) AS y,
         CAST(MONTH(o_orderdate) AS BIGINT) AS m,
         CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS mo,
         CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2026-01-01') AS BIGINT) AS age
         FROM orders ORDER BY o_orderkey""",
    "q26_math_fns" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         CAST(CEIL(l_quantity) AS BIGINT) AS cq, CAST(FLOOR(l_tax*100) AS BIGINT) AS ft,
         ROUND(ABS(l_discount - 0.05), 4) AS ad
         FROM lineitem WHERE l_orderkey <= 100 ORDER BY l_orderkey, l_linenumber""",
    "q27_array_fns" ->
      """SELECT doc_id, CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
         FROM documents ORDER BY doc_id""",
    "q27b_explode" ->
      """SELECT doc_id,
         CAST(UNNEST(GENERATE_SERIES(1, LEN(STRING_SPLIT(text, ' ')))) - 1 AS BIGINT) AS pos,
         UNNEST(STRING_SPLIT(text, ' ')) AS tok
         FROM documents WHERE doc_id <= 20 ORDER BY doc_id, pos""",
    "q28_json_fns" ->
      """SELECT event_id, props->>'k' AS k FROM events
         WHERE event_id <= 1000 ORDER BY event_id""",
    "q29_window_tumbling" ->
      """SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS w, event_type,
         COUNT(*) AS n, ROUND(SUM(value),4) AS sv
         FROM events GROUP BY 1, 2 ORDER BY w, event_type""",
    "q30_sessionize" ->
      """SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n FROM
         (SELECT user_id, SUM(new_s) OVER
            (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
          FROM (SELECT user_id, ts, event_id,
                CASE WHEN ts > LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          + INTERVAL 30 MINUTE
                     OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_s FROM events))
         GROUP BY user_id, session_id ORDER BY user_id, session_id""",
    "q65_range_join" ->
      """WITH w AS (SELECT event_id AS w_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS lo
              FROM events WHERE event_id % 100 = 0),
         p AS (SELECT CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS pt FROM events)
         SELECT w_id, COUNT(*) AS n FROM w JOIN p
           ON p.pt >= w.lo AND p.pt <= w.lo + 3600
         GROUP BY w_id ORDER BY w_id""",
  ).map { case (k, v) => k -> v.stripMargin.replaceAll("\\s+", " ").trim }
}
