package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator surface: the relational
  * queries (SURVEY.md §2.B Q01-Q32) plus the large-scale training-data
  * operators (dedup / similarity / text analysis). Each entry with an
  * `oracleSql` counterpart is hash-checked against DuckDB by the driver;
  * entries without one get a rows-only check (approximate or
  * non-SQL-expressible ops).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape: scan → partial agg → final agg → sort (Q12).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q12_agg_hash")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.ScaleOps.queries ++
      graft.queries.Extended.queries ++ graft.queries.PipelineOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++ graft.queries.ScaleOps.oracleSql ++
      graft.queries.Extended.oracleSql
}
