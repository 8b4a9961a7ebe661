package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Partitioning utilities for the 100 TB regime: bucketed co-located
  * joins (no exchange on either side of repeated fact joins) and salted
  * two-phase aggregation for skewed keys (complementing AQE's runtime
  * skew-join splitting, which only covers joins).
  */
object Partitioning {

  /** Write a table bucketed by the join key. Downstream equi-joins /
    * aggregations on `keys` read it exchange-free (the classic setup
    * for a fact table joined every run on the same key).
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Deterministic per-row salt: xxhash64 over every column of the row.
    * Stable across task retries (a `spark_partition_id`-derived salt can
    * re-bucket rows after a retry, re-counting partial aggregates);
    * identical rows share a bucket, which is harmless for count/sum and
    * keeps the assignment a pure function of the data.
    */
  private[graft] def deterministicSalt(df: DataFrame, saltBuckets: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(saltBuckets.toLong))

  /** Two-phase salted aggregation: counts/sums per (key, salt) first —
    * spreading a hot key over `saltBuckets` reducers — then the tiny
    * per-key recombination. Exact for any commutative monoid supplied
    * as (partial, merge) aggregate pairs keyed by output column.
    *
    * Example: `saltedAgg(df, Seq("k"), 16, Map("n" -> (count(lit(1)), sum _)))`
    */
  def saltedCount(df: DataFrame, keys: Seq[String], saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("_salt", deterministicSalt(df, saltBuckets))
    salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_partial_n"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial_n")).as("n"))
  }

  /** Bucketized interval/point range join: `left` carries numeric
    * interval columns [loCol, hiCol], `right` a numeric point column;
    * result = inner join on `lo <= point <= hi`.
    *
    * Without this, Spark plans a non-equi join as
    * BroadcastNestedLoopJoin — O(|L|·|R|) comparisons, the classic
    * 100 TB cliff. Bucketization makes it an EQUI join: every interval
    * explodes to the buckets it overlaps, every point maps to its one
    * bucket, the join key is the bucket id, and the exact predicate
    * filters inside matched buckets. Each (interval, point) pair meets
    * in exactly one bucket (the point's), so no dedup is needed. Work
    * scales with `|L|·(span/bucketWidth) + |R| + |matches|` — pick
    * `bucketWidth` ≈ the typical interval span so intervals explode to
    * ~2 buckets. Skewed hot buckets are AQE skew-join territory, same
    * as any equi join.
    */
  def rangeJoinBucketed(left: DataFrame, right: DataFrame,
      loCol: String, hiCol: String, pointCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val lb = left.withColumn("_rb",
      explode(sequence(floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val rb = right.withColumn("_rb",
      floor(col(pointCol) / bucketWidth).cast("long"))
    lb.join(rb, Seq("_rb"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_rb")
  }

  /** Salted sum over a numeric column (same two-phase shape). */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
      saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("_salt", deterministicSalt(df, saltBuckets))
    salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_partial_s"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial_s")).as("s"))
  }
}
