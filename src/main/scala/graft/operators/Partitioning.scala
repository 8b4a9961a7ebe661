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

  /** Salted equi-join for skewed probe keys — the join-side
    * counterpart of [[saltedCount]], and the shape that saves a 100 TB
    * job when ONE hot key (a bot user, a null-ish default id) would
    * otherwise send its whole partition to a single reducer: the big
    * side spreads each hot key's rows over `saltBuckets` sub-keys with
    * the deterministic row salt, the (small) build side replicates its
    * matching rows once per salt, and the join runs on
    * `(key, salt)` — non-hot keys keep salt 0 and pay nothing. The
    * result is row-identical to the plain join (each big row meets
    * exactly the one build replica carrying its salt).
    *
    * Complementary to AQE's runtime skew split: AQE splits oversized
    * PARTITIONS after the shuffle files exist; salting splits the KEY
    * before the exchange, which also covers aggregation-after-join
    * pipelines AQE skew handling does not reach. `hotKeys` is
    * typically the bounded output of [[Profiling.skewReport]] (top-k
    * keys with their skew factor = the `saltBuckets` a mitigation
    * needs) — a handful of literals, never a corpus-sized list.
    *
    * Join types: inner and left(-outer) only — row-identity holds
    * because every BIG row meets exactly the one dim replica carrying
    * its salt. For right/full outer joins the replicated dim side
    * breaks it (an unmatched hot dim key would surface once per
    * replica), so those are rejected rather than silently wrong; flip
    * the sides and use "left".
    */
  def saltedJoin(big: DataFrame, dim: DataFrame, bigKey: String,
      dimKey: String, hotKeys: Seq[Long], saltBuckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    require(Set("inner", "left", "leftouter", "left_outer")
        .contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left joins only, got '$joinType': the " +
        "salt-replicated dim side would emit one null-extended row per " +
        "replica for an unmatched hot dim key under right/full joins")
    // no hot keys → the plain join, zero overhead: salting an unskewed
    // join only pays the replication machinery (the q108 report is the
    // gate — salt exactly what it flags)
    if (hotKeys.isEmpty)
      return big.join(dim, big(bigKey) === dim(dimKey), joinType)
    val hotBig = col(bigKey).isin(hotKeys: _*)
    val hotDim = col(dimKey).isin(hotKeys: _*)
    val bigS = big.withColumn("_salt",
      when(hotBig, deterministicSalt(big, saltBuckets)).otherwise(lit(0L)))
    val dimS = dim.withColumn("_salt", explode(
      when(hotDim, sequence(lit(0L), lit(saltBuckets.toLong - 1L)))
        .otherwise(array(lit(0L)))))
    bigS.join(dimS,
        bigS(bigKey) === dimS(dimKey) && bigS("_salt") === dimS("_salt"),
        joinType)
      .drop("_salt")
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
