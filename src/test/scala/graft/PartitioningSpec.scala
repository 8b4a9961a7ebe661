package graft

import org.apache.spark.sql.functions._

import graft.operators.Partitioning

class PartitioningSpec extends SparkSuite {

  test("bucketed tables join without an exchange") {
    // tables land in the default ./spark-warehouse (warehouse dir is a
    // static conf); dropped + gitignored after
    val t = Tables(spark, sf("0.001"))
    Partitioning.writeBucketed(t.orders, "orders_b", 8, Seq("o_custkey"))
    Partitioning.writeBucketed(
      t.customer.withColumnRenamed("c_custkey", "o_custkey"), "customer_b", 8,
      Seq("o_custkey"))
    try {
      val joined = spark.table("orders_b").join(spark.table("customer_b"), "o_custkey")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = try joined.queryExecution.executedPlan.toString
        finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // result correctness vs plain join
      val expected = t.orders.join(
        t.customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("salted aggregation is exact") {
    val t = Tables(spark, sf("0.001"))
    val plain = t.lineitem.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Partitioning.saltedCount(t.lineitem, Seq("l_returnflag"), 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)

    val plainSum = t.lineitem.groupBy("l_returnflag")
      .agg(sum("l_quantity")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val saltedSum = Partitioning.saltedSum(t.lineitem, Seq("l_returnflag"), "l_quantity", 16)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(saltedSum.keySet == plainSum.keySet &&
      saltedSum.forall { case (k, v) => math.abs(v - plainSum(k)) < 1e-6 })
  }

  test("rangeJoinBucketed equals naive non-equi join, without the nested loop") {
    import spark.implicits._
    val intervals = Seq(
      (1L, 0.0, 10.0), (2L, 5.0, 14.9), (3L, 100.0, 130.0), (4L, 7.0, 7.0))
      .toDF("w_id", "lo", "hi")
    val points = Seq(0.0, 5.0, 7.0, 10.0, 14.9, 15.0, 99.9, 100.0, 130.0, 131.0)
      .toDF("p")
    val bucketed = Partitioning.rangeJoinBucketed(
        intervals, points, "lo", "hi", "p", bucketWidth = 10.0)
      .select("w_id", "p")
    val naive = intervals.crossJoin(points)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select("w_id", "p")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(rows(bucketed) == rows(naive))
    // interval 2 spans buckets 0 and 1; point 5.0 must appear ONCE for it
    assert(rows(bucketed).count(_ == (2L, 5.0)) == 1)
    // the plan is an equi hash join on the bucket id, not a nested loop
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }

  test("salt assignment is a pure function of the row (retry-stable)") {
    // spark_partition_id/monotonically_increasing_id-derived salts can
    // re-bucket rows after a task retry or a repartition; the xxhash64
    // row salt must not depend on physical layout.
    val t = Tables(spark, sf("0.001"))
    def saltOf(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
      df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("row"),
          Partitioning.deterministicSalt(df, 16).as("salt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq.sorted
    val base = t.lineitem
    assert(saltOf(base) == saltOf(base.repartition(7)))
  }

  test("saltedJoin is row-identical to the plain join on a skewed fixture") {
    import spark.implicits._
    // one hot key (1000 rows on key 7) + a long uniform tail
    val big = ((1 to 1000).map(i => (7L, s"e$i")) ++
      (1 to 50).map(i => (i.toLong + 100L, s"t$i"))).toDF("k", "payload")
    val dim = ((7L, "hot") +: (1 to 50).map(i => (i.toLong + 100L, s"d$i")))
      .toDF("k2", "name")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("k", "payload", "name").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    val plain = big.join(dim, col("k") === col("k2"))
    for (buckets <- Seq(1, 4, 16)) {
      val salted = Partitioning.saltedJoin(big, dim, "k", "k2",
        hotKeys = Seq(7L), saltBuckets = buckets)
      assert(rows(salted) == rows(plain), s"buckets=$buckets")
    }
    // left join: unmatched big rows survive exactly once too
    val bigPlus = big.union(Seq((999L, "orphan")).toDF("k", "payload"))
    val saltedLeft = Partitioning.saltedJoin(bigPlus, dim, "k", "k2",
      hotKeys = Seq(7L), saltBuckets = 8, joinType = "left")
    assert(saltedLeft.count() == plain.count() + 1)
    // hot-key build rows really replicate across salts (the mechanism)
    val dimS = dim.withColumn("_salt", explode(
      when(col("k2").isin(7L), sequence(lit(0L), lit(7L)))
        .otherwise(array(lit(0L)))))
    assert(dimS.filter(col("k2") === 7L).count() == 8)
    // right/full outer joins are rejected, not silently wrong: an
    // unmatched hot dim key would surface once per salt replica
    for (jt <- Seq("right", "rightouter", "full", "full_outer", "outer")) {
      val e = intercept[IllegalArgumentException] {
        Partitioning.saltedJoin(big, dim, "k", "k2",
          hotKeys = Seq(7L), saltBuckets = 8, joinType = jt)
      }
      assert(e.getMessage.contains("inner/left"), s"$jt: ${e.getMessage}")
    }
  }
}
