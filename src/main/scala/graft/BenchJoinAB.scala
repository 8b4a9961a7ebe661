package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness for the q06 left-join build-side decision
  * (BASELINE.md §7): shuffle-hash on natural keys vs broadcasting the
  * non-preserved (orders) side, at two scales. The broadcast side is
  * the one that scales WITH the fact table, so the point of the
  * measurement is where the broadcast stops paying — turning the
  * "shuffle is the right call at scale" argument into numbers.
  *
  * Run: SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.BenchJoinAB"
  */
object BenchJoinAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata-sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-join-ab")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def q06Shuffle() = {
      val t = Tables(spark, sfDir)
      t.customer.join(t.orders, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), coalesce(col("o_orderkey"), lit(-1L)).as("ok"))
        .orderBy("c_custkey", "ok")
    }
    def q06Broadcast() = {
      val t = Tables(spark, sfDir)
      t.customer.join(
          broadcast(t.orders.select(col("o_custkey"), col("o_orderkey"))),
          col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), coalesce(col("o_orderkey"), lit(-1L)).as("ok"))
        .orderBy("c_custkey", "ok")
    }

    def time(mk: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def median(mk: () => org.apache.spark.sql.DataFrame, reps: Int = 5): Double = {
      time(mk) // warm
      val ts = (1 to reps).map(_ => time(mk)).sorted
      ts(ts.length / 2)
    }

    val sh = median(() => q06Shuffle())
    val bc = try median(() => q06Broadcast()) catch {
      case e: Throwable =>
        System.err.println(s"[ab] broadcast variant failed: ${e.getMessage}")
        -1.0
    }
    println(f"""{"sf":"$sfDir","shuffle_sec":$sh%.3f,"broadcast_sec":$bc%.3f}""")
    spark.stop()
  }
}
