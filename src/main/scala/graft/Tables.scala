package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver's synthetic tables (TESTDATA.md / FIXTURES.md §6).
  *
  * One parquet file per table under `dir`. All loads are plain
  * `spark.read.parquet` so Catalyst's parquet source handles predicate
  * pushdown / column pruning; nothing is cached here — callers decide.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS); Spark has no nanosecond
    * timestamp type, so it is read as nanos-since-epoch LongType (via
    * `spark.sql.legacy.parquet.nanosAsLong`) and truncated to
    * microsecond TimestampType here (values are µs-precision anyway —
    * see TESTDATA.md). If a future Spark reads NANOS natively as a
    * timestamp type, the schema match keeps this a no-op.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
}
