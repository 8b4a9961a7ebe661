package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

/** JSONL corpus interchange — the de-facto training-data format
  * (one JSON object per line; the shape Dolma/FineWeb/RedPajama-style
  * releases and every tokenizer pipeline consume). The reader lands
  * lines in the engine's `documents` schema so the whole operator
  * surface (dedup, curation, mixture, sharding) runs on an external
  * corpus unchanged; the writer exports any documents-shaped frame
  * back out, optionally sharded by the q76 token-budget column.
  *
  * Scale shape: Spark's JSON source is splittable per line, so a
  * directory of .jsonl(.gz per-file) shards scans in parallel with
  * column pruning into the declared schema (no schema inference pass
  * over 100 TB — inference is O(corpus) and type-unstable across
  * shards). Corrupt lines follow the ALTO permissive convention:
  * quarantined to a side table, never a job failure at file 97k of
  * 100k.
  */
object JsonlCorpus {

  /** The engine's documents schema; extra JSON fields are ignored by
    * the explicit schema (no inference). */
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    // the raw line rides along for quarantine extraction; pruned away
    // by any consumer that does not select it
    StructField("_corrupt_record", StringType)))

  /** Read a JSONL corpus directory into the documents shape.
    * Malformed lines yield null fields plus the raw line in
    * `_corrupt_record` (PERMISSIVE mode); [[quarantine]] exposes them,
    * and the main frame drops them. Documents without an explicit
    * `doc_id` get a stable content-derived id (xxhash64 of the line),
    * so re-reads are deterministic. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.schema(Schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
    raw.filter(col("_corrupt_record").isNull && col("text").isNotNull)
      .select(
        coalesce(col("doc_id"),
          pmod(xxhash64(col("text")), lit(Long.MaxValue))).as("doc_id"),
        col("text"),
        col("lang"),
        col("source"),
        length(col("text")).cast("long").as("n_chars"))
  }

  /** Malformed/unusable lines of a JSONL read: (line, reason). */
  def quarantine(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.schema(Schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
    raw.filter(col("_corrupt_record").isNotNull || col("text").isNull)
      .select(
        coalesce(col("_corrupt_record"), to_json(struct(col("doc_id"),
          col("text"), col("lang"), col("source")))).as("line"),
        when(col("_corrupt_record").isNotNull, "malformed_json")
          .otherwise("missing_text").as("reason"))
  }

  /** Write a documents-shaped frame as a JSONL shard directory. With
    * `shardCol` set (e.g. the q76 token-budget shard id) each shard
    * becomes its own output partition — the layout a training job
    * reads one shard at a time; without it the writer keeps the
    * frame's partitioning. Only the canonical columns are emitted, in
    * stable order, so byte-level diffs between exports are
    * meaningful. */
  def write(docs: DataFrame, path: String,
      shardCol: Option[String] = None): Unit = {
    val cols = Seq("doc_id", "text", "lang", "source")
      .filter(docs.columns.contains)
    val out = docs.select(cols.map(col): _*)
    shardCol match {
      case Some(c) =>
        docs.select((cols :+ c).distinct.map(col): _*)
          .repartition(col(c))
          .write.mode("overwrite").partitionBy(c).json(path)
      case None => out.write.mode("overwrite").json(path)
    }
  }
}
