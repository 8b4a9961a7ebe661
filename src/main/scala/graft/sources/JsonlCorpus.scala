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

  private def rawRead(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** The single-scan form: every input line classified in ONE
    * PERMISSIVE pass — good documents carry a null
    * `quarantine_reason`; malformed/unusable lines carry the reason
    * plus the raw line in `quarantine_line`. [[read]]/[[quarantine]]
    * are filters over this shape; a pipeline that needs BOTH sides
    * (ingest + dead-letter export) should consume this frame so the
    * corpus is read once, not once per side. */
  def readAll(spark: SparkSession, path: String): DataFrame =
    rawRead(spark, path).select(
      coalesce(col("doc_id"),
        pmod(xxhash64(col("text")), lit(Long.MaxValue))).as("doc_id"),
      col("text"),
      col("lang"),
      col("source"),
      length(col("text")).cast("long").as("n_chars"),
      when(col("_corrupt_record").isNotNull, "malformed_json")
        .when(col("text").isNull, "missing_text").as("quarantine_reason"),
      coalesce(col("_corrupt_record"), to_json(struct(col("doc_id"),
        col("text"), col("lang"), col("source")))).as("quarantine_line"))

  /** Read a JSONL corpus directory into the documents shape.
    * Malformed lines yield null fields plus the raw line in
    * `_corrupt_record` (PERMISSIVE mode); [[quarantine]] exposes them,
    * and the main frame drops them. Documents without an explicit
    * `doc_id` get a stable content-derived id (xxhash64 of the line),
    * so re-reads are deterministic — but content-hash ids are NOT
    * monotone: before folding such a corpus through
    * [[graft.operators.Curation.incrementalFunnel]] (whose keeper
    * election assumes append-only ids), renumber deliveries with
    * [[graft.operators.Curation.assignMonotoneIds]]. */
  def read(spark: SparkSession, path: String): DataFrame =
    readAll(spark, path).filter(col("quarantine_reason").isNull)
      .drop("quarantine_reason", "quarantine_line")

  /** Malformed/unusable lines of a JSONL read: (line, reason). */
  def quarantine(spark: SparkSession, path: String): DataFrame =
    readAll(spark, path).filter(col("quarantine_reason").isNotNull)
      .select(col("quarantine_line").as("line"),
        col("quarantine_reason").as("reason"))

  /** Streaming JSONL ingestion — the same documents shape as [[read]],
    * fed incrementally as new shards land in the directory (the
    * landing-zone pattern: a crawler/exporter drops `.jsonl(.gz)`
    * shards, downstream curation folds them as micro-batches via
    * `foreachBatch` — e.g. straight into
    * [[graft.streaming.StreamOps.streamingCurationFunnel]]). The
    * explicit schema keeps the no-inference contract; quarantine rows
    * are DROPPED here (a stream can't fork cheaply — land the raw
    * shards and run [[quarantine]] batch-side for the dead-letter
    * audit). */
  def readStream(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.readStream.schema(Schema)
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

  /** Write a documents-shaped frame as a JSONL shard directory. With
    * `shardCol` set (e.g. the q76 token-budget shard id) each shard
    * becomes its own output partition — the layout a training job
    * reads one shard at a time; without it the writer keeps the
    * frame's partitioning. Only the canonical columns are emitted, in
    * stable order, so byte-level diffs between exports are
    * meaningful. */
  def write(docs: DataFrame, path: String,
      shardCol: Option[String] = None,
      compression: Option[String] = None): Unit = {
    val cols = Seq("doc_id", "text", "lang", "source")
      .filter(docs.columns.contains)
    def writer(df: DataFrame) = compression
      .foldLeft(df.write.mode("overwrite"))((w, c) => w.option("compression", c))
    shardCol match {
      case Some(c) =>
        writer(docs.select((cols :+ c).distinct.map(col): _*)
          .repartition(col(c)))
          .partitionBy(c).json(path)
      case None =>
        writer(docs.select(cols.map(col): _*)).json(path)
    }
  }
}
