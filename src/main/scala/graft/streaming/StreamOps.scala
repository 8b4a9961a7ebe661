package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §2.B Q29/Q30 + the streaming
  * note: the reference is strictly request/batch, so streaming is an
  * additive ingestion wrapper, verified by batch-vs-replay equivalence
  * rather than an oracle hash).
  *
  * The aggregations are defined ONCE over a DataFrame and run in both
  * execution modes — handed a batch frame they produce the Q29/Q30
  * batch answer; handed a `readStream` frame they become incremental
  * stateful operators with watermark-bounded state. That equivalence is
  * what `StreamingSpec` asserts.
  */
object StreamOps {

  /** events schema for the file-stream source (ts read as ns longs —
    * see Tables.events). */
  val eventsNsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  def normalizeTs(events: DataFrame): DataFrame =
    events.withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Q29 tumbling-hour aggregation; watermark bounds state in streaming
    * mode and is a no-op in batch. */
  def tumblingHourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w"),
        col("event_type"), col("n"), col("sv"))

  /** Q56 sliding-window aggregation (1 h window every 30 min): each
    * event contributes to two windows; same watermark-bounded state as
    * the tumbling form. */
  def slidingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w"),
        col("event_type"), col("n"), col("sv"))

  /** Q30 sessionization via the native session-window operator (30-min
    * gap — merges exactly the event chains the lag-based batch
    * formulation links). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n"))

  /** Streaming ALTO ingestion — the document pipeline's front (A2/B1)
    * as an incremental stage: a whole-file text stream StAX-parsed by
    * the SAME stateless `AltoReader.tokens` flatMap the batch path
    * uses, so new documents landing in a directory flow straight into
    * the token table (downstream per-doc stages chain as
    * `foreachBatch` or further stream transforms). `doc_id` is the
    * file-path hash, exactly like the batch `binaryFile` reader —
    * map-side, shuffle-free.
    */
  def streamingAltoTokens(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val files = spark.readStream.format("text")
      .option("wholetext", "true")
      .load(path)
      .select(xxhash64(col("_metadata.file_path")).as("doc_id"), col("value"))
      .as[(Long, String)]
    graft.sources.AltoReader.tokens(files).toDF()
  }

  /** Streaming exact deduplication — the q31 training-data operator as
    * an incremental stage: `dropDuplicates` on the content hash keeps
    * one state row per distinct hash and emits only each hash's FIRST
    * arrival (first-seen-wins, the streaming analog of the batch
    * keep-min-id rule under chronological replay). The watermark bounds
    * state for bounded-disorder streams via
    * `dropDuplicatesWithinWatermark`; `watermark = None` keeps exact
    * all-time dedup state (one 16-byte digest per distinct document —
    * the go-to shape for a training-data ingest firehose).
    *
    * @param docs (doc_id, ts, text) — any extra columns pass through
    */
  def dedupedDocs(docs: DataFrame, watermark: Option[String] = None): DataFrame = {
    val hashed = docs.withColumn("h", md5(col("text")))
    watermark match {
      case Some(w) =>
        hashed.withWatermark("ts", w).dropDuplicatesWithinWatermark("h")
      case None => hashed.dropDuplicates("h")
    }
  }

  /** Custom stateful sessionization via flatMapGroupsWithState (the
    * D4/BIO-span pattern as an incremental operator;
    * `KeyValueGroupedDataset` custom state per SURVEY.md §2 streaming
    * mapping). Emits (user_id, session_start_epoch_s, n) per closed or
    * updated session.
    */
  final case class SessionState(startEpochS: Long, lastEpochS: Long, n: Long)
  final case class SessionOut(user_id: Long, session_start: Long, n: Long)

  def statefulSessionCounts(spark: SparkSession, events: DataFrame,
      gapSeconds: Long = 1800L): Dataset[SessionOut] = {
    import spark.implicits._
    events.select(col("user_id"), col("ts").cast("long").as("epoch_s"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Long)], state: GroupState[List[SessionState]]) =>
          // sort within group: batch delivers all rows at once; streaming
          // micro-batches deliver increments (state carries open sessions,
          // newest first — continuation always checks the newest)
          val sorted = rows.map(_._2).toSeq.sorted
          var sessions = state.getOption.getOrElse(Nil)
          sorted.foreach { t =>
            sessions match {
              case head :: tail if t <= head.lastEpochS + gapSeconds =>
                sessions = head.copy(
                  lastEpochS = math.max(head.lastEpochS, t),
                  n = head.n + 1) :: tail
              case _ =>
                sessions = SessionState(t, t, 1L) :: sessions
            }
          }
          state.update(sessions)
          sessions.reverse.iterator.map(s => SessionOut(userId, s.startEpochS, s.n))
      }
  }
}
