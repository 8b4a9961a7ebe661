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

  /** Event-time watermarks require TIMESTAMP; parquet written without a
    * timezone reads back as TIMESTAMP_NTZ, which `withWatermark`
    * rejects. Conditionally cast so a TIMESTAMP input keeps its exact
    * original plan and an NTZ input converts in the session timezone
    * BEFORE the watermark is attached (a cast after would strip the
    * event-time marker). */
  private def tsAsTimestamp(df: DataFrame, c: String): DataFrame =
    if (df.schema(c).dataType == TimestampNTZType)
      df.withColumn(c, col(c).cast("timestamp"))
    else df

  /** Q29 tumbling-hour aggregation; watermark bounds state in streaming
    * mode and is a no-op in batch. */
  def tumblingHourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    tsAsTimestamp(events, "ts")
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w"),
        col("event_type"), col("n"), col("sv"))

  /** Q56 sliding-window aggregation (1 h window every 30 min): each
    * event contributes to two windows; same watermark-bounded state as
    * the tumbling form. */
  def slidingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    tsAsTimestamp(events, "ts")
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
    tsAsTimestamp(events, "ts")
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

  /** Full-DAG streaming-vs-batch replay harness: splits a documents
    * frame into `nFiles` parquet files, replays them as a file stream
    * (one file per micro-batch), runs the COMPLETE per-document DAG
    * (ALTO synthesis → StAX parse → segmentation + model folds →
    * semantic node table) inside each `foreachBatch`, and reduces every
    * batch's node table to an order-independent fingerprint
    * `(row_count, bit_xor(xxhash64(row)))`. The same fingerprint over
    * a single batch run of the identical files is returned alongside,
    * so callers assert hash equality without ever collecting node rows
    * to the driver — the comparison costs two longs per side no matter
    * the corpus size. Parity holds because every DAG stage is
    * per-document: a micro-batch of new docs is self-contained and
    * append-mode foreachBatch composes to exactly the batch run.
    *
    * @return (nDocs, nBatches, (streamCount, streamXor),
    *         (batchCount, batchXor), streamSeconds)
    */
  def documentPipelineReplay(spark: SparkSession, documents: DataFrame,
      workDir: String, nFiles: Int): (Long, Long, (Long, Long), (Long, Long), Double) = {
    import spark.implicits._

    def nodesOf(docs: DataFrame): DataFrame = {
      val synthesized = docs.select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, t) => (id, graft.queries.PipelineOps.altoOf(id, t)) }
      graft.pipeline.Processor.documentPipeline(
        graft.sources.AltoReader.tokens(synthesized).toDF()).toDF()
    }
    def fingerprint(nodes: DataFrame): (Long, Long) = {
      val row = nodes.agg(
        count(lit(1)),
        expr("bit_xor(xxhash64(doc_id, node_id, parent_id, node_type, " +
          "coalesce(text, ''), coalesce(content_id, '')))")).collect().head
      (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
    }

    documents.select(col("doc_id"), col("text"))
      .repartition(nFiles)
      .write.mode("overwrite").parquet(workDir)

    val streamCount = new java.util.concurrent.atomic.AtomicLong()
    val streamXor = new java.util.concurrent.atomic.AtomicLong()
    val nBatches = new java.util.concurrent.atomic.AtomicLong()
    val schema = spark.read.parquet(workDir).schema
    val t0 = System.nanoTime()
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(workDir)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val (c, x) = fingerprint(nodesOf(batch.toDF()))
        streamCount.addAndGet(c)
        streamXor.updateAndGet(_ ^ x)
        nBatches.incrementAndGet()
        ()
      }
      .start()
    q.processAllAvailable(); q.stop()
    val secs = (System.nanoTime() - t0) / 1e9

    val batchDocs = spark.read.parquet(workDir)
    val batchFp = fingerprint(nodesOf(batchDocs))
    (batchDocs.count(), nBatches.get(),
      (streamCount.get(), streamXor.get()), batchFp, secs)
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
        tsAsTimestamp(hashed, "ts").withWatermark("ts", w)
          .dropDuplicatesWithinWatermark("h")
      case None => hashed.dropDuplicates("h")
    }
  }

  /** Streaming heavy-hitters index maintenance — the
    * [[graft.operators.Sampling]] accumulate/combine/estimate sketch
    * lifecycle mapped onto micro-batches: each batch is summarized into
    * per-group frequent-items deltas, folded into the stored state, and
    * the state table advanced as a new batchId-versioned directory
    * (committed = `_SUCCESS` present; superseded versions retire only
    * after the new one commits; a replayed batch whose id already
    * committed is skipped, so foreachBatch's at-least-once retries
    * cannot double-count). State stays O(groups × maxTracked) rows
    * however much text streams through; the dashboard is served from
    * state alone ([[heavyHittersIndexState]] →
    * `Sampling.heavyHittersEstimate`), never from stream history.
    */
  def streamingHeavyHittersIndex(docs: DataFrame, stateDir: String,
      groupCol: String = "source", textCol: String = "text",
      maxTracked: Int = 4096): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        graft.state.SlotStore.requireLineage(spark, stateDir,
          "streamingHeavyHittersIndex")
        val prev = latestState(spark, stateDir)
        if (!replayOrRegression(prev.map(_._1), batchId,
            "streamingHeavyHittersIndex")) {
          val delta = graft.operators.Sampling.heavyHittersAccumulate(
            batch.toDF(), groupCol, textCol, maxTracked)
          val all = prev.map(p => spark.read.parquet(p._2).unionByName(delta))
            .getOrElse(delta)
          graft.operators.Sampling
            .heavyHittersCombine(all, groupCol, maxTracked)
            .write.mode("overwrite").parquet(s"$stateDir/state-$batchId")
          val dir = new org.apache.hadoop.fs.Path(stateDir)
          val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
          prev.foreach(p =>
            fs.delete(new org.apache.hadoop.fs.Path(p._2), true))
        }
        ()
      }
      .start()

  /** Streaming curation funnel — [[graft.operators.Curation
    * .incrementalFunnel]]'s delivery discipline on micro-batches: the
    * FIRST batch establishes the stored survivor corpus and frozen
    * quality bounds (`initialFunnelState`), every later batch folds
    * through blocklist → frozen-bounds quality → digest-anti exact
    * dedup → within+cross near dedup → decontamination against the
    * stored state, writing the new state as a batchId-versioned
    * directory (committed = `bounds/_SUCCESS`, written last; replayed
    * batch ids skip — the at-least-once foreachBatch rule) and the
    * per-stage delta report as `report-<batchId>`. Each batch's
    * ephemeral caches are released with a registry scope mark, so a
    * long-running stream's executor storage stays flat without
    * touching frames other in-flight work holds.
    *
    * State I/O is APPEND-ONLY: each version directory holds only the
    * batch's survivor DELTA plus a manifest referencing the live delta
    * dirs of earlier versions — per-batch write cost is O(delta), not
    * O(corpus) (a full-survivor rewrite per micro-batch rewrites
    * 100 TB a day against a 100 TB corpus). Superseded versions are
    * therefore KEPT (their deltas stay referenced); once a manifest
    * would reference `compactEvery` deltas, the union is folded into
    * one snapshot delta and every older version — now unreferenced —
    * retires. Total disk stays O(corpus + last compaction window's
    * deltas).
    */
  def streamingCurationFunnel(docs: DataFrame, stateDir: String,
      benchmark: DataFrame, patterns: Seq[String],
      compactEvery: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(compactEvery >= 2, "compactEvery must be >= 2")
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        curationFoldBatch(batch.toDF(), batchId, stateDir, benchmark,
          patterns, compactEvery, "streamingCurationFunnel")
        ()
      }
      .start()
  }

  /** One micro-batch of the versioned funnel fold — the shared body of
    * [[streamingCurationFunnel]] and [[streamingCrawlCuration]]
    * (identical state layout, replay gate, compaction and cache
    * scoping; the crawl form curates the batch before handing it
    * here). */
  private def curationFoldBatch(batchDf: DataFrame, batchId: Long,
      stateDir: String, benchmark: DataFrame, patterns: Seq[String],
      compactEvery: Int, what: String): Unit = {
        val batch = batchDf
        val spark = batch.sparkSession
        graft.state.SlotStore.requireLineage(spark, stateDir, what)
        val prev = latestState(spark, stateDir, marker = "bounds/_SUCCESS")
        // empty batches skip entirely: initialFunnelState's percentile
        // over zero rows would NPE, and an empty incremental fold would
        // write a pointless state version (file sources deliver empty
        // batch 0 at startup routinely)
        if (!replayOrRegression(prev.map(_._1), batchId, what) &&
            !batch.isEmpty) {
          val mark = graft.CacheRegistry.mark()
          val folded = prev match {
            case None =>
              graft.operators.Curation.initialFunnelState(
                batch.toDF(), benchmark, patterns)
            case Some((_, p)) =>
              val st = graft.operators.Curation.loadFunnelState(spark, p)
              val (ns, report) = graft.operators.Curation
                .incrementalFunnel(st, batch.toDF(), benchmark, patterns)
              report.coalesce(1).write.mode("overwrite")
                .parquet(s"$stateDir/report-$batchId")
              ns
          }
          val compact = folded.liveDeltas.size + 1 >= compactEvery
          val next = if (compact)
            folded.copy(newDelta = None, liveDeltas = Seq.empty)
          else folded
          graft.operators.Curation.saveFunnelState(next,
            s"$stateDir/state-$batchId")
          if (compact) {
            // the snapshot manifest references only its own delta —
            // every older version is unreferenced and retires (after
            // the new commit marker landed, so a crash here at worst
            // leaves retirable dirs for the next compaction). Older
            // per-delivery REPORTS retire with them: the cumulative
            // truth lives in the state; a pipeline that wants the full
            // audit trail copies reports out before they age past a
            // compaction window (else 1-minute batches accrete ~500k
            // small dirs a year and degrade the very listings this
            // host performs each batch)
            val dir = new org.apache.hadoop.fs.Path(stateDir)
            val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
            fs.listStatus(dir).toSeq
              .filter { s =>
                val n = s.getPath.getName
                s.isDirectory &&
                  ((n.matches("state-\\d+") &&
                    n.stripPrefix("state-").toLong < batchId) ||
                   (n.matches("report-\\d+") &&
                    n.stripPrefix("report-").toLong < batchId))
              }
              .foreach(s => fs.delete(s.getPath, true))
          }
          graft.CacheRegistry.releaseSince(spark, mark)
        }
  }

  /** Streaming crawl-to-corpus curation — the RefinedWeb end-to-end
    * shape in continuous form (the batch twin is
    * [[graft.operators.Curation.crawlCurationReport]] / q125): WARC
    * archives LAND in a directory; each micro-batch of new archives
    * parses off its bytes (row-local,
    * [[graft.sources.WarcReader.recordsFromBinary]]), extracts HTTP/
    * HTML text, merges through the PERSISTED per-domain URL keeper set
    * ([[graft.operators.Curation.urlCurationMerge]] — stored keepers ≤
    * cap·domains rows, the only corpus-derived URL state), and the
    * batch documents that ENTER the keeper set fold into the versioned
    * curation-funnel state exactly like [[streamingCurationFunnel]].
    *
    * Declared divergence (append-only corpus): a delivery document
    * out-ranking a stored keeper evicts it from the KEEPER SET (future
    * merges see the eviction), but earlier funnel survivors are not
    * retracted — the funnel state is append-only, the q105b
    * discipline. URL keeper state is batchId-versioned and idempotent
    * under foreachBatch retries: a committed `urlkeep-<batchId>` is
    * reused, an uncommitted one is rebuilt from the latest earlier
    * version.
    */
  def streamingCrawlCuration(spark: SparkSession, archiveDir: String,
      stateDir: String, benchmark: DataFrame, patterns: Seq[String],
      blockedDomains: Set[String], blockedPathPrefixes: Seq[String],
      capPerDomain: Int, compactEvery: Int = 64,
      maxFilesPerTrigger: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(compactEvery >= 2, "compactEvery must be >= 2")
    import graft.operators.Curation
    import graft.sources.WarcReader
    val binarySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val archives = spark.readStream.format("binaryFile")
      .schema(binarySchema)
      .option("pathGlobFilter", "*.warc.gz")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(archiveDir)
    archives.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val sp = batch.sparkSession
        graft.state.SlotStore.requireLineage(sp, stateDir,
          "streamingCrawlCuration")
        if (!batch.isEmpty) {
          val mark = graft.CacheRegistry.mark()
          val extracted = graft.CacheRegistry.persist(
            WarcReader.textDocuments(WarcReader.recordsFromBinary(
              batch.toDF())))
          // URL keeper merge — idempotent per slot: a committed
          // urlkeep-<batchId> (foreachBatch retry) is authoritative,
          // otherwise merge the latest EARLIER version with the batch
          val keepDir = s"$stateDir/urlkeep-$batchId"
          val prevKeep = graft.state.SlotStore
            .latest(sp, stateDir, "urlkeep")
            .filter(_._1 < batchId)
          val committed = graft.state.SlotStore
            .latest(sp, stateDir, "urlkeep").exists(_._1 == batchId)
          if (!committed) {
            val merged = prevKeep match {
              case None =>
                Curation.urlCuration(extracted, blockedDomains,
                    blockedPathPrefixes, capPerDomain)
                  .join(extracted.select(col("doc_id"), col("n_chars")),
                    Seq("doc_id"))
                  .select("doc_id", "domain", "n_chars")
              case Some((_, p)) =>
                Curation.urlCurationMerge(sp.read.parquet(p), extracted,
                    blockedDomains, blockedPathPrefixes, capPerDomain)
                  .join(
                    sp.read.parquet(p).select("doc_id", "n_chars")
                      .unionByName(
                        extracted.select("doc_id", "n_chars")),
                    Seq("doc_id"))
                  .select("doc_id", "domain", "n_chars")
            }
            merged.write.mode("overwrite").parquet(keepDir)
          }
          // batch docs that ENTERED the keeper set feed the funnel
          // (the fold itself skips an all-filtered batch)
          val kept = extracted.join(
            sp.read.parquet(keepDir).select("doc_id"),
            Seq("doc_id"), "left_semi")
          curationFoldBatch(kept, batchId, stateDir, benchmark,
            patterns, compactEvery, "streamingCrawlCuration")
          extracted.unpersist()
          graft.CacheRegistry.releaseSince(sp, mark)
        }
        ()
      }
      .start()
  }

  /** Streaming ANN index maintenance — the drift-gated append loop on
    * micro-batches, completing the funnel/index symmetry: each batch of
    * delivery vectors is judged against the PERSISTED index's frozen
    * quantizers ([[graft.operators.Similarity.ivfIndexDriftReport]] vs
    * `baseSample`, the same thresholds as `maintainIvfPqIndex`); an
    * in-distribution batch appends as the self-committing
    * `codes-delta-<batchId>` (O(delta) write, stored codes untouched),
    * a drifted batch is quarantined — raw vectors to
    * `pending-<batchId>`, the verdict to `drift-report-<batchId>` — so
    * a retrain job has both the evidence and the withheld vectors.
    * Slots are BATCH ids: a replayed batch whose slot already committed
    * skips (at-least-once foreachBatch retries are no-ops), and a torn
    * delta (no `_SUCCESS`) is ignored by load and overwritten by the
    * retry. `baseSample` should be a bounded representative sample of
    * the indexed corpus — the drift report scans it per batch.
    */
  def streamingIndexMaintenance(vectors: DataFrame, indexPath: String,
      baseSample: DataFrame, maxShareDelta: Double = 0.25,
      maxEnergyRatio: Double = 3.0, vecCol: String = "embedding",
      idCol: String = "vec_id"): org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        graft.state.SlotStore.requireLineage(spark, indexPath,
          "streamingIndexMaintenance")
        // only the LATEST batch ever replays in-lineage, so the gate is
        // the max committed slot — NOT membership: delta slots are
        // dense (retained forever), and a membership skip would treat
        // every new-lineage batch id that collides with an old slot as
        // a replay and silently drop it. QUARANTINED batches advance
        // the gate too (their slot is the drift-report dir — written
        // last, so it is the quarantine's commit marker): without them
        // a run that ended in drifted batches would let a new lineage
        // overwrite the withheld vectors (the retrain evidence) with
        // no error.
        val slots = graft.operators.Similarity
          .committedDeltaSlots(spark, indexPath) ++
          committedSlots(spark, indexPath, "drift-report")
        val done = replayOrRegression(slots.sorted.lastOption, batchId,
          "streamingIndexMaintenance")
        if (!done && !batch.isEmpty) {
          val mark = graft.CacheRegistry.mark()
          val index = graft.operators.Similarity
            .loadIvfPqIndex(spark, indexPath)
          val verdict = graft.operators.Similarity.maintainIvfPqIndex(
            index, baseSample, batch.toDF(), maxShareDelta,
            maxEnergyRatio, vecCol, idCol, deliveryNonEmpty = true)
          if (verdict.retrainReason.isEmpty)
            // reuse the batch's loaded index view — a second
            // load-per-append doubles the centroid/codebook collects
            graft.operators.Similarity.writeIndexDelta(spark, indexPath,
              index, batch.toDF(), vecCol, idCol, slot = Some(batchId))
          else {
            batch.toDF().write.mode("overwrite")
              .parquet(s"$indexPath/pending-$batchId")
            verdict.report.coalesce(1).write.mode("overwrite")
              .parquet(s"$indexPath/drift-report-$batchId")
          }
          graft.CacheRegistry.releaseSince(spark, mark)
        }
        ()
      }
      .start()

  /** Streaming shared-span removal — the q117 delivery discipline on
    * micro-batches (the sub-document sibling of [[dedupedDocs]]'
    * document-level stream dedup): each batch is cut against the
    * gram-df state accumulated from every EARLIER batch plus the
    * batch's own grams
    * ([[graft.operators.TextAnalysis.removeSharedSpansIncremental]] —
    * chronologically incremental: earlier batches' text is immutable,
    * exactly the landing-zone semantics), cleaned rows land as
    * `cleaned-<batchId>` under `outDir`, and the batch's gram dfs fold
    * into the state as the self-committing `dfs-delta-<batchId>`
    * (O(delta) write, stored deltas never rewritten). Commit order:
    * cleaned rows first, df delta (the commit marker) last — a crash
    * between the two retries the batch, whose `overwrite` of
    * `cleaned-<batchId>` is idempotent; a replayed batch whose slot
    * already committed skips entirely.
    */
  /** Shared foreachBatch scaffold of the slotted-index landing-zone
    * hosts ([[streamingSpanDedup]], [[streamingSegmentDedup]]) — the
    * part whose divergence across hosts would silently break
    * crash-safety, extracted once (the SlotStore rationale one layer
    * up): the `_LINEAGE` gate, the replay skip, the empty-batch skip
    * and the ephemeral-cache mark/release bracket. The replay gate is
    * on the MAX committed slot, not membership: only the latest batch
    * ever replays in-lineage, slots are dense until the first
    * compaction sweep, and a membership skip would treat every
    * colliding new-lineage id as a replay and silently drop its
    * cleaned output (the save guard is only the post-compaction
    * disk-level backstop). The host callback does everything that
    * differs: load state, cut the batch, write output, fold/compact. */
  private def slottedDedupHost(docs: DataFrame, stateDir: String,
      host: String,
      committedSlots: (SparkSession, String) => Seq[Long])(
      processBatch: (SparkSession, DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        graft.state.SlotStore.requireLineage(spark, stateDir, host)
        val done = replayOrRegression(
          committedSlots(spark, stateDir).sorted.lastOption, batchId, host)
        if (!done && !batch.isEmpty) {
          val mark = graft.CacheRegistry.mark()
          processBatch(spark, batch.toDF(), batchId)
          graft.CacheRegistry.releaseSince(spark, mark)
        }
        ()
      }
      .start()

  def streamingSpanDedup(docs: DataFrame, stateDir: String, outDir: String,
      n: Int = 8, minDf: Int = 2, textCol: String = "text",
      idCol: String = "doc_id", compactEvery: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(compactEvery >= 2, "compactEvery must be >= 2")
    import graft.operators.TextAnalysis
    slottedDedupHost(docs, stateDir, "streamingSpanDedup",
      TextAnalysis.committedSpanDfSlots) {
        (spark: SparkSession, batch: DataFrame, batchId: Long) =>
          val live = TextAnalysis.liveSpanDfSlots(spark, stateDir)
          val stored =
            if (live.isEmpty)
              // first delivery: cut against delivery-internal dfs only
              spark.createDataFrame(
                spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                StructType(Seq(StructField("gh", LongType),
                  StructField("df", LongType))))
            else TextAnalysis.loadSpanDfIndex(spark, stateDir)
          // the batch's gram dfs are BOTH the operator's delivery-df
          // input and the state delta — computed and persisted once
          val batchDfs = graft.CacheRegistry.persist(
            TextAnalysis.spanGramDfs(batch, n, textCol, idCol))
          TextAnalysis.removeSharedSpansIncremental(batch, stored,
              n, minDf, textCol, idCol, deliveryDfs = Some(batchDfs))
            .write.mode("overwrite").parquet(s"$outDir/cleaned-$batchId")
          if (live.size + 1 >= compactEvery) {
            // compaction batch: this slot lands as a SNAPSHOT — the full
            // aggregated union (sorted for zone-map prunes). A snapshot
            // at slot k supersedes every part with slot <= k by
            // construction, so the deletes below are housekeeping: a
            // crash between the snapshot's _SUCCESS and the deletes
            // leaves dirs that load already ignores, and the replayed
            // batch skips without double-counting
            TextAnalysis.saveSpanDfDelta(spark, stateDir,
              stored.unionByName(batchDfs)
                .groupBy("gh").agg(sum("df").as("df"))
                .sortWithinPartitions("gh"),
              slot = Some(batchId), snapshot = true)
            // sweep EVERYTHING the new snapshot superseded — including
            // orphans a crashed earlier compaction left behind (a
            // live-set-only delete would never revisit them)
            TextAnalysis.sweepSpanDfIndex(spark, stateDir)
          } else
            TextAnalysis.saveSpanDfDelta(spark, stateDir, batchDfs,
              slot = Some(batchId))
      }
  }

  /** Streaming segment-level dedup — q121b as a landing-zone host (the
    * [[streamingSpanDedup]] lifecycle for the keep-one paragraph
    * policy): each batch is cut against the segment-keeper state
    * accumulated from every EARLIER batch plus the batch's own
    * occurrences, under CHRONOLOGICAL precedence
    * (`segmentDedupIncremental(storedPrecedes = true)`): a segment an
    * earlier batch already published always wins, whatever the ids —
    * earlier cleaned outputs are immutable, so the batch operator's
    * bidirectional id-min rule would emit a second copy whenever a
    * later batch carries a smaller doc_id. Cleaned rows land as
    * `cleaned-<batchId>` under `outDir`; the batch's FIRST-SEEN
    * keepers (hashes no earlier batch published — an 8-byte anti-join)
    * commit as the self-committing `seg-delta-<batchId>`, so every
    * hash appears in exactly ONE state part and the keeper is exact
    * first-arrival provenance. Commit order: cleaned rows first,
    * keeper delta (the commit marker) last — a crash between the two
    * retries the batch, whose `overwrite` of `cleaned-<batchId>` is
    * idempotent; a replayed batch whose slot already committed skips
    * entirely. Every `compactEvery` live parts the batch lands a
    * full-merge `seg-snap` snapshot (gh-sorted) and sweeps superseded
    * dirs (parts are gh-disjoint, so the merge is a plain union).
    */
  def streamingSegmentDedup(docs: DataFrame, stateDir: String,
      outDir: String, width: Int = 16, textCol: String = "text",
      idCol: String = "doc_id", compactEvery: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(compactEvery >= 2, "compactEvery must be >= 2")
    import graft.operators.TextAnalysis
    slottedDedupHost(docs, stateDir, "streamingSegmentDedup",
      TextAnalysis.committedSegmentKeeperSlots) {
        (spark: SparkSession, batch: DataFrame, batchId: Long) =>
          val live = TextAnalysis.liveSegmentKeeperSlots(spark, stateDir)
          val stored =
            if (live.isEmpty)
              // first delivery: dedup within the batch only. The empty
              // keeper frame derives from the batch itself so the
              // id-type (long here, string/UUID elsewhere) always
              // matches — a hardcoded schema would make the struct
              // comparison cast and fail under ANSI on non-long ids
              TextAnalysis.segmentKeepers(batch.limit(0), width,
                textCol, idCol)
            else TextAnalysis.loadSegmentKeeperIndex(spark, stateDir)
          // ONE pruned read of the corpus-scale keeper index per batch
          // (VERDICT r11 #3): the broadcast delivery-hash semi-join —
          // the segmentDedupIncremental discipline; putting the index
          // on a broadcast build side would OOM the driver at 100 TB —
          // runs HERE, once, and the persisted delivery-sized result
          // feeds both the incremental cut (whose internal prune
          // becomes a no-op over an InMemory scan) and the
          // first-arrival anti-join below
          val batchKeepers = graft.CacheRegistry.persist(
            TextAnalysis.segmentKeepers(batch, width, textCol, idCol))
          val storedHits = graft.CacheRegistry.persist(
            stored.join(broadcast(batchKeepers.select("gh")), Seq("gh"),
              "left_semi"))
          TextAnalysis.segmentDedupIncremental(batch, storedHits,
              width, textCol, idCol, storedPrecedes = true)
            .write.mode("overwrite").parquet(s"$outDir/cleaned-$batchId")
          // first-arrival keepers only: hashes some earlier batch
          // already owns never re-enter the state, so parts stay
          // gh-disjoint
          val newKeepers = batchKeepers
            .join(storedHits.select("gh"), Seq("gh"), "left_anti")
          if (live.size + 1 >= compactEvery) {
            // snapshot slot: a per-hash min-MERGE, not a plain union —
            // a no-op per hash while the parts honour the gh-disjoint
            // invariant (the host's anti-join guarantees it), and a
            // deterministic self-repair if a seeded state dir ever
            // violated it (duplicate gh rows would otherwise be frozen
            // into every future snapshot). Supersedes every part with
            // slot <= batchId by construction; the sweep below is
            // housekeeping, crash-safe either side of it. The full
            // `stored` read here is inherent to compaction (it
            // rewrites the state), not a per-batch cost
            TextAnalysis.saveSegmentKeeperDelta(spark, stateDir,
              TextAnalysis.foldSegmentKeepers(stored, newKeepers)
                .sortWithinPartitions("gh"),
              slot = Some(batchId), snapshot = true)
            TextAnalysis.sweepSegmentKeeperIndex(spark, stateDir)
          } else
            TextAnalysis.saveSegmentKeeperDelta(spark, stateDir,
              newKeepers, slot = Some(batchId))
      }
  }

  /** Streaming model-based quality gate — the q122 classifier run as a
    * landing-zone host: each micro-batch scores through a real ONNX
    * graph ([[graft.pipeline.Onnx.scoreRows]] — one batched evaluation
    * per partition, weights in the closure broadcast) and lands as
    * `scored-<batchId>` under `outDir` with the input columns plus
    * `(score, pass)`.
    *
    * Governance: the MODEL IDENTITY is frozen into the state dir at
    * first batch and asserted on every later one (the
    * [[graft.operators.Dedup.requireIndexMeta]] discipline applied to
    * md5(model bytes) + feature list + threshold) — a gate restarted
    * with a different model, feature set, or cut silently re-labeling
    * the rest of the corpus is exactly the curation failure the
    * signature families' hyperplane freeze guards against. Replay is
    * idempotent: scoring is deterministic and row-local, so a
    * re-delivered batch overwrites its own `scored-<batchId>` dir
    * byte-identically (no slot machinery needed — the host keeps no
    * cross-batch state beyond the frozen meta).
    *
    * Scale shape per batch: strictly row-local — no shuffle, no state
    * scan, no broadcast beyond the task closure; per-batch cost is
    * O(delivery) with a constant independent of everything ever
    * ingested. */
  def streamingQualityGate(docs: DataFrame, modelBytes: Array[Byte],
      featureCols: Seq[String], threshold: Double, stateDir: String,
      outDir: String, idCol: String = "doc_id")
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(featureCols.nonEmpty, "featureCols must not be empty")
    val g = graft.pipeline.Onnx.parse(modelBytes)
    val modelMeta = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(modelBytes).map("%02x".format(_)).mkString
      s"onnx-md5=$md feats=${featureCols.mkString(",")} thresh=$threshold"
    }
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        graft.state.SlotStore.requireLineage(spark, stateDir,
          "streamingQualityGate")
        graft.operators.Dedup.requireIndexMeta(spark, stateDir, modelMeta,
          "quality-gate model")
        if (!batch.isEmpty) {
          val mark = graft.CacheRegistry.mark()
          // the batch feeds the scoring projection AND the join-back
          val b = graft.CacheRegistry.persist(batch.toDF())
          val scored = graft.pipeline.Onnx.scoreRows(
            b.select((idCol +: featureCols).map(col): _*), g, featureCols,
            idCol)
          b.join(scored, Seq(idCol))
            .withColumn("pass", col("score") >= threshold)
            .write.mode("overwrite").parquet(s"$outDir/scored-$batchId")
          graft.CacheRegistry.releaseSince(spark, mark)
        }
        ()
      }
      .start()
  }

  /** Streaming 64-bit-signature dedup — the landing-zone host for the
    * p17b/p18b/q37 families (image dHash, audio fingerprint, text
    * SimHash): each micro-batch of ALREADY-SIGNED rows
    * `(idCol, hashCol[, decoded])` is paired against the persisted
    * signature index accumulated from every earlier batch
    * ([[graft.operators.Dedup.hamming64PairsAcross]], the round-12
    * across form) plus itself, under CHRONOLOGICAL precedence: a
    * stored signature always beats a delivery one whatever the ids
    * (published pair lists are immutable); within one batch — where
    * there is no arrival order — the batch operator's id-min rule
    * applies. Near-dup PAIRS land as `pairs-<batchId>` under `outDir`
    * (`keeper_id, doc_id, hamming` — keeper is a stored doc or a
    * smaller-id batch doc); the batch's surviving signatures (rows
    * pairing NOTHING) commit as the `sig-delta-<batchId>` slot, so
    * the index holds exactly one signature per kept doc and doubles
    * as the across-join's star-keeper table. The decoded-flag
    * partition discipline carries through: decoded rows pair at
    * `maxHamming`, fallback content-folds only at Hamming 0; a
    * missing `decoded` column (single-space families like SimHash)
    * defaults to true.
    *
    * Scale shape per batch: the index is SCANNED (band join + star
    * probe, delivery side broadcast), never aggregated — the cap's
    * over-cap chunk list is SUMMED from the bounded per-part count
    * tables the deltas carry ([[graft.operators.Dedup
    * .loadSignatureOverCap]]; ≤ 524 288 rows whatever the corpus
    * size) — and only delivery-sized frames shuffle. The keep rule is
    * pairwise (each emitted pair drops its larger/later side), the
    * same relation the published pair list attests — a consumer
    * wanting component keepers runs q53's CC over the pair union.
    * Every `compactEvery` live parts the batch folds the index into
    * one `sig-snap` snapshot (sig-sorted for zone-map prunes) and
    * sweeps superseded dirs.
    */
  def streamingSignatureDedup(sigs: DataFrame, stateDir: String,
      outDir: String, idCol: String = "doc_id",
      hashCol: String = "sig64", maxHamming: Int = 3,
      maxBucket: Long = 100000L, compactEvery: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(compactEvery >= 2, "compactEvery must be >= 2")
    import graft.operators.Dedup
    slottedDedupHost(sigs, stateDir, "streamingSignatureDedup",
      Dedup.committedSignatureSlots) {
        (spark: SparkSession, batch0: DataFrame, batchId: Long) =>
          val batch = graft.CacheRegistry.persist(
            batch0.select(col(idCol).as("id"), col(hashCol).as("sig"),
              (if (batch0.columns.contains("decoded")) col("decoded")
               else lit(true)).as("decoded")))
          val live = Dedup.liveSignatureSlots(spark, stateDir)
          val stored =
            if (live.isEmpty) batch.limit(0)
            else Dedup.loadSignatureIndex(spark, stateDir)
          // served cap bookkeeping: summed from the bounded count
          // parts, never aggregated from the corpus-scale index
          val overCap =
            if (live.isEmpty) None
            else Some(graft.CacheRegistry.persist(
              Dedup.loadSignatureOverCap(spark, stateDir, maxBucket)))
          def flagged(dec: Boolean, mh: Int): DataFrame =
            Dedup.hamming64PairsAcross(
              stored.filter(col("decoded") === dec),
              batch.filter(col("decoded") === dec),
              "id", "sig", mh, maxBucket,
              overCapChunks = overCap.map(_
                .filter(col("decoded") === dec).select("chunk", "cval")),
              // kept signatures are unique per flag space, so the
              // index IS its own keeper table — no aggregate
              starKeepers = Some(stored.filter(col("decoded") === dec)
                .select(col("sig"), col("id").as("corpus_id"))))
          val across = flagged(dec = true, maxHamming)
            .unionByName(flagged(dec = false, 0))
            .select(col("corpus_id").as("keeper_id"),
              col("batch_id").as("doc_id"), col("hamming"))
          val within = Dedup.hamming64PairsCapped(
              batch.filter(col("decoded")), "id", "sig", maxHamming,
              maxBucket)
            .unionByName(Dedup.hamming64PairsCapped(
              batch.filter(!col("decoded")), "id", "sig", 0, maxBucket))
            .select(col("doc_id_a").as("keeper_id"),
              col("doc_id_b").as("doc_id"), col("hamming"))
          val pairs = graft.CacheRegistry.persist(
            across.unionByName(within))
          pairs.write.mode("overwrite").parquet(s"$outDir/pairs-$batchId")
          // survivors (pairing nothing) extend the index — dropped ids
          // are pair-bounded, so the anti-join build side is small
          val kept = graft.CacheRegistry.persist(
            batch.join(
              broadcast(pairs.select(col("doc_id").as("id")).distinct()),
              Seq("id"), "left_anti"))
          if (live.size + 1 >= compactEvery) {
            Dedup.saveSignatureDelta(spark, stateDir,
              stored.unionByName(kept).sortWithinPartitions("sig"),
              slot = Some(batchId), snapshot = true)
            Dedup.sweepSignatureIndex(spark, stateDir)
          } else
            Dedup.saveSignatureDelta(spark, stateDir, kept,
              slot = Some(batchId))
      }
  }

  /** Streaming embedding near-dedup — the VECTOR landing-zone host
    * (q43b's across form on micro-batches; the seventh
    * [[graft.state.SlotStore]] client): each batch of raw
    * `(idCol, vecCol)` rows is sign-LSH-projected ONCE
    * ([[graft.operators.Dedup.embeddingIndex]] — the projection is
    * both the operator input and the state delta), paired against the
    * persisted index accumulated from every earlier batch plus
    * itself, under CHRONOLOGICAL precedence (stored wins whatever the
    * ids; within one batch the id-min rule applies). Near-dup PAIRS
    * land as `pairs-<batchId>` (`keeper_id, doc_id, cos`); vectors
    * pairing NOTHING at `threshold` commit as the
    * `emb-delta-<batchId>` slot, so the index holds one row per kept
    * vector and `(xxhash64(v), id)` projected off it is the star-
    * keeper table (no per-batch aggregate — identical vectors can
    * never both be kept). The hyperplane family (nbits, seed, nBands,
    * dim) is frozen into the state dir at first write and asserted on
    * every batch ([[graft.operators.Dedup.requireEmbeddingMeta]]) — a
    * restart with different planes fails loudly.
    *
    * Scale shape per batch: the index is SCANNED (band join + star
    * probe + verify, delivery side broadcast where small), never
    * aggregated — over-cap buckets are SUMMED from the per-part count
    * tables the deltas carry — and only delivery-sized frames
    * shuffle. Zero-norm vectors pair nothing (cosine undefined, null
    * under try_divide) and enter the index as kept — they can never
    * drop or be dropped, exactly the batch operators' ANSI rule.
    * Every `compactEvery` live parts the index folds into one
    * `emb-snap` snapshot and superseded dirs are swept.
    */
  def streamingEmbeddingDedup(vecs: DataFrame, stateDir: String,
      outDir: String, vecCol: String = "embedding",
      idCol: String = "vec_id", threshold: Double = 0.95,
      nbits: Int = 8, seed: Long = 42L, nBands: Int = 1,
      dim: Int = -1, maxBucket: Long = 100000L, compactEvery: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(compactEvery >= 2, "compactEvery must be >= 2")
    import graft.operators.Dedup
    slottedDedupHost(vecs, stateDir, "streamingEmbeddingDedup",
      Dedup.committedEmbeddingSlots) {
        (spark: SparkSession, batch: DataFrame, batchId: Long) =>
          // hyperplane dimensionality: from the host param or the
          // first batch — then FROZEN into the state dir's meta so
          // every later batch provably buckets with the same planes
          val planeDim =
            if (dim > 0) dim
            else batch.select(size(col(vecCol)).as("d"))
              .filter(col("d") > 0)
              .take(1).headOption.map(_.getInt(0)).getOrElse(1)
          Dedup.requireEmbeddingMeta(spark, stateDir,
            s"nbits=$nbits seed=$seed nBands=$nBands dim=$planeDim")
          val batchIdx = graft.CacheRegistry.persist(
            Dedup.embeddingIndex(batch, vecCol, idCol, nbits, seed,
              nBands, planeDim))
          val live = Dedup.liveEmbeddingSlots(spark, stateDir)
          val stored =
            if (live.isEmpty) batchIdx.limit(0)
            else Dedup.loadEmbeddingIndex(spark, stateDir)
          val overCap =
            if (live.isEmpty) None
            else Some(graft.CacheRegistry.persist(
              Dedup.loadEmbeddingOverCap(spark, stateDir, maxBucket)))
          val across = Dedup.embeddingAcrossFromIndexes(stored, batchIdx,
              threshold, maxBucket, overCap,
              starKeepers = Some(stored.select(
                xxhash64(col("v")).as("sh"), col("id").as("corpus_id"))),
              starKey = xxhash64(_))
            .select(col("corpus_id").as("keeper_id"),
              col("batch_id").as("doc_id"), col("cos"))
          // within-batch pairs ride the same index-vs-index join with
          // the id-min orientation; the batch is delivery-sized so its
          // cap bookkeeping is computed in-query
          val within = Dedup.embeddingAcrossFromIndexes(batchIdx, batchIdx,
              threshold, maxBucket, None, None, xxhash64(_))
            .filter(col("corpus_id") < col("batch_id"))
            .select(col("corpus_id").as("keeper_id"),
              col("batch_id").as("doc_id"), col("cos"))
          val pairs = graft.CacheRegistry.persist(
            across.unionByName(within))
          pairs.write.mode("overwrite").parquet(s"$outDir/pairs-$batchId")
          val kept = graft.CacheRegistry.persist(
            batchIdx.join(
              broadcast(pairs.select(col("doc_id").as("id"))),
              Seq("id"), "left_anti"))
          if (live.size + 1 >= compactEvery) {
            Dedup.saveEmbeddingDelta(spark, stateDir,
              stored.unionByName(kept), slot = Some(batchId),
              snapshot = true)
            Dedup.sweepEmbeddingIndex(spark, stateDir)
          } else
            Dedup.saveEmbeddingDelta(spark, stateDir, kept,
              slot = Some(batchId))
      }
  }

  /** Streaming winnowing near-dup — the landing-zone host for the q44
    * MOSS-fingerprint family (the EIGHTH [[graft.state.SlotStore]]
    * client): each micro-batch of `(idCol, textCol)` rows fingerprints
    * ROW-LOCALLY ([[graft.operators.Dedup.winnowPostings]] — the
    * projection is both the operator input and the state delta) and is
    * paired against the postings index accumulated from every earlier
    * batch plus itself, under the UNION document-frequency cut
    * (stored dfs served from the per-part df tables the deltas carry,
    * key-pruned and summed — [[graft.operators.Dedup
    * .loadPostingsDfsFor]] — plus the batch's own counts) and
    * CHRONOLOGICAL precedence: a stored doc always beats a batch one
    * whatever the ids (published pair lists are immutable); within one
    * batch the id-min rule applies. FIRST-ARRIVAL ids: a redelivered
    * id is dropped before pairing (a replay of the same document is
    * not a duplicate pair, and letting it re-enter would double its
    * postings and inflate every later shared count — the segment
    * host's rule). Near-dup PAIRS land as `pairs-<batchId>` under
    * `outDir` (`keeper_id, doc_id, shared`); docs pairing NOTHING
    * commit their postings as the `post-delta-<batchId>` slot.
    *
    * Scale shape per batch: the postings index is SCANNED (key join,
    * pruned by a broadcast of the batch's under-cut fingerprints),
    * never aggregated — the df cut is this family's degenerate cap
    * (boilerplate fingerprints exceed `maxDf` at the union count and
    * never join) — and only batch-sized frames shuffle. The keep rule
    * is pairwise; a consumer wanting component keepers runs q53's CC
    * over the pair union. Every `compactEvery` live parts the index
    * folds into one fph-sorted `post-snap` snapshot and superseded
    * dirs are swept. */
  def streamingWinnowDedup(docs: DataFrame, stateDir: String,
      outDir: String, textCol: String = "text", idCol: String = "doc_id",
      k: Int = 3, w: Int = 4, maxDf: Long = 100L, minShared: Long = 3L,
      compactEvery: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(compactEvery >= 2, "compactEvery must be >= 2")
    import graft.operators.Dedup
    slottedDedupHost(docs, stateDir, "streamingWinnowDedup",
      Dedup.committedPostingsSlots) {
        (spark: SparkSession, batch: DataFrame, batchId: Long) =>
          val post0 = Dedup.winnowPostings(batch, textCol, idCol, k, w)
          val live = Dedup.livePostingsSlots(spark, stateDir)
          val stored =
            if (live.isEmpty) post0.limit(0)
            else Dedup.loadPostingsIndex(spark, stateDir)
          val batchPost = graft.CacheRegistry.persist(
            dropRedelivered(stored, post0, "doc_id"))
          // persisted: BOTH kernel calls below prune the df parts by
          // the same batch key set — one pruned index scan per batch,
          // not two (the segment host's shared-hit-set discipline)
          val storedDfs = graft.CacheRegistry.persist(
            if (live.isEmpty) Dedup.postingsDfs(post0.limit(0))
            else Dedup.loadPostingsDfsFor(spark, stateDir,
              batchPost.select("fph")))
          // across (stored keeper, batch doc) and within-batch pairs
          // ride the SAME kernel and therefore the same union-df cut
          val across = Dedup.postingsOverlapAcross(stored, storedDfs,
              batchPost, "fph", maxDf)
            .filter(col("shared") >= minShared)
            .select(col("corpus_id").as("keeper_id"),
              col("batch_id").as("doc_id"), col("shared"))
          val within = Dedup.postingsOverlapAcross(batchPost, storedDfs,
              batchPost, "fph", maxDf)
            .filter(col("corpus_id") < col("batch_id") &&
              col("shared") >= minShared)
            .select(col("corpus_id").as("keeper_id"),
              col("batch_id").as("doc_id"), col("shared"))
          val pairs = graft.CacheRegistry.persist(
            across.unionByName(within))
          pairs.write.mode("overwrite").parquet(s"$outDir/pairs-$batchId")
          val kept = graft.CacheRegistry.persist(
            batchPost.join(
              broadcast(pairs.select(col("doc_id")).distinct()),
              Seq("doc_id"), "left_anti"))
          if (live.size + 1 >= compactEvery) {
            Dedup.savePostingsDelta(spark, stateDir,
              stored.unionByName(kept).sortWithinPartitions("fph"),
              slot = Some(batchId), snapshot = true)
            Dedup.sweepPostingsIndex(spark, stateDir)
          } else
            Dedup.savePostingsDelta(spark, stateDir, kept,
              slot = Some(batchId))
      }
  }

  /** FIRST-ARRIVAL id guard shared by the winnow/minhash hosts: drop
    * `fresh` rows whose id already exists in the stored index (a
    * replay of the same document is not a duplicate pair, and letting
    * it re-enter would double its index rows). The redelivered set is
    * found by a broadcast-semi-pruned index scan — batch-bounded
    * output, no corpus aggregate. */
  private def dropRedelivered(stored: DataFrame, fresh: DataFrame,
      idCol: String): DataFrame = {
    val ids = fresh.select(col(idCol)).distinct()
    val redelivered = stored.select(col(idCol))
      .join(broadcast(ids), Seq(idCol), "left_semi").distinct()
    fresh.join(broadcast(redelivered), Seq(idCol), "left_anti")
  }

  /** Streaming MinHash near-dedup — the LEXICAL fuzzy family's
    * landing-zone host (the TENTH [[graft.state.SlotStore]] client;
    * q102's across on micro-batches): each batch of `(idCol, textCol)`
    * rows signs ROW-LOCALLY ([[graft.operators.Dedup
    * .minHashSignatures]] — the signature table is both operator
    * input and state delta) and band-joins the persisted signature
    * index under CHRONOLOGICAL precedence (stored wins whatever the
    * ids; id-min within a batch) with FIRST-ARRIVAL ids (a redelivered
    * id never pairs or re-enters — the winnow host's rule). Near-dup
    * PAIRS land as `pairs-<batchId>` (`keeper_id, doc_id,
    * est_jaccard`); signatures pairing NOTHING commit as the
    * `mh-delta-<batchId>` slot, so the index stays unique per
    * signature (an identical signature always pairs — banding under
    * cap, star keepers over it) and `(xxhash64(sig), id)` projected
    * off it IS the star-keeper table.
    *
    * Scale shape per batch: the index is SCANNED (band join + star
    * probe), never aggregated — over-cap band keys are summed from the
    * per-delta count tables KEY-PRUNED to the batch's own band keys
    * ([[graft.operators.Dedup.loadMinHashOverCapFor]]; the band-key
    * domain is unbounded, and bands the batch does not probe cannot
    * affect its prune) — and only batch-sized frames shuffle. The
    * keep rule is pairwise; component keepers come from q53's CC (or
    * the [[streamingClusterLabels]] host) over the pair stream. Every
    * `compactEvery` live parts the index folds into one `mh-snap`
    * snapshot and superseded dirs are swept. */
  def streamingMinHashDedup(docs: DataFrame, stateDir: String,
      outDir: String, textCol: String = "text", idCol: String = "doc_id",
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
      minEstJaccard: Double = 0.5, maxBucket: Long = 100000L,
      compactEvery: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(compactEvery >= 2, "compactEvery must be >= 2")
    import graft.operators.Dedup
    slottedDedupHost(docs, stateDir, "streamingMinHashDedup",
      Dedup.committedMinHashSlots) {
        (spark: SparkSession, batch: DataFrame, batchId: Long) =>
          // the signing family is FROZEN into the state dir: a restart
          // with different shingle/hash/band parameters fails loudly
          Dedup.requireIndexMeta(spark, stateDir,
            s"shingle=$shingleSize numHashes=$numHashes bands=$bands",
            "minhash index")
          val sigs0 = Dedup.minHashSignatures(batch, textCol, idCol,
            shingleSize, numHashes)
          val live = Dedup.liveMinHashSlots(spark, stateDir)
          val stored =
            if (live.isEmpty) sigs0.limit(0)
            else Dedup.loadMinHashIndex(spark, stateDir)
          val batchSigs = graft.CacheRegistry.persist(
            dropRedelivered(stored, sigs0, "id"))
          val overCap =
            if (live.isEmpty) None
            else Some(graft.CacheRegistry.persist(
              Dedup.loadMinHashOverCapFor(spark, stateDir, batchSigs,
                maxBucket, bands, numHashes)))
          val across = Dedup.minHashLshPairsAcross(stored, batchSigs,
              bands, numHashes, minEstJaccard, maxBucket,
              overCapBands = overCap,
              starKeepers = Some(stored.select(
                xxhash64(col("sig")).as("sh"), col("id").as("corpus_id"))),
              // served band table: the batch scans stored 20-byte band
              // rows instead of re-hashing every stored signature
              corpusBandTable =
                if (live.isEmpty) None
                else Some(Dedup.loadMinHashBandTable(spark, stateDir)),
              // served binary signatures: the verify stage decodes
              // plain byte rows instead of long arrays
              corpusBinSigs =
                if (live.isEmpty) None
                else Some(Dedup.loadMinHashBinSigs(spark, stateDir)))
            .select(col("corpus_id").as("keeper_id"),
              col("batch_id").as("doc_id"), col("est_jaccard"))
          // within-batch pairs ride the same kernel at id-min
          // orientation; the batch is delivery-sized so its cap
          // bookkeeping is computed in-query
          val within = Dedup.minHashLshPairsAcross(batchSigs, batchSigs,
              bands, numHashes, minEstJaccard, maxBucket)
            .filter(col("corpus_id") < col("batch_id"))
            .select(col("corpus_id").as("keeper_id"),
              col("batch_id").as("doc_id"), col("est_jaccard"))
          val pairs = graft.CacheRegistry.persist(
            across.unionByName(within))
          pairs.write.mode("overwrite").parquet(s"$outDir/pairs-$batchId")
          val kept = graft.CacheRegistry.persist(
            batchSigs.join(
              broadcast(pairs.select(col("doc_id").as("id")).distinct()),
              Seq("id"), "left_anti"))
          if (live.size + 1 >= compactEvery) {
            Dedup.saveMinHashDelta(spark, stateDir,
              stored.unionByName(kept), slot = Some(batchId),
              snapshot = true, bands = bands, numHashes = numHashes)
            Dedup.sweepMinHashIndex(spark, stateDir)
          } else
            Dedup.saveMinHashDelta(spark, stateDir, kept,
              slot = Some(batchId), bands = bands, numHashes = numHashes)
      }
  }

  /** Streaming video near-dedup — the landing-zone host for the p19
    * frame-overlap family (the ELEVENTH [[graft.state.SlotStore]]
    * client): each micro-batch of [[graft.operators.Multimodal
    * .MediaRow]]-shaped rows decodes ONCE into its frame-hash index
    * (the index is both operator input and state delta) and pairs
    * against the persisted corpus index under the UNION doc-frequency
    * prune (stored dfs served KEY-PRUNED from the per-delta tables —
    * the frame-hash domain is unbounded, the winnow-dfs discipline —
    * plus the batch's own counts), chronological precedence and
    * FIRST-ARRIVAL ids. Pairs (`keeper_id, doc_id, shared_frames`)
    * land per batch with the self-form's full-overlap exemption
    * (exact dups always pair); videos pairing NOTHING commit their
    * frames as the `vid-delta-<batchId>` slot. Only batch-sized
    * frames shuffle; bytes never leave the decode scan. */
  def streamingVideoDedup(media: DataFrame, stateDir: String,
      outDir: String, minShared: Int = 2, maxDocFreq: Long = 20L,
      compactEvery: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(compactEvery >= 2, "compactEvery must be >= 2")
    import graft.operators.Multimodal
    slottedDedupHost(media, stateDir, "streamingVideoDedup",
      Multimodal.committedVideoSlots) {
        (spark: SparkSession, batch: DataFrame, batchId: Long) =>
          import spark.implicits._
          val frames0 = Multimodal.videoFrameIndex(
            batch.as[Multimodal.MediaRow])
          val live = Multimodal.liveVideoSlots(spark, stateDir)
          val stored =
            if (live.isEmpty) frames0.limit(0)
            else Multimodal.loadVideoIndex(spark, stateDir)
          val batchFrames = graft.CacheRegistry.persist(
            dropRedelivered(stored, frames0, "id"))
          // persisted: both kernel calls prune the df parts by the
          // same batch hash set — one pruned index scan per batch
          val storedDfs = graft.CacheRegistry.persist(
            if (live.isEmpty) Multimodal.videoFrameDfs(frames0.limit(0))
            else Multimodal.loadVideoDfsFor(spark, stateDir, batchFrames))
          val storedSizes =
            if (live.isEmpty) Multimodal.videoFrameSizes(frames0.limit(0))
            else Multimodal.loadVideoSizes(spark, stateDir)
          val across = Multimodal.videoPairsFromIndexes(stored,
              storedSizes, storedDfs, batchFrames, minShared, maxDocFreq)
            .select(col("corpus_id").as("keeper_id"),
              col("batch_id").as("doc_id"), col("shared_frames"))
          val within = Multimodal.videoPairsFromIndexes(batchFrames,
              Multimodal.videoFrameSizes(batchFrames), storedDfs,
              batchFrames, minShared, maxDocFreq)
            .filter(col("corpus_id") < col("batch_id"))
            .select(col("corpus_id").as("keeper_id"),
              col("batch_id").as("doc_id"), col("shared_frames"))
          val pairs = graft.CacheRegistry.persist(
            across.unionByName(within))
          pairs.write.mode("overwrite").parquet(s"$outDir/pairs-$batchId")
          val kept = graft.CacheRegistry.persist(
            batchFrames.join(
              broadcast(pairs.select(col("doc_id").as("id")).distinct()),
              Seq("id"), "left_anti"))
          if (live.size + 1 >= compactEvery) {
            Multimodal.saveVideoDelta(spark, stateDir,
              stored.unionByName(kept).sortWithinPartitions("fhash"),
              slot = Some(batchId), snapshot = true)
            Multimodal.sweepVideoIndex(spark, stateDir)
          } else
            Multimodal.saveVideoDelta(spark, stateDir, kept,
              slot = Some(batchId))
      }
  }

  /** Streaming cluster-label maintenance — the CONSUMER that closes
    * the dedup loop (the NINTH [[graft.state.SlotStore]] client):
    * every landing-zone host here publishes per-batch PAIR lists;
    * this host ingests that stream and maintains the served component
    * label table incrementally
    * ([[graft.operators.Dedup.connectedComponentsDelta]] — q53b's
    * contraction fold on micro-batches). The state write is O(delta):
    * a batch commits only its tiny remap (one row per component merge)
    * and its first-seen nodes' labels as the `lab-delta-<batchId>`
    * slot — the base table is never rewritten; serving applies the
    * live remaps in slot order as chained broadcast joins
    * ([[graft.operators.Dedup.loadLabelIndex]]). Every `compactEvery`
    * live parts the served table folds into one `lab-snap` snapshot
    * (empty remap) and superseded dirs are swept.
    *
    * Scale shape per batch: the contraction CC iterates over the
    * batch-scale contracted graph only; the stored label rows pay one
    * broadcast-semi-pruned scan (endpoint lookup) — never a corpus
    * shuffle, aggregate, or rewrite. Served labels at any point equal
    * batch CC over every pair ingested so far (StreamingSpec). */
  def streamingClusterLabels(pairs: DataFrame, stateDir: String,
      srcCol: String = "keeper_id", dstCol: String = "doc_id",
      compactEvery: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(compactEvery >= 2, "compactEvery must be >= 2")
    import graft.operators.Dedup
    slottedDedupHost(pairs, stateDir, "streamingClusterLabels",
      Dedup.committedLabelSlots) {
        (spark: SparkSession, batch: DataFrame, batchId: Long) =>
          val edges = graft.CacheRegistry.persist(
            batch.select(col(srcCol).as("doc_id_a"),
              col(dstCol).as("doc_id_b")))
          val live = Dedup.liveLabelSlots(spark, stateDir)
          if (live.isEmpty) {
            // first delivery: plain batch CC IS the base snapshot
            val labels = graft.CacheRegistry.persist(
              Dedup.connectedComponents(edges))
            Dedup.saveLabelDelta(spark, stateDir,
              labels.select(col("comp"), col("comp").as("newcomp"))
                .limit(0),
              labels, slot = Some(batchId), snapshot = true)
          } else {
            val labels = Dedup.loadLabelIndex(spark, stateDir)
            val (remap, newLabels) =
              Dedup.connectedComponentsDelta(labels, edges)
            if (live.size + 1 >= compactEvery) {
              val folded = graft.CacheRegistry.persist(
                labels.join(broadcast(remap), Seq("comp"), "left")
                  .select(col("node"),
                    coalesce(col("newcomp"), col("comp")).as("comp"))
                  .unionByName(newLabels))
              Dedup.saveLabelDelta(spark, stateDir, remap.limit(0),
                folded, slot = Some(batchId), snapshot = true)
              Dedup.sweepLabelIndex(spark, stateDir)
            } else
              Dedup.saveLabelDelta(spark, stateDir, remap, newLabels,
                slot = Some(batchId))
          }
      }
  }

  /** Latest committed funnel state written by
    * [[streamingCurationFunnel]]. */
  def curationFunnelState(spark: SparkSession,
      stateDir: String): graft.operators.Curation.FunnelState =
    latestState(spark, stateDir, marker = "bounds/_SUCCESS")
      .map(p => graft.operators.Curation.loadFunnelState(spark, p._2))
      .getOrElse(throw new IllegalStateException(
        s"no committed funnel state under $stateDir"))

  /** Latest committed state table written by
    * [[streamingHeavyHittersIndex]] — feed it to
    * `Sampling.heavyHittersEstimate` (or keep folding deliveries in
    * with `heavyHittersCombine`). */
  def heavyHittersIndexState(spark: SparkSession, stateDir: String): DataFrame =
    latestState(spark, stateDir).map(p => spark.read.parquet(p._2))
      .getOrElse(throw new IllegalStateException(
        s"no committed heavy-hitters state under $stateDir"))

  /** Replay-vs-lineage-regression gate — the shared
    * [[graft.state.SlotStore.replayOrRegression]] discipline. Hosts
    * call [[graft.state.SlotStore.requireLineage]] FIRST, which also
    * closes the one collision slot arithmetic cannot see (a new
    * lineage's batch 0 against a stored max of exactly 0). */
  private def replayOrRegression(latest: Option[Long], batchId: Long,
      what: String): Boolean =
    graft.state.SlotStore.replayOrRegression(latest, batchId, what)

  /** Committed `<prefix>-<slot>` dirs (parquet `_SUCCESS` present)
    * under a path — the generic slot listing for host-side artifacts
    * (quarantine evidence etc.). */
  private def committedSlots(spark: SparkSession, path: String,
      prefix: String): Seq[Long] =
    graft.state.SlotStore.committedParts(spark, path, Seq(prefix)).map(_._2)

  /** Newest `state-<batchId>` directory carrying the commit marker
    * (`_SUCCESS` for single-table states; a last-written sub-table's
    * `_SUCCESS` for multi-table ones). */
  private def latestState(spark: SparkSession, stateDir: String,
      marker: String = "_SUCCESS"): Option[(Long, String)] =
    graft.state.SlotStore.latest(spark, stateDir, "state", marker)

  /** Stream-stream correlation join: every `typeB` event joined to the
    * `typeA` events of the same user that precede it within `within` —
    * the attribution/conversion-funnel shape (view → purchase). Defined
    * once, runs in both modes: on batch frames it is a plain range
    * join; on streaming frames the watermarks plus the two-sided time
    * bound let Spark expire join state (each side holds at most
    * `watermark + within` of events per user), which is exactly the
    * condition Structured Streaming requires for state cleanup in
    * stream-stream inner joins.
    */
  def correlatedPairs(eventsA: DataFrame, eventsB: DataFrame,
      typeA: String = "view", typeB: String = "purchase",
      within: String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    val a = tsAsTimestamp(eventsA.filter(col("event_type") === typeA)
      .select(col("user_id").as("a_user"), col("event_id").as("a_id"),
        col("ts").as("a_ts")), "a_ts")
      .withWatermark("a_ts", watermark)
    val b = tsAsTimestamp(eventsB.filter(col("event_type") === typeB)
      .select(col("user_id").as("b_user"), col("event_id").as("b_id"),
        col("ts").as("b_ts")), "b_ts")
      .withWatermark("b_ts", watermark)
    a.join(b, col("a_user") === col("b_user") &&
        col("b_ts") >= col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $within"))
      .select(col("a_user").as("user_id"), col("a_id"), col("b_id"),
        date_format(col("a_ts"), "yyyy-MM-dd HH:mm:ss").as("a_time"),
        date_format(col("b_ts"), "yyyy-MM-dd HH:mm:ss").as("b_time"))
  }

  /** Custom stateful sessionization via flatMapGroupsWithState (the
    * D4/BIO-span pattern as an incremental operator;
    * `KeyValueGroupedDataset` custom state per SURVEY.md §2 streaming
    * mapping). Emit-on-close contract: each (user, session_start) is
    * emitted EXACTLY ONCE — when a later event proves the gap elapsed,
    * or when the event-time watermark passes the open session's close
    * (`EventTimeTimeout` flush). State is one open session per user.
    * In batch execution (timeouts never fire, all rows arrive in one
    * invocation) the trailing open session is emitted at end-of-group,
    * so the same definition yields the complete batch answer.
    */
  final case class SessionState(startEpochS: Long, lastEpochS: Long, n: Long)
  final case class SessionOut(user_id: Long, session_start: Long, n: Long)

  def statefulSessionCounts(spark: SparkSession, events: DataFrame,
      gapSeconds: Long = 1800L, watermark: String = "2 hours"): Dataset[SessionOut] = {
    import spark.implicits._
    val streaming = events.isStreaming
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    // the watermarked ts attribute must reach the stateful operator
    // unchanged (a cast would strip the event-time marker EventTimeTimeout
    // validates against) — epoch conversion happens inside the lambda;
    // NTZ normalization happens BEFORE the watermark for the same reason
    tsAsTimestamp(events, "ts").withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, timeoutConf) {
        (userId: Long, rows: Iterator[(Long, java.sql.Timestamp)],
            state: GroupState[SessionState]) =>
          def out(s: SessionState) = SessionOut(userId, s.startEpochS, s.n)
          if (state.hasTimedOut) {
            // watermark passed the open session's close: flush once
            val flushed = state.getOption.map(out)
            state.remove()
            flushed.iterator
          } else {
            val sorted = rows.map(_._2.getTime / 1000L).toSeq.sorted
            val closed = scala.collection.mutable.ListBuffer.empty[SessionOut]
            var open = state.getOption
            sorted.foreach { t =>
              open match {
                case Some(s) if t >= s.startEpochS - gapSeconds &&
                    t <= s.lastEpochS + gapSeconds =>
                  open = Some(SessionState(math.min(s.startEpochS, t),
                    math.max(s.lastEpochS, t), s.n + 1))
                case Some(s) if t < s.startEpochS - gapSeconds =>
                  // within-watermark straggler entirely before the open
                  // session: its own (already-elapsed) session
                  closed += SessionOut(userId, t, 1L)
                case Some(s) =>
                  closed += out(s)
                  open = Some(SessionState(t, t, 1L))
                case None =>
                  open = Some(SessionState(t, t, 1L))
              }
            }
            if (streaming) {
              open match {
                case Some(s) =>
                  val closeMs = (s.lastEpochS + gapSeconds) * 1000L
                  if (closeMs <= state.getCurrentWatermarkMs()) {
                    // already expired relative to the watermark — emit
                    // now, a timeout would be rejected as in the past
                    closed += out(s)
                    state.remove()
                  } else {
                    state.update(s)
                    state.setTimeoutTimestamp(closeMs)
                  }
                case None => state.remove()
              }
              closed.iterator
            } else {
              (closed ++ open.map(out)).iterator
            }
          }
      }
  }
}
