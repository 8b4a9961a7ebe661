package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** Streaming verified by replay equivalence (SURVEY.md Q29 note): the
  * same aggregation definition, executed once over the batch frame and
  * once as an incremental file-stream replay, must produce identical
  * results.
  */
class StreamingSpec extends SparkSuite {

  /** Every message along a Throwable's cause chain (streaming wraps
    * foreachBatch errors in StreamingQueryException layers). */
  private def causeMessages(t: Throwable): Seq[String] =
    if (t == null) Seq.empty
    else Option(t.getMessage).toSeq ++ causeMessages(t.getCause)

  private lazy val batchEvents = Tables(spark, sf("0.001")).events

  private def streamEvents(chunks: Int): (org.apache.spark.sql.DataFrame, () => Unit) = {
    // replay the events table as `chunks` files arriving chronologically
    // (a realistic replay: arrival order ≈ event time, disorder bounded
    // by the watermark — an event-id-interleaved split would race the
    // watermark and legitimately drop most rows as late)
    val dir = Files.createTempDirectory("graft-stream").toFile
    import org.apache.spark.sql.expressions.Window
    val chunked = batchEvents
      .withColumn("chunk", ntile(chunks).over(Window.orderBy("ts")))
      .cache()
    (1 to chunks).foreach { c =>
      chunked.filter(col("chunk") === c).drop("chunk")
        .coalesce(1).write.mode("append").parquet(dir.getPath)
      Thread.sleep(2100) // distinct mtimes → deterministic pickup order
    }
    chunked.unpersist()
    val streamed = spark.readStream
      .schema(StructType_events)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.getPath)
    (streamed, () => { org.apache.commons.io.FileUtils.deleteDirectory(dir); () })
  }

  private val StructType_events = {
    import org.apache.spark.sql.types._
    // ts is already µs TimestampType after Tables.events normalization
    StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
  }

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
    val q = df.writeStream.outputMode("complete").format("memory")
      .queryName(name).start()
    q.processAllAvailable()
    q.stop()
  }

  test("Q29 tumbling window: streaming replay equals batch result") {
    val batch = StreamOps.tumblingHourlyCounts(batchEvents)
      .orderBy("w", "event_type").collect().toSeq
    val (streamed, cleanup) = streamEvents(chunks = 5)
    try {
      runToMemory(StreamOps.tumblingHourlyCounts(streamed), "t29")
      val replay = spark.table("t29").orderBy("w", "event_type").collect().toSeq
      assert(replay == batch)
      assert(batch.nonEmpty)
    } finally cleanup()
  }

  test("Q56 sliding window: streaming replay equals batch result") {
    val batch = StreamOps.slidingCounts(batchEvents)
      .orderBy("w", "event_type").collect().toSeq
    val (streamed, cleanup) = streamEvents(chunks = 4)
    try {
      runToMemory(StreamOps.slidingCounts(streamed), "t56")
      val replay = spark.table("t56").orderBy("w", "event_type").collect().toSeq
      assert(replay == batch)
      assert(batch.nonEmpty)
      // and the streaming definition agrees with the declared q56 oracle
      // form (each event in exactly two slide-aligned windows)
      val q56 = graft.queries.Extended.q56(spark, sf("0.001"))
        .orderBy("w", "event_type").collect().toSeq
      assert(batch.map(r => (r.getString(0), r.getString(1), r.getLong(2))) ==
        q56.map(r => (r.getString(0), r.getString(1), r.getLong(2))))
    } finally cleanup()
  }

  test("Q30 session windows: streaming replay equals batch result") {
    val batch = StreamOps.sessionCounts(batchEvents)
      .orderBy("user_id", "session_start").collect().toSeq
    val (streamed, cleanup) = streamEvents(chunks = 4)
    try {
      runToMemory(StreamOps.sessionCounts(streamed), "t30")
      val replay = spark.table("t30").orderBy("user_id", "session_start").collect().toSeq
      assert(replay == batch)
      assert(batch.nonEmpty)
    } finally cleanup()
  }

  test("session_window operator agrees with the lag-based Q30 sessionization") {
    val q30 = graft.queries.Relational.q30(spark, sf("0.001"))
      .select("user_id", "n")
    val sw = StreamOps.sessionCounts(batchEvents).select("user_id", "n")
    // same multiset of (user, session-size) pairs
    val a = q30.groupBy("user_id", "n").count().orderBy("user_id", "n").collect().toSeq
    val b = sw.groupBy("user_id", "n").count().orderBy("user_id", "n").collect().toSeq
    assert(a == b)
  }

  test("streaming ALTO ingestion equals the batch token table") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-alto-stream").toFile
    val xml = new PipelineSpec().altoXml
    Files.write(new java.io.File(dir, "a.alto.xml").toPath, xml.getBytes)
    Thread.sleep(1100)
    Files.write(new java.io.File(dir, "b.alto.xml").toPath, xml.getBytes)
    try {
      val q = StreamOps.streamingAltoTokens(spark, dir.getPath)
        .writeStream.outputMode("append").format("memory")
        .queryName("talto").start()
      q.processAllAvailable(); q.stop()
      val streamed = spark.table("talto")
        .select("doc_id", "page_idx", "block_idx", "line_idx", "token_idx", "text")
        .collect().map(_.toString).sorted.toSeq
      // batch side: same files, same path-hash ids
      val batchDocs = spark.read.format("text").option("wholetext", "true")
        .load(dir.getPath)
        .select(xxhash64(col("_metadata.file_path")).as("doc_id"), col("value"))
        .as[(Long, String)]
      val batch = graft.sources.AltoReader.tokens(batchDocs).toDF()
        .select("doc_id", "page_idx", "block_idx", "line_idx", "token_idx", "text")
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty)
      assert(spark.table("talto").select("doc_id").distinct().count() == 2)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("streaming dedup: first arrival per content hash survives the replay") {
    import spark.implicits._
    import java.sql.Timestamp
    val dir = Files.createTempDirectory("graft-dedup").toFile
    def doc(id: Long, t: String, text: String) =
      (id, Timestamp.valueOf(t), text)
    def write(docs: (Long, Timestamp, String)*): Unit = {
      docs.toSeq.toDF("doc_id", "ts", "text")
        .coalesce(1).write.mode("append").parquet(dir.getPath)
      Thread.sleep(2100)
    }
    write(doc(1, "2024-01-01 00:00:00", "alpha"), doc(2, "2024-01-01 00:10:00", "beta"))
    write(doc(3, "2024-01-01 00:20:00", "alpha"), doc(4, "2024-01-01 01:00:00", "gamma"))
    write(doc(5, "2024-01-01 01:30:00", "beta"), doc(6, "2024-01-01 02:00:00", "alpha"))
    try {
      val schema = {
        import org.apache.spark.sql.types._
        StructType(Seq(StructField("doc_id", LongType),
          StructField("ts", TimestampType), StructField("text", StringType)))
      }
      val streamed = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(dir.getPath)
      val q = StreamOps.dedupedDocs(streamed).writeStream
        .outputMode("append").format("memory").queryName("tdedup").start()
      q.processAllAvailable(); q.stop()
      val survivors = spark.table("tdedup").collect().map(_.getLong(0)).toSet
      // first-seen-wins under chronological replay = batch min-ts rule
      assert(survivors == Set(1L, 2L, 4L))
      // the batch execution of the same operator keeps one row per hash
      val batchDocs = Seq(doc(1, "2024-01-01 00:00:00", "alpha"),
        doc(3, "2024-01-01 00:20:00", "alpha"),
        doc(2, "2024-01-01 00:10:00", "beta"))
        .toDF("doc_id", "ts", "text")
      assert(StreamOps.dedupedDocs(batchDocs).count() == 2)
      // watermark-bounded state variant streams too (state is bounded;
      // within-watermark duplicates still collapse)
      val q2 = StreamOps.dedupedDocs(streamed, Some("3 hours")).writeStream
        .outputMode("append").format("memory").queryName("tdedupw").start()
      q2.processAllAvailable(); q2.stop()
      val wm = spark.table("tdedupw").collect().map(_.getLong(0)).toSet
      assert(wm.subsetOf(Set(1L, 2L, 4L)) && wm.contains(1L))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("append mode: finalized sessions are immutable under late arrivals") {
    // The documented watermark contract is one-directional: on-time data
    // is guaranteed processed; data later than the watermark MAY be
    // dropped. The hard guarantee append mode gives is that a session,
    // once finalized (watermark passed its end) and emitted, is
    // immutable — a late row landing inside it cannot mutate or
    // re-emit it.
    import spark.implicits._
    import java.sql.Timestamp
    def ev(id: Long, t: String) =
      (id, Timestamp.valueOf(t), 1L, "click", 1.0, "{}")
    val dir = Files.createTempDirectory("graft-late").toFile
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    def write(evs: (Long, Timestamp, Long, String, Double, String)*): Unit = {
      evs.toSeq.toDF(cols: _*).coalesce(1).write.mode("append").parquet(dir.getPath)
      Thread.sleep(2100) // distinct mtimes → deterministic pickup order
    }
    write(ev(0, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:10:00"),
      ev(2, "2024-01-01 10:20:00"))
    // watermark → 2024-01-02 10:00, past 10:50 → finalizes the session
    write(ev(3, "2024-01-02 12:00:00"))
    // late row INSIDE the already-finalized session
    write(ev(4, "2024-01-01 10:15:00"))
    // flush everything still open
    write(ev(5, "2024-01-04 00:00:00"))
    try {
      val streamed = spark.readStream.schema(StructType_events)
        .option("maxFilesPerTrigger", 1).parquet(dir.getPath)
      val q = StreamOps.sessionCounts(streamed).writeStream
        .outputMode("append").format("memory").queryName("tlate").start()
      q.processAllAvailable(); q.stop()
      val emitted = spark.table("tlate").collect()
        .map(r => (r.getString(1), r.getLong(2))).toSeq
      // each session start emitted exactly once — finalized sessions are
      // never re-emitted or mutated (this build merges a late row that
      // arrives in the same batch as the eviction, so n=4; the invariant
      // is single emission, and equality with batch below)
      assert(emitted.map(_._1).distinct.size == emitted.size,
        s"duplicate emissions: $emitted")
      // append emissions == batch result restricted to sessions
      // finalized before stream end (the 2024-01-04 flush event's own
      // session is still pending)
      val batch = StreamOps.sessionCounts(spark.read.parquet(dir.getPath))
        .collect().map(r => (r.getString(1), r.getLong(2))).toSet
      assert(emitted.toSet == batch.filterNot(_._1 == "2024-01-04 00:00:00"),
        s"emitted=$emitted batch=$batch")
      assert(emitted.contains(("2024-01-01 10:00:00", 4L)))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("flatMapGroupsWithState sessionizer agrees with session_window (batch)") {
    val custom = StreamOps.statefulSessionCounts(spark, batchEvents)
      .toDF().groupBy("user_id", "n").count()
      .orderBy("user_id", "n").collect().toSeq
    val sw = StreamOps.sessionCounts(batchEvents)
      .groupBy("user_id", "n").count()
      .orderBy("user_id", "n").collect().toSeq
    assert(custom == sw)
  }

  test("streaming document pipeline: foreachBatch TEI equals the batch TEI") {
    // the full per-document DAG as an incremental stage: new ALTO files
    // land -> token table -> documentPipeline -> TEI, one foreachBatch
    // per micro-batch (all pipeline stages are per-document, so a batch
    // of new docs is self-contained and the output is append-only)
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-doc-stream").toFile
    val xml = new PipelineSpec().altoXml
    Files.write(new java.io.File(dir, "a.alto.xml").toPath, xml.getBytes)
    Thread.sleep(1100)
    Files.write(new java.io.File(dir, "b.alto.xml").toPath, xml.getBytes)
    try {
      val acc = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
      val q = StreamOps.streamingAltoTokens(spark, dir.getPath)
        .writeStream.outputMode("append")
        .foreachBatch { (tokens: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          graft.sinks.Tei.serialize(
              graft.pipeline.Processor.documentPipeline(tokens.toDF()).toDF())
            .collect().foreach(r => acc.add((r.getLong(0), r.getString(1))))
        }
        .start()
      q.processAllAvailable(); q.stop()
      import scala.jdk.CollectionConverters._
      val streamed = acc.asScala.toSeq.sortBy(_._1)
      // batch side over the same files
      val batchDocs = spark.read.format("text").option("wholetext", "true")
        .load(dir.getPath)
        .select(xxhash64(col("_metadata.file_path")).as("doc_id"), col("value"))
        .as[(Long, String)]
      val batch = graft.sinks.Tei.serialize(
          graft.pipeline.Processor.documentPipeline(
            graft.sources.AltoReader.tokens(batchDocs).toDF()).toDF())
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
      assert(streamed == batch)
      assert(streamed.size == 2 && streamed.forall(_._2.contains("<TEI")))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("documentPipelineReplay: corpus-scale micro-batch replay matches batch node-table hash") {
    // the sf-scale form of the foreachBatch parity test above: the
    // whole sf0.01 documents table (500 docs) replayed in 4 micro-
    // batches, compared by order-independent node-table fingerprint
    // (count + bit_xor of row hashes) — never collecting node rows.
    // BenchStream runs this same harness at sf1 for the BASELINE line.
    val dir = Files.createTempDirectory("graft-replay-parity").toFile
    try {
      val docs = Tables(spark, sf("0.01")).documents
      val (nDocs, nBatches, streamFp, batchFp, _) =
        StreamOps.documentPipelineReplay(spark, docs, dir.getPath, nFiles = 4)
      assert(nDocs == 500L)
      assert(nBatches >= 2, s"want multiple micro-batches, got $nBatches")
      assert(streamFp == batchFp,
        s"stream fingerprint $streamFp != batch fingerprint $batchFp")
      assert(streamFp._1 > 0L, "fingerprint should cover a non-empty node table")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("streaming curation: row-local quality kernel streams unchanged") {
    // quality/curation features are pure projections — the SAME
    // definition runs on a stream with append semantics and no state
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-curation-stream").toFile
    val docs = Tables(spark, sf("0.001")).documents.select("doc_id", "text")
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    Thread.sleep(1100)
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    try {
      val schema = docs.schema
      val streamed = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(dir.getPath)
      val q = graft.operators.TextAnalysis.qualityFeatures(streamed)
        .writeStream.outputMode("append").format("memory")
        .queryName("tqual").start()
      q.processAllAvailable(); q.stop()
      val s = spark.table("tqual").collect().map(_.toString).sorted.toSeq
      val b = graft.operators.TextAnalysis.qualityFeatures(docs)
        .collect().map(_.toString).sorted.toSeq
      assert(s == b && s.nonEmpty)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("streaming heavy-hitters index: per-batch sketch folds equal the " +
      "batch sketch; one committed state version remains") {
    val dir = Files.createTempDirectory("graft-hh-stream").toFile
    val stateDir = Files.createTempDirectory("graft-hh-state").toFile
    val docs = Tables(spark, sf("0.001")).documents
      .select("doc_id", "source", "text")
    (0 until 3).foreach { c =>
      docs.filter(col("doc_id") % 3 === c).coalesce(1)
        .write.mode("append").parquet(dir.getPath)
      Thread.sleep(1100)
    }
    try {
      val streamed = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(dir.getPath)
      val q = StreamOps.streamingHeavyHittersIndex(streamed,
        stateDir.getPath, groupCol = "source", textCol = "text")
      q.processAllAvailable(); q.stop()
      val got = graft.operators.Sampling.heavyHittersEstimate(
          StreamOps.heavyHittersIndexState(spark, stateDir.getPath),
          "source", 5)
        .orderBy("source", "rn").collect().map(_.toString).toSeq
      val want = graft.operators.Sampling.approxHeavyHitters(
          docs, "source", "text", 5)
        .orderBy("source", "rn").collect().map(_.toString).toSeq
      assert(got == want && got.nonEmpty)
      // superseded versions retired: exactly one committed state dir
      val versions = stateDir.listFiles.filter(_.getName.startsWith("state-"))
      assert(versions.length == 1, versions.mkString(", "))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
      org.apache.commons.io.FileUtils.deleteDirectory(stateDir)
    }
  }

  test("streaming curation funnel: per-batch state folds equal the " +
      "sequential incremental path; state writes are append-only deltas") {
    import graft.operators.Curation
    val dir = Files.createTempDirectory("graft-funnel-stream").toFile
    val stateDir = Files.createTempDirectory("graft-funnel-state").toFile
    val docs = Tables(spark, sf("0.001")).documents
      .select("doc_id", "text", "n_chars")
    val pats = Seq("window window", "vector join")
    val benchmark = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
    // append-only id splits: base then two deliveries, arriving as
    // three files in timestamp order
    val splits = Seq(col("doc_id") < 30,
      col("doc_id") >= 30 && col("doc_id") < 40, col("doc_id") >= 40)
    splits.foreach { pred =>
      docs.filter(pred).coalesce(1).write.mode("append").parquet(dir.getPath)
      Thread.sleep(1100)
    }
    try {
      val streamed = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false").parquet(dir.getPath)
      val q = StreamOps.streamingCurationFunnel(streamed, stateDir.getPath,
        benchmark, pats)
      q.processAllAvailable(); q.stop()
      val got = StreamOps.curationFunnelState(spark, stateDir.getPath)
      // sequential batch-side incremental path over the same splits
      val s0 = Curation.initialFunnelState(docs.filter(splits(0)),
        benchmark, pats)
      val (s1, _) = Curation.incrementalFunnel(s0, docs.filter(splits(1)),
        benchmark, pats)
      val (s2, _) = Curation.incrementalFunnel(s1, docs.filter(splits(2)),
        benchmark, pats)
      def ids(st: Curation.FunnelState) =
        st.survivors.collect().map(_.getLong(0)).sorted.toSeq
      assert(got.lenLo == s2.lenLo && got.lenHi == s2.lenHi)
      assert(ids(got) == ids(s2) && ids(got).nonEmpty)
      // append-only state: all three versions remain (their deltas stay
      // referenced by the latest manifest); each version dir holds ONLY
      // its batch's survivor delta — write cost per batch is O(delta),
      // never an O(corpus) survivor rewrite
      val versions = stateDir.listFiles.filter(_.getName.startsWith("state-"))
        .sortBy(_.getName)
      assert(versions.map(_.getName).toSeq ==
        Seq("state-0", "state-1", "state-2"), versions.mkString(", "))
      def deltaRows(v: String) =
        spark.read.parquet(s"${stateDir.getPath}/$v/delta").count()
      val baseRows = deltaRows("state-0")
      val d1Rows = deltaRows("state-1")
      val d2Rows = deltaRows("state-2")
      assert(baseRows + d1Rows + d2Rows == ids(got).size.toLong,
        s"deltas $baseRows+$d1Rows+$d2Rows must partition the survivors")
      // each version holds exactly ITS batch's funnel output — the
      // stored corpus is never rewritten (growth ∝ delta, not corpus)
      def reportOut(b: Int) = spark.read
        .parquet(s"${stateDir.getPath}/report-$b")
        .filter(col("stage") === "decontaminate")
        .head().getAs[Long]("docs_out")
      assert(d1Rows == reportOut(1) && d2Rows == reportOut(2),
        s"d1=$d1Rows/${reportOut(1)} d2=$d2Rows/${reportOut(2)}")
      // batch 1's write is sized by its 5-doc delta, not by the
      // 21-doc corpus it folded into
      def dirBytes(f: String): Long = org.apache.commons.io.FileUtils
        .sizeOfDirectory(new java.io.File(stateDir, f))
      assert(d1Rows < baseRows &&
        dirBytes("state-1/delta") < dirBytes("state-0/delta"),
        s"base=$baseRows d1=$d1Rows bytes=${dirBytes("state-1/delta")}/${dirBytes("state-0/delta")}")
      val reports = stateDir.listFiles.filter(_.getName.startsWith("report-"))
      assert(reports.length == 2, reports.mkString(", "))
      val rep = spark.read.parquet(reports.head.getPath)
      assert(rep.count() == 5) // five funnel stages per delivery
      // save/load round-trip of the final state preserves the view
      assert(ids(Curation.loadFunnelState(spark,
        s"${stateDir.getPath}/state-2")) == ids(s2))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
      org.apache.commons.io.FileUtils.deleteDirectory(stateDir)
    }
  }

  test("streaming curation funnel: compaction folds deltas into one " +
      "snapshot and retires unreferenced versions") {
    import graft.operators.Curation
    val dir = Files.createTempDirectory("graft-funnel-compact").toFile
    val stateDir = Files.createTempDirectory("graft-funnel-cstate").toFile
    val docs = Tables(spark, sf("0.001")).documents
      .select("doc_id", "text", "n_chars")
    val pats = Seq("window window", "vector join")
    val benchmark = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
    val splits = Seq(col("doc_id") < 30,
      col("doc_id") >= 30 && col("doc_id") < 40, col("doc_id") >= 40)
    splits.foreach { pred =>
      docs.filter(pred).coalesce(1).write.mode("append").parquet(dir.getPath)
      Thread.sleep(1100)
    }
    try {
      val streamed = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false").parquet(dir.getPath)
      // compactEvery=2: every incremental batch triggers a snapshot
      val q = StreamOps.streamingCurationFunnel(streamed, stateDir.getPath,
        benchmark, pats, compactEvery = 2)
      q.processAllAvailable(); q.stop()
      // only the latest (snapshot) version remains
      val versions = stateDir.listFiles.filter(_.getName.startsWith("state-"))
      assert(versions.map(_.getName).toSeq == Seq("state-2"),
        versions.mkString(", "))
      val got = StreamOps.curationFunnelState(spark, stateDir.getPath)
      assert(got.liveDeltas == Seq("state-2/delta"), got.liveDeltas)
      // still equals the sequential incremental fold
      val s0 = Curation.initialFunnelState(docs.filter(splits(0)),
        benchmark, pats)
      val (s1, _) = Curation.incrementalFunnel(s0, docs.filter(splits(1)),
        benchmark, pats)
      val (s2, _) = Curation.incrementalFunnel(s1, docs.filter(splits(2)),
        benchmark, pats)
      def ids(st: Curation.FunnelState) =
        st.survivors.collect().map(_.getLong(0)).sorted.toSeq
      assert(ids(got) == ids(s2) && ids(got).nonEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
      org.apache.commons.io.FileUtils.deleteDirectory(stateDir)
    }
  }

  test("funnel state recovery: an uncommitted (torn) version is skipped " +
      "and a batch retry overwrites it cleanly") {
    import graft.operators.Curation
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-funnel-torn").toFile
    val stateDir = Files.createTempDirectory("graft-funnel-tstate").toFile
    val docs = Tables(spark, sf("0.001")).documents
      .select("doc_id", "text", "n_chars")
    val pats = Seq("window window", "vector join")
    val benchmark = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
    val splits = Seq(col("doc_id") < 30, col("doc_id") >= 30)
    splits.foreach { pred =>
      docs.filter(pred).coalesce(1).write.mode("append").parquet(dir.getPath)
      Thread.sleep(1100)
    }
    // simulate a crash between the delta/manifest writes and the bounds
    // commit marker: state-1 has a (garbage) delta and manifest but no
    // bounds/_SUCCESS — batch 1 must treat it as never written and
    // retry over it; a torn FUTURE version (state-9) must likewise
    // never be served
    for (v <- Seq("state-1", "state-9")) {
      Seq((999999L, "torn garbage row", 16L))
        .toDF("doc_id", "text", "n_chars")
        .write.mode("overwrite").parquet(s"${stateDir.getPath}/$v/delta")
      Seq(s"$v/delta").toDF("delta_dir")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"${stateDir.getPath}/$v/manifest")
    }
    try {
      val streamed = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false").parquet(dir.getPath)
      val q = StreamOps.streamingCurationFunnel(streamed, stateDir.getPath,
        benchmark, pats)
      q.processAllAvailable(); q.stop()
      // batch 1 retried over the torn state-1: it is committed now
      assert(new java.io.File(stateDir, "state-1/bounds/_SUCCESS").exists())
      val got = StreamOps.curationFunnelState(spark, stateDir.getPath)
      val s0 = Curation.initialFunnelState(docs.filter(splits(0)),
        benchmark, pats)
      val (s1, _) = Curation.incrementalFunnel(s0, docs.filter(splits(1)),
        benchmark, pats)
      def ids(st: Curation.FunnelState) =
        st.survivors.collect().map(_.getLong(0)).sorted.toSeq
      // the garbage row never leaks into the served state (state-9 is
      // torn, so the newest COMMITTED version — state-1 — is served)
      assert(ids(got) == ids(s1) && !ids(got).contains(999999L))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
      org.apache.commons.io.FileUtils.deleteDirectory(stateDir)
    }
  }

  test("streaming curation funnel: an empty first batch is skipped, not " +
      "an NPE — the state initializes from the first non-empty batch") {
    import graft.operators.Curation
    val dir = Files.createTempDirectory("graft-funnel-empty").toFile
    val stateDir = Files.createTempDirectory("graft-funnel-estate").toFile
    val docs = Tables(spark, sf("0.001")).documents
      .select("doc_id", "text", "n_chars")
    val pats = Seq("window window")
    val benchmark = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
    // file-source startup shape: an EMPTY shard lands first
    docs.filter(lit(false)).coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    Thread.sleep(1100)
    docs.filter(col("doc_id") < 30).coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    try {
      val streamed = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false").parquet(dir.getPath)
      val q = StreamOps.streamingCurationFunnel(streamed, stateDir.getPath,
        benchmark, pats)
      q.processAllAvailable(); q.stop()
      val got = StreamOps.curationFunnelState(spark, stateDir.getPath)
      val want = Curation.initialFunnelState(docs.filter(col("doc_id") < 30),
        benchmark, pats)
      def ids(st: Curation.FunnelState) =
        st.survivors.collect().map(_.getLong(0)).sorted.toSeq
      assert(ids(got) == ids(want) && ids(got).nonEmpty)
      assert(got.lenLo == want.lenLo && got.lenHi == want.lenHi)
      // the empty batch wrote NO state version
      val versions = stateDir.listFiles.filter(_.getName.startsWith("state-"))
        .map(_.getName).sorted.toSeq
      assert(versions == Seq("state-1"), versions)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
      org.apache.commons.io.FileUtils.deleteDirectory(stateDir)
    }
  }

  test("streaming span dedup: each batch is cut against all earlier " +
      "batches' gram dfs plus its own; state grows by O(delta) slots") {
    import graft.operators.TextAnalysis
    val dir = Files.createTempDirectory("graft-span-stream").toFile
    val stateDir = Files.createTempDirectory("graft-span-state").toFile
    val outDir = Files.createTempDirectory("graft-span-out").toFile
    val docs = Tables(spark, sf("0.001")).documents
      .select("doc_id", "text")
    // three chronological chunks (deterministic id ranges)
    val cuts = Seq(0L -> 150L, 150L -> 300L, 300L -> 10000L)
    cuts.foreach { case (lo, hi) =>
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi).coalesce(1)
        .write.mode("append").parquet(dir.getPath)
      Thread.sleep(1100)
    }
    try {
      val streamed = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false").parquet(dir.getPath)
      // compactEvery = 3: the third batch folds the union into its own
      // slot and retires the two raw deltas — outputs must not change
      val q = StreamOps.streamingSpanDedup(streamed, stateDir.getPath,
        outDir.getPath, n = 8, compactEvery = 3)
      q.processAllAvailable(); q.stop()
      // after compaction only the snapshot slot remains
      assert(TextAnalysis.committedSpanDfSlots(spark, stateDir.getPath)
        .sorted == Seq(2L))
      // and it holds the aggregated union of all three chunks
      val stateSum = TextAnalysis.loadSpanDfIndex(spark, stateDir.getPath)
        .groupBy("gh").agg(sum("df").as("df"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val wantSum = TextAnalysis.spanGramDfs(docs, n = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(stateSum == wantSum)
      // batch k's cleaned output ≡ the incremental cut against the
      // union of every earlier chunk's gram dfs (chronological
      // semantics; batch 0 is cut against itself only)
      cuts.zipWithIndex.foreach { case ((lo, hi), k) =>
        val chunk = docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        val storedDfs =
          if (k == 0) TextAnalysis.spanGramDfs(docs.filter(lit(false)), n = 8)
          else TextAnalysis.spanGramDfs(
            docs.filter(col("doc_id") < cuts(k)._1), n = 8)
        val want = TextAnalysis
          .removeSharedSpansIncremental(chunk, storedDfs, n = 8)
          .orderBy("doc_id").collect().map(_.toSeq).toSeq
        val got = spark.read.parquet(s"${outDir.getPath}/cleaned-$k")
          .orderBy("doc_id").collect().map(_.toSeq).toSeq
        assert(got == want, s"batch $k")
        assert(got.nonEmpty)
      }
      // the last batch really was cut by earlier batches' grams: at
      // least one of its docs lost tokens (sf0.001 documents share
      // boilerplate across the id range)
      val last = spark.read.parquet(s"${outDir.getPath}/cleaned-2")
      assert(last.filter(col("n_removed") > 0).count() > 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
      org.apache.commons.io.FileUtils.deleteDirectory(stateDir)
      org.apache.commons.io.FileUtils.deleteDirectory(outDir)
    }
  }

  test("streaming segment dedup: each batch is cut against all earlier " +
      "batches' keepers plus its own; compaction folds to one snapshot") {
    import graft.operators.TextAnalysis
    val dir = Files.createTempDirectory("graft-seg-stream").toFile
    val stateDir = Files.createTempDirectory("graft-seg-state").toFile
    val outDir = Files.createTempDirectory("graft-seg-out").toFile
    val docs = Tables(spark, sf("0.001")).documents
      .select("doc_id", "text")
    val cuts = Seq(0L -> 150L, 150L -> 300L, 300L -> 10000L)
    cuts.foreach { case (lo, hi) =>
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi).coalesce(1)
        .write.mode("append").parquet(dir.getPath)
      Thread.sleep(1100)
    }
    try {
      val streamed = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false").parquet(dir.getPath)
      // compactEvery = 3: the third batch folds the union into its own
      // snapshot slot and retires the two raw deltas
      val q = StreamOps.streamingSegmentDedup(streamed, stateDir.getPath,
        outDir.getPath, width = 16, compactEvery = 3)
      q.processAllAvailable(); q.stop()
      assert(TextAnalysis.committedSegmentKeeperSlots(spark, stateDir.getPath)
        .sorted == Seq(2L))
      // the snapshot holds the batch keepers over ALL three chunks
      val stateK = TextAnalysis.loadSegmentKeeperIndex(spark, stateDir.getPath)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .sorted.toSeq
      val wantK = TextAnalysis.segmentKeepers(docs, width = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .sorted.toSeq
      assert(stateK == wantK)
      // batch k's cleaned output ≡ the incremental cut against the
      // keepers of every earlier chunk (batch 0 dedups within itself) —
      // under the host's CHRONOLOGICAL rule (stored always precedes)
      cuts.zipWithIndex.foreach { case ((lo, hi), k) =>
        val chunk = docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        val storedK = TextAnalysis.segmentKeepers(
          if (k == 0) docs.filter(lit(false))
          else docs.filter(col("doc_id") < cuts(k)._1), width = 16)
        val want = TextAnalysis
          .segmentDedupIncremental(chunk, storedK, width = 16,
            storedPrecedes = true)
          .orderBy("doc_id").collect().map(_.toSeq).toSeq
        val got = spark.read.parquet(s"${outDir.getPath}/cleaned-$k")
          .orderBy("doc_id").collect().map(_.toSeq).toSeq
        assert(got == want, s"batch $k")
        assert(got.nonEmpty)
      }
      // chronological semantics really bit: some later-batch doc lost
      // segments to an earlier batch's keeper
      val last = spark.read.parquet(s"${outDir.getPath}/cleaned-2")
      assert(last.filter(col("n_dropped") > 0).count() > 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
      org.apache.commons.io.FileUtils.deleteDirectory(stateDir)
      org.apache.commons.io.FileUtils.deleteDirectory(outDir)
    }
  }

  test("streaming segment dedup is chronological: a later batch with a " +
      "SMALLER doc_id still loses to the published copy") {
    // the batch operator's bidirectional id-min rule would KEEP the
    // later, smaller-id occurrence — but cleaned-0 is already written
    // and immutable, so the host must drop it or the corpus carries
    // the paragraph twice
    import graft.operators.TextAnalysis
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-seg-chrono").toFile
    val stateDir = Files.createTempDirectory("graft-seg-chrono-state").toFile
    val outDir = Files.createTempDirectory("graft-seg-chrono-out").toFile
    val schema = Seq((0L, "")).toDF("doc_id", "text").schema
    // batch 0: doc 100 publishes segment [a b c]; batch 1: doc 5
    // carries the same segment (smaller id) plus its own [x y z]
    Seq((100L, "a b c")).toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    Thread.sleep(1100)
    Seq((5L, "a b c x y z")).toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    try {
      val streamed = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false").parquet(dir.getPath)
      val q = StreamOps.streamingSegmentDedup(streamed, stateDir.getPath,
        outDir.getPath, width = 3, compactEvery = 64)
      q.processAllAvailable(); q.stop()
      val b0 = spark.read.parquet(s"${outDir.getPath}/cleaned-0")
        .collect().map(r => (r.getLong(0), r.getString(3))).toSeq
      val b1 = spark.read.parquet(s"${outDir.getPath}/cleaned-1")
        .collect().map(r => (r.getLong(0), r.getString(3))).toSeq
      assert(b0 == Seq((100L, "a b c")), b0)
      assert(b1 == Seq((5L, "x y z")), b1)   // [a b c] lost to batch 0
      // first-arrival state: [a b c]'s keeper stays batch 0's doc 100
      // (parts are gh-disjoint — the hash never re-enters)
      val keepers = TextAnalysis
        .loadSegmentKeeperIndex(spark, stateDir.getPath)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val abcHash = TextAnalysis.segmentKeepers(
          Seq((0L, "a b c")).toDF("doc_id", "text"), width = 3)
        .collect().head.getLong(0)
      assert(keepers(abcHash) == 100L, keepers)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
      org.apache.commons.io.FileUtils.deleteDirectory(stateDir)
      org.apache.commons.io.FileUtils.deleteDirectory(outDir)
    }
  }

  test("streaming segment host reads the keeper index through ONE shared " +
      "pruned cache per micro-batch — no consumer re-scans the state dir") {
    // VERDICT r11 #3: the cut and the first-arrival anti-join used to
    // each run their own broadcast-semi-pruned FileScan of the
    // corpus-scale keeper index. Now the pruned hit set is persisted
    // once; every executed plan of a non-snapshot batch must read the
    // index via InMemoryTableScan only (the single disk scan happens
    // inside that cache's materialization)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-seg-scan").toFile
    val stateDir = Files.createTempDirectory("graft-seg-scan-state").toFile
    val outDir = Files.createTempDirectory("graft-seg-scan-out").toFile
    val schema = Seq((0L, "")).toDF("doc_id", "text").schema
    Seq((100L, "a b c")).toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    Thread.sleep(1100)
    Seq((5L, "a b c x y z")).toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    val directScans = new java.util.concurrent.atomic.AtomicInteger(0)
    val cachedReads = new java.util.concurrent.atomic.AtomicInteger(0)
    def walk(p: SparkPlan): Unit = {
      p match {
        case f: FileSourceScanExec if f.relation.location.rootPaths
            .exists(_.toString.contains(stateDir.getName)) =>
          directScans.incrementAndGet()
        case _: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          cachedReads.incrementAndGet()
        case _ => ()
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      kids.foreach(walk)
    }
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = walk(qe.executedPlan)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val streamed = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false").parquet(dir.getPath)
      val q = StreamOps.streamingSegmentDedup(streamed, stateDir.getPath,
        outDir.getPath, width = 3, compactEvery = 64)
      q.processAllAvailable(); q.stop()
      // listener callbacks are async — wait for them to drain
      val deadline = System.nanoTime + 10L * 1000 * 1000 * 1000
      while (cachedReads.get == 0 && System.nanoTime < deadline)
        Thread.sleep(100)
      assert(cachedReads.get > 0,
        "listener saw no cached reads — instrumentation did not fire")
      assert(directScans.get == 0,
        s"keeper index re-scanned directly ${directScans.get} times")
      // outputs unchanged (the chronological fixture's expectations)
      val b1 = spark.read.parquet(s"${outDir.getPath}/cleaned-1")
        .collect().map(r => (r.getLong(0), r.getString(3))).toSeq
      assert(b1 == Seq((5L, "x y z")), b1)
    } finally {
      spark.listenerManager.unregister(listener)
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
      org.apache.commons.io.FileUtils.deleteDirectory(stateDir)
      org.apache.commons.io.FileUtils.deleteDirectory(outDir)
    }
  }

  test("streaming signature dedup: re-deliveries pair their stored " +
      "originals chronologically, flag spaces never cross, survivors " +
      "extend the index, compaction folds to one snapshot") {
    import graft.operators.Dedup
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sig-stream").toFile
    val stateDir = Files.createTempDirectory("graft-sig-stream-state").toFile
    val outDir = Files.createTempDirectory("graft-sig-stream-out").toFile
    val sigA = 0x1111222233334444L
    val sigB = 0x5555666677778888L
    val junk = 0x0F0F0F0F0F0F0F0FL // fallback-space signature
    val sigC = 0x9999AAAABBBBCCCCL
    val schema = Seq((0L, 0L, true)).toDF("doc_id", "sig64", "decoded").schema
    // batch 0: three keepers (two decoded, one fallback)
    Seq((100L, sigA, true), (101L, sigB, true), (102L, junk, false))
      .toDF("doc_id", "sig64", "decoded").coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    Thread.sleep(1100)
    // batch 1: a SMALLER-id redelivery of sigA (chronology: loses to
    // the stored 100), a Hamming-1 decoded neighbour of B, a fallback
    // Hamming-1 of junk (must NOT pair — fallback is exact-only), an
    // exact fallback dup, and a novel pair within the batch
    Seq((5L, sigA, true), (200L, sigB ^ 1L, true),
      (203L, junk ^ 1L, false), (204L, junk, false),
      (201L, sigC, true), (300L, sigC, true))
      .toDF("doc_id", "sig64", "decoded").coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    try {
      val streamed = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false").parquet(dir.getPath)
      // compactEvery = 2: batch 1 folds the index into its snapshot
      val q = StreamOps.streamingSignatureDedup(streamed, stateDir.getPath,
        outDir.getPath, compactEvery = 2)
      q.processAllAvailable(); q.stop()
      val p0 = spark.read.parquet(s"${outDir.getPath}/pairs-0")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(p0.isEmpty, p0) // three distinct signatures, no pair
      val p1 = spark.read.parquet(s"${outDir.getPath}/pairs-1")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(p1 == Set(
        (100L, 5L, 0L),   // stored sigA beats the smaller-id redelivery
        (101L, 200L, 1L), // decoded Hamming-1 via banding
        (102L, 204L, 0L), // fallback exact byte-dup
        (201L, 300L, 0L)  // within-batch novel pair, id-min keeper
      ), p1)              // 203 (fallback Hamming-1) pairs NOTHING
      // survivors: 201 (novel, won within-batch), 203 (fallback H1)
      // — the index holds b0's three keepers + these two, and the
      // compaction at batch 1 folded everything into ONE snapshot
      assert(Dedup.committedSignatureSlots(spark, stateDir.getPath)
        .sorted == Seq(1L))
      val idx = Dedup.loadSignatureIndex(spark, stateDir.getPath)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSet
      assert(idx == Set((100L, sigA, true), (101L, sigB, true),
        (102L, junk, false), (201L, sigC, true), (203L, junk ^ 1L, false)),
        idx)
      // the bounded count parts sum to the index's chunk histogram
      val n = Dedup.loadSignatureOverCap(spark, stateDir.getPath, 0L)
        .count()
      assert(n > 0 && n <= 5 * 4, n) // every occupied bucket > cap 0
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
      org.apache.commons.io.FileUtils.deleteDirectory(stateDir)
      org.apache.commons.io.FileUtils.deleteDirectory(outDir)
    }
  }

  test("streaming signature dedup: an over-cap stored bucket family " +
      "recovers an identical redelivery via the SERVED star keepers — " +
      "the index is its own keeper table, summed counts do the cap") {
    import graft.operators.Dedup
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sig-cap").toFile
    val stateDir = Files.createTempDirectory("graft-sig-cap-state").toFile
    val outDir = Files.createTempDirectory("graft-sig-cap-out").toFile
    // X's four 16-bit chunks; for every chunk i, two extra stored sigs
    // share EXACTLY chunk i's value (far elsewhere) — with maxBucket=2
    // every one of X's chunk buckets holds 3 members and is pruned, so
    // an identical redelivery of X can ONLY pair via the star keepers
    val X = 0x1111222233334444L
    def keepChunk(i: Int, fill: Long): Long = {
      val mask = 0xFFFFL << (i * 16)
      (X & mask) | (fill & ~mask)
    }
    val others = (0 until 4).flatMap(i => Seq(
      keepChunk(i, 0x5A5A5A5A5A5A5A5AL), keepChunk(i, 0xA5A5A5A5A5A5A5A5L)))
    val schema = Seq((0L, 0L, true)).toDF("doc_id", "sig64", "decoded").schema
    (Seq((0L, X, true)) ++ others.zipWithIndex.map { case (s, k) =>
      ((k + 1).toLong, s, true) })
      .toDF("doc_id", "sig64", "decoded").coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    Thread.sleep(1100)
    Seq((1000L, X, true)).toDF("doc_id", "sig64", "decoded").coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    try {
      val streamed = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false").parquet(dir.getPath)
      val q = StreamOps.streamingSignatureDedup(streamed, stateDir.getPath,
        outDir.getPath, maxBucket = 2L, compactEvery = 64)
      q.processAllAvailable(); q.stop()
      // fixture invariant: every chunk bucket of X is actually over cap
      val over = Dedup.loadSignatureOverCap(spark, stateDir.getPath, 2L)
        .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
      val xChunks = (0 until 4).map(i => (i, (X >> (i * 16)) & 0xFFFFL)).toSet
      assert(xChunks.subsetOf(over), s"over-cap $over missing $xChunks")
      val p1 = spark.read.parquet(s"${outDir.getPath}/pairs-1")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(p1 == Set((0L, 1000L, 0L)), p1) // star keeper, exactly once
      // the redelivery never enters the index
      val ids = Dedup.loadSignatureIndex(spark, stateDir.getPath)
        .collect().map(_.getLong(0)).toSet
      assert(!ids.contains(1000L) && ids.contains(0L), ids)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
      org.apache.commons.io.FileUtils.deleteDirectory(stateDir)
      org.apache.commons.io.FileUtils.deleteDirectory(outDir)
    }
  }

  test("streaming embedding dedup: redelivered vectors pair their " +
      "stored originals chronologically, the hyperplane meta locks the " +
      "state dir, compaction folds to one snapshot") {
    import graft.operators.Dedup
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-emb-stream").toFile
    val stateDir = Files.createTempDirectory("graft-emb-stream-state").toFile
    val outDir = Files.createTempDirectory("graft-emb-stream-out").toFile
    def v(x: Float, y: Float, z: Float, w: Float) = Array(x, y, z, w)
    val schema = Seq((0L, Array(0f))).toDF("vec_id", "embedding").schema
    // batch 0: three well-separated directions
    Seq((100L, v(10, 0, 0, 0)), (101L, v(0, 10, 0, 0)),
      (102L, v(0, 0, 10, 0)))
      .toDF("vec_id", "embedding").coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    Thread.sleep(1100)
    // batch 1: a SMALLER-id gain-scaled redelivery of 100 (same sign
    // buckets, cosine exactly 1.0 — chronology must drop it), a near
    // dup of 101, a novel direction arriving twice (id-min within)
    Seq((5L, v(20, 0, 0, 0)), (200L, v(0.1f, 10, 0, 0)),
      (201L, v(0, 0, 0, 10)), (300L, v(0, 0, 0, 10)))
      .toDF("vec_id", "embedding").coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    try {
      val streamed = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false").parquet(dir.getPath)
      val q = StreamOps.streamingEmbeddingDedup(streamed, stateDir.getPath,
        outDir.getPath, threshold = 0.95, nbits = 4, compactEvery = 2)
      q.processAllAvailable(); q.stop()
      val p1 = spark.read.parquet(s"${outDir.getPath}/pairs-1")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(p1.contains((100L, 5L, 1.0)), p1)   // stored beats smaller id
      assert(p1.exists(p => p._1 == 101L && p._2 == 200L && p._3 >= 0.95),
        p1)                                       // banded near dup
      assert(p1.contains((201L, 300L, 1.0)), p1) // within-batch id-min
      assert(p1.size == 3, p1)
      // survivors: batch 0's three + the novel 201; snapshot at slot 1
      assert(Dedup.committedEmbeddingSlots(spark, stateDir.getPath)
        .sorted == Seq(1L))
      val ids = Dedup.loadEmbeddingIndex(spark, stateDir.getPath)
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(100L, 101L, 102L, 201L), ids)
      // the hyperplane family is FROZEN: a host restarted with other
      // planes against this state dir must fail loudly
      intercept[IllegalArgumentException] {
        Dedup.requireEmbeddingMeta(spark, stateDir.getPath,
          "nbits=8 seed=42 nBands=1 dim=4")
      }
      // and the recorded meta re-asserts cleanly
      Dedup.requireEmbeddingMeta(spark, stateDir.getPath,
        "nbits=4 seed=42 nBands=1 dim=4")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
      org.apache.commons.io.FileUtils.deleteDirectory(stateDir)
      org.apache.commons.io.FileUtils.deleteDirectory(outDir)
    }
  }

  test("streaming hosts reject a new checkpoint lineage pointed at an " +
      "old state dir (batch ids behind the stored version fail loudly)") {
    import graft.operators.Curation
    val dir = Files.createTempDirectory("graft-lineage").toFile
    val stateDir = Files.createTempDirectory("graft-lineage-state").toFile
    val docs = Tables(spark, sf("0.001")).documents
      .select("doc_id", "text", "n_chars")
    val benchmark = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
    docs.filter(col("doc_id") < 100).coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    Thread.sleep(1100)
    docs.filter(col("doc_id") >= 100 && col("doc_id") < 200).coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    val dir2 = Files.createTempDirectory("graft-lineage2").toFile
    docs.filter(col("doc_id") >= 200 && col("doc_id") < 260).coalesce(1)
      .write.mode("append").parquet(dir2.getPath)
    try {
      def stream(d: java.io.File) = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false").parquet(d.getPath)
      val q1 = StreamOps.streamingCurationFunnel(stream(dir),
        stateDir.getPath, benchmark, Seq("window window"))
      q1.processAllAvailable(); q1.stop()
      // stored version is now 1; a FRESH stream (new source dir, batch
      // ids reset to 0) against the same state dir must fail loudly —
      // the old behavior silently dropped every batch until ids caught
      // up with the stored version
      val q2 = StreamOps.streamingCurationFunnel(stream(dir2),
        stateDir.getPath, benchmark, Seq("window window"))
      val e = intercept[Throwable] { q2.processAllAvailable() }
      q2.stop()
      assert(causeMessages(e).exists(_.contains("checkpoint lineage")),
        causeMessages(e))
      // the stored state survives untouched
      val st = StreamOps.curationFunnelState(spark, stateDir.getPath)
      assert(st.survivors.count() > 0)

      // same shape against the SLOT-set host: span-dedup slots are
      // DENSE before the first compaction, so a membership skip would
      // silently treat the new lineage's colliding ids as replays —
      // the max-gate must throw instead
      val spanState = Files.createTempDirectory("graft-lineage-span").toFile
      val spanOut = Files.createTempDirectory("graft-lineage-out").toFile
      try {
        val q3 = StreamOps.streamingSpanDedup(stream(dir),
          spanState.getPath, spanOut.getPath, n = 8)
        q3.processAllAvailable(); q3.stop()
        assert(graft.operators.TextAnalysis
          .committedSpanDfSlots(spark, spanState.getPath)
          .sorted == Seq(0L, 1L)) // dense — membership would collide
        val q4 = StreamOps.streamingSpanDedup(stream(dir2),
          spanState.getPath, spanOut.getPath, n = 8)
        val e4 = intercept[Throwable] { q4.processAllAvailable() }
        q4.stop()
        assert(causeMessages(e4).exists(_.contains("checkpoint lineage")),
          causeMessages(e4))
        // no cleaned output was silently dropped OR written for the
        // rejected lineage (its ids collide with batch 0/1's dirs, so
        // equality of the dir count pins "nothing happened")
        assert(spanOut.listFiles.count(_.getName.startsWith("cleaned-")) == 2)
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(spanState)
        org.apache.commons.io.FileUtils.deleteDirectory(spanOut)
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
      org.apache.commons.io.FileUtils.deleteDirectory(dir2)
      org.apache.commons.io.FileUtils.deleteDirectory(stateDir)
    }
  }

  test("lineage marker closes the batch-0 blind spot: a NEW checkpoint " +
      "lineage against a ONE-batch-old state dir fails loudly instead of " +
      "silently skipping its batch 0 as a retry") {
    import graft.operators.TextAnalysis
    // prior run commits exactly ONE batch → stored max slot is 0, the
    // single collision the slot gate cannot distinguish from a batch-0
    // retry; before round 10 this silently dropped the new lineage's
    // first batch
    val dir = Files.createTempDirectory("graft-lin0").toFile
    val dir2 = Files.createTempDirectory("graft-lin0-b").toFile
    val stateDir = Files.createTempDirectory("graft-lin0-state").toFile
    val outDir = Files.createTempDirectory("graft-lin0-out").toFile
    val docs = Tables(spark, sf("0.001")).documents.select("doc_id", "text")
    docs.filter(col("doc_id") < 100).coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    docs.filter(col("doc_id") >= 100 && col("doc_id") < 160).coalesce(1)
      .write.mode("append").parquet(dir2.getPath)
    try {
      def stream(d: java.io.File) = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(d.getPath)
      val q1 = StreamOps.streamingSpanDedup(stream(dir), stateDir.getPath,
        outDir.getPath, n = 8)
      q1.processAllAvailable(); q1.stop()
      assert(TextAnalysis.committedSpanDfSlots(spark, stateDir.getPath)
        == Seq(0L), "fixture invariant: exactly one committed batch")
      assert(new java.io.File(stateDir, "_LINEAGE").exists())
      val q2 = StreamOps.streamingSpanDedup(stream(dir2), stateDir.getPath,
        outDir.getPath, n = 8)
      val e = intercept[Throwable] { q2.processAllAvailable() }
      q2.stop()
      assert(causeMessages(e).exists(_.contains("checkpoint lineage")),
        causeMessages(e))
      // nothing was dropped OR written for the rejected lineage
      assert(outDir.listFiles.count(_.getName.startsWith("cleaned-")) == 1)
      assert(TextAnalysis.committedSpanDfSlots(spark, stateDir.getPath)
        == Seq(0L))
      // and the ORIGINAL lineage still replays cleanly: a same-lineage
      // retry (same query id via the same checkpoint) is not affected —
      // pinned at the marker level by re-checking the stored id is q1's
      val stored = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(stateDir, "_LINEAGE").toPath), "UTF-8").trim
      assert(stored == q1.id.toString, s"stored=$stored q1=${q1.id}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
      org.apache.commons.io.FileUtils.deleteDirectory(dir2)
      org.apache.commons.io.FileUtils.deleteDirectory(stateDir)
      org.apache.commons.io.FileUtils.deleteDirectory(outDir)
    }
  }

  test("streaming index maintenance: in-distribution batches append as " +
      "batch-id delta slots, replays skip, drifted batches quarantine") {
    import spark.implicits._
    import graft.operators.Similarity
    val dir = Files.createTempDirectory("graft-idx-stream").toFile
    val idxDir = Files.createTempDirectory("graft-idx-state").toFile
    val emb = Tables(spark, sf("0.001")).embeddings
      .select("vec_id", "embedding")
    val base = emb.filter(col("vec_id") % 2 === 0)
    val idx = Similarity.buildIvfPqIndex(base, numLists = 3, m = 4,
      ksub = 8, sampleN = 64)
    Similarity.saveIvfPqIndex(idx, idxDir.getPath)
    // two in-distribution delivery files, then one shifted file
    val odd = emb.filter(col("vec_id") % 2 =!= 0)
    odd.filter(col("vec_id") % 4 === 1).coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    Thread.sleep(1100)
    odd.filter(col("vec_id") % 4 === 3).coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    Thread.sleep(1100)
    (0 until 20).map { i =>
      val v = Array.fill(64)(0.0f); v(60) = 50.0f; v(61) = 0.01f * i
      (9000L + i, v)
    }.toDF("vec_id", "embedding").coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    try {
      def stream() = spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false").parquet(dir.getPath)
      val q = StreamOps.streamingIndexMaintenance(stream(), idxDir.getPath,
        base, maxShareDelta = 0.5)
      q.processAllAvailable(); q.stop()
      // batches 0/1 appended at their batch-id slots; batch 2 quarantined
      assert(new java.io.File(idxDir, "codes-delta-0/_SUCCESS").exists())
      assert(new java.io.File(idxDir, "codes-delta-1/_SUCCESS").exists())
      assert(!new java.io.File(idxDir, "codes-delta-2").exists())
      assert(new java.io.File(idxDir, "pending-2").exists() &&
        new java.io.File(idxDir, "drift-report-2").exists())
      // served view equals the frozen-params full encode over base ∪ odd
      def codeMap(codes: org.apache.spark.sql.DataFrame) = codes.collect()
        .map(r => r.getAs[Long]("vec_id") ->
          (r.getAs[Int]("list_id"), r.getAs[Array[Byte]]("code").toSeq)).toMap
      assert(codeMap(Similarity.loadIvfPqIndex(spark, idxDir.getPath).codes) ==
        codeMap(Similarity.encodeIvfPq(base.unionByName(odd),
          idx.centroids, idx.codebooks)))
      // the quarantined report names the breach; pending holds the vectors
      val rep = spark.read.parquet(s"${idxDir.getPath}/drift-report-2")
      assert(rep.filter(col("del_n") > 0).count() > 0)
      assert(spark.read.parquet(s"${idxDir.getPath}/pending-2").count() == 20)
      // a fresh query without a checkpoint re-fires batch ids from 0 —
      // indistinguishable from a NEW lineage pointed at the old index,
      // where a membership skip would silently drop genuinely new data
      // whose ids collide with the dense retained slots. The host
      // fails loudly (resume the checkpoint, or use a fresh index) and
      // leaves the stored deltas byte-untouched.
      val mtimes = idxDir.listFiles
        .filter(_.getName.startsWith("codes-delta"))
        .map(f => f.getName -> f.lastModified).toMap
      val q2 = StreamOps.streamingIndexMaintenance(stream(), idxDir.getPath,
        base, maxShareDelta = 0.5)
      val e2 = intercept[Throwable] { q2.processAllAvailable() }
      q2.stop()
      assert(causeMessages(e2).exists(_.contains("checkpoint lineage")),
        causeMessages(e2))
      val after = idxDir.listFiles
        .filter(_.getName.startsWith("codes-delta"))
        .map(f => f.getName -> f.lastModified).toMap
      assert(after == mtimes, s"$mtimes -> $after")
      assert(!new java.io.File(idxDir, "codes-delta-2").exists())
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
      org.apache.commons.io.FileUtils.deleteDirectory(idxDir)
    }
  }

  test("streaming decontamination: broadcast digest guard streams unchanged") {
    // the benchmark side is batch (broadcast digests); the corpus side
    // streams — the guard a pipeline runs on every incoming delivery
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-decon-stream").toFile
    val docs = Tables(spark, sf("0.001")).documents.select("doc_id", "text")
    val benchmark = docs.filter(col("doc_id") % 7 === 0)
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    Thread.sleep(1100)
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    try {
      val streamed = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(dir.getPath)
      val q = graft.operators.Dedup.decontaminate(streamed, benchmark)
        .writeStream.outputMode("append").format("memory")
        .queryName("tdecon").start()
      q.processAllAvailable(); q.stop()
      val s = spark.table("tdecon").collect().map(_.getLong(0)).sorted.toSeq
      val b = graft.operators.Dedup.decontaminate(docs, benchmark)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(s == b && s.nonEmpty)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("streaming blocklist + compression ratio: row-local kernels stream unchanged") {
    // the Aho–Corasick automaton and the Deflater kernel are row-local
    // references on the plan — the SAME operator definitions run on a
    // file stream with append semantics
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-blocklist-stream").toFile
    val docs = Tables(spark, sf("0.001")).documents.select("doc_id", "text")
    val pats = Seq("window window", "vector join")
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    Thread.sleep(1100)
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    try {
      val streamed = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(dir.getPath)
      val q = graft.operators.Curation.blocklistMatches(streamed, pats)
        .withColumn("ratio",
          round(graft.functions.CurationFunctions.deflate_ratio(lit("aaaa")), 2))
        .writeStream.outputMode("append").format("memory")
        .queryName("tblock").start()
      q.processAllAvailable(); q.stop()
      val s = spark.table("tblock").collect().map(_.toString).sorted.toSeq
      val b = graft.operators.Curation.blocklistMatches(docs, pats)
        .withColumn("ratio",
          round(graft.functions.CurationFunctions.deflate_ratio(lit("aaaa")), 2))
        .collect().map(_.toString).sorted.toSeq
      assert(s == b && s.nonEmpty)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("streaming classifier scoring: stateless scoring pass streams unchanged") {
    // train once batch-side (the model artifact), then the SAME scoring
    // definition runs over a file stream with append semantics
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cls-stream").toFile
    val docs = Tables(spark, sf("0.001")).documents
      .select("doc_id", "text", "source")
    val w = graft.operators.TextAnalysis.trainClassifier(docs,
      col("source") === "src0")
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    Thread.sleep(1100)
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    try {
      val streamed = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(dir.getPath)
      val q = graft.operators.TextAnalysis.scoreWithClassifier(streamed, w)
        .writeStream.outputMode("append").format("memory")
        .queryName("tcls").start()
      q.processAllAvailable(); q.stop()
      val s = spark.table("tcls").collect().map(_.toString).sorted.toSeq
      val b = graft.operators.TextAnalysis.scoreWithClassifier(docs, w)
        .collect().map(_.toString).sorted.toSeq
      assert(s == b && s.nonEmpty)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("stream-stream correlation join equals the batch range join") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sscorr").toFile
    val ev = Tables(spark, sf("0.001"))
      .events.select("event_id", "ts", "user_id", "event_type")
    // chronological file split: with watermark (2h) > join bound (1h),
    // no cross-file pair can be dropped by state eviction, so streaming
    // must reproduce the batch join exactly
    // NTZ-safe: testdata parquet may read `ts` as TIMESTAMP_NTZ, which
    // rejects a direct cast to BIGINT — hop through TIMESTAMP first
    // (same pattern as the engine's q65 range join, Relational.scala).
    val tsLong = col("ts").cast("timestamp").cast("long")
    val median = ev.agg(expr("percentile(cast(cast(ts as timestamp) as long), 0.5)")).head().getDouble(0)
    ev.filter(tsLong <= median).coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    Thread.sleep(1100)
    ev.filter(tsLong > median).coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    try {
      val src = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(dir.getPath)
      val q = StreamOps.correlatedPairs(src, src)
        .writeStream.outputMode("append").format("memory")
        .queryName("sscorr").start()
      q.processAllAvailable(); q.stop()
      val streamed = spark.table("sscorr").collect().map(_.toString).sorted.toSeq
      val batch = StreamOps.correlatedPairs(ev, ev)
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch && batch.nonEmpty)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("stateful sessionizer emits each session exactly once (emit-on-close + timeout)") {
    import spark.implicits._
    import java.sql.Timestamp
    def ev(id: Long, t: String) =
      (id, Timestamp.valueOf(t), 1L, "click", 1.0, "{}")
    val dir = Files.createTempDirectory("graft-sess").toFile
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    def write(evs: (Long, Timestamp, Long, String, Double, String)*): Unit = {
      evs.toSeq.toDF(cols: _*).coalesce(1).write.mode("append").parquet(dir.getPath)
      Thread.sleep(2100)
    }
    // session 1: two events within the 30-min gap
    write(ev(0, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:10:00"))
    // gap elapsed → closes session 1 INLINE, opens session 2
    write(ev(2, "2024-01-01 12:00:00"))
    // pushes the watermark (2 h) past session 2's close → TIMEOUT flush;
    // its own session stays open, never emitted
    write(ev(3, "2024-01-01 16:00:00"))
    try {
      val streamed = spark.readStream.schema(StructType_events)
        .option("maxFilesPerTrigger", 1).parquet(dir.getPath)
      val q = StreamOps.statefulSessionCounts(spark, streamed).toDF().writeStream
        .outputMode("append").format("memory").queryName("tsess").start()
      q.processAllAvailable(); q.stop()
      val emitted = spark.table("tsess").collect()
        .map(r => (r.getLong(1), r.getLong(2))).toSeq
      def s(t: String) = Timestamp.valueOf(t).getTime / 1000
      // exactly-once: no (user, session_start) appears twice
      assert(emitted.distinct.size == emitted.size, s"duplicates: $emitted")
      assert(emitted.toSet == Set((s("2024-01-01 10:00:00"), 2L),
        (s("2024-01-01 12:00:00"), 1L)), s"emitted=$emitted")
      // batch execution of the SAME definition also reports the
      // still-open trailing session
      val batch = StreamOps.statefulSessionCounts(spark,
          spark.read.parquet(dir.getPath))
        .collect().map(o => (o.session_start, o.n)).toSet
      assert(batch == emitted.toSet + ((s("2024-01-01 16:00:00"), 1L)))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("streaming cluster labels: served labels equal batch CC over " +
      "every pair ingested so far — deltas store only the tiny remap + " +
      "first-seen nodes, remaps CHAIN across slots, compaction folds " +
      "to one snapshot") {
    import graft.operators.Dedup
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-lab-stream").toFile
    val stateDir = Files.createTempDirectory("graft-lab-state").toFile
    val schema = Seq((0L, 0L)).toDF("keeper_id", "doc_id").schema
    // batch 0 (base snapshot): components {1,2} and {5,6}
    Seq((1L, 2L), (5L, 6L)).toDF("keeper_id", "doc_id").coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    Thread.sleep(1100)
    // batch 1: merge the two components, attach a new node, fresh pair
    Seq((2L, 5L), (6L, 10L), (20L, 21L))
      .toDF("keeper_id", "doc_id").coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    Thread.sleep(1100)
    // batch 2: new SMALLER ids become both components' minima — the
    // slot-2 remap (1 -> 0) must chain onto slot 1's (5 -> 1) when the
    // base rows for nodes 5/6 are served
    Seq((10L, 0L), (21L, 3L)).toDF("keeper_id", "doc_id").coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    Thread.sleep(1100)
    // batch 3: fresh pair; compactEvery = 4 folds everything here
    Seq((100L, 101L)).toDF("keeper_id", "doc_id").coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    val allEdges = Seq((1L, 2L), (5L, 6L), (2L, 5L), (6L, 10L),
      (20L, 21L), (10L, 0L), (21L, 3L), (100L, 101L))
      .toDF("doc_id_a", "doc_id_b")
    try {
      val streamed = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false").parquet(dir.getPath)
      val q = StreamOps.streamingClusterLabels(streamed, stateDir.getPath,
        compactEvery = 4)
      q.processAllAvailable(); q.stop()
      val served = Dedup.loadLabelIndex(spark, stateDir.getPath)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = Dedup.connectedComponents(allEdges)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(served == batch,
        s"served-only ${served -- batch}; batch-only ${batch -- served}")
      // node 5's label chained through TWO remaps: 5 ->(slot1) 1
      // ->(slot2) 0
      assert(served.contains((5L, 0L)) && served.contains((21L, 3L)),
        served)
      // compaction at slot 3 folded to ONE snapshot and swept the rest
      assert(Dedup.committedLabelSlots(spark, stateDir.getPath)
        .sorted == Seq(3L))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
      org.apache.commons.io.FileUtils.deleteDirectory(stateDir)
    }
  }

  test("streaming cluster labels: pre-compaction deltas are O(delta) — " +
      "one remap row per merge, new/ holds only first-seen nodes, the " +
      "base is never rewritten") {
    import graft.operators.Dedup
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-lab-delta").toFile
    val stateDir = Files.createTempDirectory("graft-lab-delta-state").toFile
    val schema = Seq((0L, 0L)).toDF("keeper_id", "doc_id").schema
    Seq((1L, 2L), (5L, 6L)).toDF("keeper_id", "doc_id").coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    Thread.sleep(1100)
    Seq((2L, 5L), (6L, 10L), (20L, 21L))
      .toDF("keeper_id", "doc_id").coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    try {
      val streamed = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false").parquet(dir.getPath)
      val q = StreamOps.streamingClusterLabels(streamed, stateDir.getPath,
        compactEvery = 64)
      q.processAllAvailable(); q.stop()
      val remap1 = spark.read
        .parquet(s"${stateDir.getPath}/lab-delta-1/remap")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(remap1 == Set((5L, 1L)), remap1) // ONE merge -> one row
      val new1 = spark.read
        .parquet(s"${stateDir.getPath}/lab-delta-1/new")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(new1 == Set((10L, 1L), (20L, 20L), (21L, 20L)), new1)
      // the base snapshot was not rewritten: slot 0 still serves the
      // original four rows
      val base = spark.read
        .parquet(s"${stateDir.getPath}/lab-snap-0/new")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(base == Set((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L)), base)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
      org.apache.commons.io.FileUtils.deleteDirectory(stateDir)
    }
  }

  test("streaming video dedup: a re-muxed re-delivery pairs its stored " +
      "original at full frame overlap, a redelivered ID is a " +
      "first-arrival no-op, survivors extend the frame index, " +
      "compaction folds to one snapshot") {
    import graft.operators.Multimodal
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-vid-stream").toFile
    val stateDir = Files.createTempDirectory("graft-vid-state").toFile
    val outDir = Files.createTempDirectory("graft-vid-out").toFile
    def avi(text: String) = Multimodal.textToAvi(text)
    val a = avi("the first distinct synthetic video payload alpha")
    val b = avi("a second entirely different clip beta content")
    val c = avi("third novel material gamma for the survivor row")
    def rows(rs: (Long, Array[Byte])*) =
      rs.map { case (id, bytes) =>
        Multimodal.MediaRow(id, "video/avi", bytes, Map.empty)
      }.toDS().toDF()
    rows((100L, a), (101L, b)).coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    Thread.sleep(1100)
    // batch 1: a re-muxed copy of A under a new smaller id (same JPEG
    // frames, different container timing — full overlap), the SAME id
    // 100 redelivered (first-arrival no-op), and a novel survivor
    rows((5L, Multimodal.remuxAvi(a, fps = 8)), (100L, a), (400L, c))
      .coalesce(1).write.mode("append").parquet(dir.getPath)
    try {
      val schema = rows((0L, a)).schema
      val streamed = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false").parquet(dir.getPath)
      val q = StreamOps.streamingVideoDedup(streamed, stateDir.getPath,
        outDir.getPath, compactEvery = 2)
      q.processAllAvailable(); q.stop()
      val p0 = spark.read.parquet(s"${outDir.getPath}/pairs-0").collect()
      assert(p0.isEmpty, p0.toSeq)
      val p1 = spark.read.parquet(s"${outDir.getPath}/pairs-1")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(p1.map(p => (p._1, p._2)) == Set((100L, 5L)), p1)
      assert(!p1.exists(_._2 == 100L), p1) // same-id replay: no pair
      // survivors: 400; compaction at batch 1 folded to ONE snapshot
      assert(Multimodal.committedVideoSlots(spark, stateDir.getPath)
        .sorted == Seq(1L))
      val ids = Multimodal.loadVideoIndex(spark, stateDir.getPath)
        .select("id").distinct().collect().map(_.getLong(0)).toSet
      assert(ids == Set(100L, 101L, 400L), ids)
      // df additivity: the summed pruned dfs equal the index's counts
      val idx = Multimodal.loadVideoIndex(spark, stateDir.getPath)
      val dfs = Multimodal.loadVideoDfsFor(spark, stateDir.getPath, idx)
      assert(dfs.agg(org.apache.spark.sql.functions.sum("df"))
        .collect().head.getLong(0) == idx.count())
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
      org.apache.commons.io.FileUtils.deleteDirectory(stateDir)
      org.apache.commons.io.FileUtils.deleteDirectory(outDir)
    }
  }

  test("streaming minhash dedup: content re-deliveries pair their " +
      "stored originals chronologically, a redelivered ID is a " +
      "first-arrival no-op, survivors extend the signature index, the " +
      "signing family locks the state dir, compaction folds to one " +
      "snapshot") {
    import graft.operators.Dedup
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mh-stream").toFile
    val stateDir = Files.createTempDirectory("graft-mh-state").toFile
    val outDir = Files.createTempDirectory("graft-mh-out").toFile
    val longA = (1 to 30).map(i => s"tok$i").mkString(" ")
    val longB = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val longC = (1 to 30).map(i => s"beta$i").mkString(" ")
    val novelD = (1 to 30).map(i => s"gamma$i").mkString(" ")
    val novelE = (1 to 30).map(i => s"delta$i").mkString(" ")
    val schema = Seq((0L, "")).toDF("doc_id", "text").schema
    Seq((100L, longA), (101L, longB), (102L, longC))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    Thread.sleep(1100)
    // batch 1: smaller-id content redelivery of longA (loses to stored
    // 100); SAME id 100 redelivered (first-arrival no-op); a light
    // edit of longB (banded near dup of 101); a novel text twice
    // (id-min within); a novel survivor
    Seq((5L, longA), (100L, longA), (200L, longB + " v2"),
      (201L, novelD), (300L, novelD), (400L, novelE))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    try {
      val streamed = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false").parquet(dir.getPath)
      val q = StreamOps.streamingMinHashDedup(streamed, stateDir.getPath,
        outDir.getPath, compactEvery = 2)
      q.processAllAvailable(); q.stop()
      val p0 = spark.read.parquet(s"${outDir.getPath}/pairs-0")
        .collect()
      assert(p0.isEmpty, p0.toSeq)
      val p1 = spark.read.parquet(s"${outDir.getPath}/pairs-1")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(p1.map(p => (p._1, p._2)) == Set(
        (100L, 5L),   // stored longA beats the smaller-id redelivery
        (101L, 200L), // banded near dup of the light edit
        (201L, 300L)  // within-batch novel pair, id-min keeper
      ), p1)
      assert(p1.forall(_._3 >= 0.5), p1)
      assert(p1.exists(p => p._2 == 5L && p._3 == 1.0), p1)
      assert(!p1.exists(_._2 == 100L), p1) // same-id replay: no pair
      assert(Dedup.committedMinHashSlots(spark, stateDir.getPath)
        .sorted == Seq(1L))
      val ids = Dedup.loadMinHashIndex(spark, stateDir.getPath)
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(100L, 101L, 102L, 201L, 400L), ids)
      // per-delta band counts sum to the index's true band histogram
      val over0 = Dedup.loadMinHashOverCapFor(spark, stateDir.getPath,
        Dedup.loadMinHashIndex(spark, stateDir.getPath), maxBucket = 0L)
      assert(over0.count() > 0) // every occupied probed band > cap 0
      // the signing family is FROZEN: other parameters fail loudly
      intercept[IllegalArgumentException] {
        Dedup.requireIndexMeta(spark, stateDir.getPath,
          "shingle=2 numHashes=64 bands=16", "minhash index")
      }
      Dedup.requireIndexMeta(spark, stateDir.getPath,
        "shingle=3 numHashes=64 bands=16", "minhash index")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
      org.apache.commons.io.FileUtils.deleteDirectory(stateDir)
      org.apache.commons.io.FileUtils.deleteDirectory(outDir)
    }
  }

  test("streaming winnow dedup: content re-deliveries pair their stored " +
      "originals chronologically, a redelivered ID is a first-arrival " +
      "no-op, survivors extend the postings index, compaction folds to " +
      "one snapshot") {
    import graft.operators.Dedup
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-win-stream").toFile
    val stateDir = Files.createTempDirectory("graft-win-stream-state").toFile
    val outDir = Files.createTempDirectory("graft-win-stream-out").toFile
    val longA = (1 to 30).map(i => s"tok$i").mkString(" ")
    val longB = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val longC = (1 to 30).map(i => s"beta$i").mkString(" ")
    val novelD = (1 to 30).map(i => s"gamma$i").mkString(" ")
    val novelE = (1 to 30).map(i => s"delta$i").mkString(" ")
    val schema = Seq((0L, "")).toDF("doc_id", "text").schema
    // batch 0: three distinct keepers
    Seq((100L, longA), (101L, longB), (102L, longC))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    Thread.sleep(1100)
    // batch 1: a SMALLER-id content redelivery of longA (chronology:
    // loses to stored 100), the SAME id 100 redelivered (first-arrival:
    // pairs nothing, never re-enters), a novel text arriving twice
    // (id-min within the batch), and a novel survivor
    Seq((5L, longA), (100L, longA), (201L, novelD), (300L, novelD),
      (400L, novelE))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    try {
      val streamed = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false").parquet(dir.getPath)
      // compactEvery = 2: batch 1 folds the index into its snapshot
      val q = StreamOps.streamingWinnowDedup(streamed, stateDir.getPath,
        outDir.getPath, compactEvery = 2)
      q.processAllAvailable(); q.stop()
      val p0 = spark.read.parquet(s"${outDir.getPath}/pairs-0")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(p0.isEmpty, p0) // three distinct texts, no pair
      val p1 = spark.read.parquet(s"${outDir.getPath}/pairs-1")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(p1.map(p => (p._1, p._2)) == Set(
        (100L, 5L),   // stored longA beats the smaller-id redelivery
        (201L, 300L)  // within-batch novel pair, id-min keeper
      ), p1)
      assert(p1.forall(_._3 >= 3L), p1)
      // the SAME-id redelivery of 100 appears on NEITHER side of any
      // pair: a replay is not a duplicate
      assert(!p1.exists(_._2 == 100L), p1)
      // survivors: 201 (within-batch keeper) + 400 (novel); the
      // compaction at batch 1 folded everything into ONE snapshot
      assert(Dedup.committedPostingsSlots(spark, stateDir.getPath)
        .sorted == Seq(1L))
      val idx = Dedup.loadPostingsIndex(spark, stateDir.getPath)
      val ids = idx.select("doc_id").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(100L, 101L, 102L, 201L, 400L), ids)
      // first-arrival kept the state duplicate-free: no (doc_id, fph)
      // row appears twice (a re-entered id would double its postings
      // and inflate every later shared count)
      assert(idx.count() == idx.distinct().count())
      // the per-part df tables sum to the index's true df per key
      val dfs = Dedup.loadPostingsDfsFor(spark, stateDir.getPath,
        idx.select("fph"))
      assert(dfs.agg(sum("df")).collect().head.getLong(0) == idx.count())
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
      org.apache.commons.io.FileUtils.deleteDirectory(stateDir)
      org.apache.commons.io.FileUtils.deleteDirectory(outDir)
    }
  }

  test("streaming quality gate: batches score through the ONNX graph " +
      "row-locally and idempotently, and the model identity locks the " +
      "state dir — a different model/threshold fails loudly") {
    import graft.pipeline.Onnx
    import graft.operators.Dedup
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-gate-stream").toFile
    val stateDir = Files.createTempDirectory("graft-gate-state").toFile
    val outDir = Files.createTempDirectory("graft-gate-out").toFile
    // score = relu(0.5*x1 - 0.25*x2 + 2) - 0.25 (dyadic: float exact)
    val model = Onnx.buildDenseModel(2, Seq(
      Onnx.Dense(Array(0.5f, -0.25f), 1, Array(2f), "Relu"),
      Onnx.Dense(Array(1.0f), 1, Array(-0.25f), "")))
    def score(x1: Double, x2: Double): Double =
      math.max(0, 0.5 * x1 - 0.25 * x2 + 2) - 0.25
    val schema = Seq((0L, 0L, 0L)).toDF("doc_id", "x1", "x2").schema
    Seq((0L, 10L, 4L), (1L, 0L, 100L)).toDF("doc_id", "x1", "x2")
      .coalesce(1).write.mode("append").parquet(dir.getPath)
    Thread.sleep(1100)
    Seq((2L, 7L, 7L), (3L, 1L, 1L)).toDF("doc_id", "x1", "x2")
      .coalesce(1).write.mode("append").parquet(dir.getPath)
    try {
      def start() = StreamOps.streamingQualityGate(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .option("latestFirst", "false").parquet(dir.getPath),
        model, Seq("x1", "x2"), threshold = 1.0, stateDir.getPath,
        outDir.getPath)
      val q = start()
      q.processAllAvailable(); q.stop()
      val rows = (0 to 1).flatMap { b =>
        spark.read.parquet(s"${outDir.getPath}/scored-$b")
          .select("doc_id", "x1", "x2", "score", "pass")
          .as[(Long, Long, Long, Double, Boolean)].collect()
      }.sortBy(_._1)
      assert(rows.map(_._1) == Seq(0L, 1L, 2L, 3L))
      rows.foreach { case (_, x1, x2, s, p) =>
        assert(s == score(x1, x2), s"score($x1,$x2)")
        assert(p == (s >= 1.0))
      }
      assert(rows.count(_._5) == 3, rows) // 0 (5.75), 2 (3.5), 3 (2.0) pass
      // the model identity froze at first batch: a host restarted with a
      // DIFFERENT threshold (or model bytes / feature list) fails loudly
      // on the META gate. The checkpoint-lineage gate fires even earlier
      // for a brand-new query id, so this test takes the documented
      // recovery step (delete _LINEAGE) to expose the meta assert.
      new java.io.File(stateDir, "_LINEAGE").delete()
      val q2 = StreamOps.streamingQualityGate(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(dir.getPath),
        model, Seq("x1", "x2"), threshold = 0.5, stateDir.getPath,
        outDir.getPath)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      q2.stop()
      assert(causeMessages(e).exists(_.contains("quality-gate model")),
        causeMessages(e))
      // same model/threshold: replay is idempotent — the re-run
      // overwrites each scored-<batch> dir with identical content
      new java.io.File(stateDir, "_LINEAGE").delete()
      val q3 = start()
      q3.processAllAvailable(); q3.stop()
      val rows2 = (0 to 1).flatMap { b =>
        spark.read.parquet(s"${outDir.getPath}/scored-$b")
          .select("doc_id", "x1", "x2", "score", "pass")
          .as[(Long, Long, Long, Double, Boolean)].collect()
      }.sortBy(_._1)
      assert(rows2 == rows, s"replay changed output: $rows2 vs $rows")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
      org.apache.commons.io.FileUtils.deleteDirectory(stateDir)
      org.apache.commons.io.FileUtils.deleteDirectory(outDir)
    }
  }

  test("requireIndexMeta first write is atomic: a crashed first-writer's " +
      "temp file is invisible, the frozen meta comes from a completed " +
      "rename, and restarts assert against it") {
    import graft.operators.Dedup
    val dir = Files.createTempDirectory("graft-meta-torn").toFile
    try {
      // a first-writer crashed mid-write: short garbage at a TEMP path
      // (the only place an in-flight write can exist under temp+rename)
      java.nio.file.Files.write(
        new java.io.File(dir, ".idx-meta.tmp-deadbeef").toPath,
        "torn".getBytes("UTF-8"))
      // restart freezes the real meta via its own temp+rename — the
      // stale temp neither blocks the write nor masquerades as the meta
      Dedup.requireIndexMeta(spark, dir.getPath,
        "shingle=3 numHashes=64 bands=16", "minhash index")
      // idempotent re-assert, then a foreign family fails loudly
      Dedup.requireIndexMeta(spark, dir.getPath,
        "shingle=3 numHashes=64 bands=16", "minhash index")
      intercept[IllegalArgumentException] {
        Dedup.requireIndexMeta(spark, dir.getPath,
          "shingle=2 numHashes=64 bands=16", "minhash index")
      }
      val stored = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, "idx-meta").toPath), "UTF-8")
      assert(stored == "shingle=3 numHashes=64 bands=16", stored)
      // the embedding wrapper delegates to the SAME file — one meta,
      // two entry points
      Dedup.requireEmbeddingMeta(spark, dir.getPath,
        "shingle=3 numHashes=64 bands=16")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  test("streaming signature dedup under heavy duplication: a batch of " +
      "identical signatures pairs the stored keeper AND itself (doc ids " +
      "repeat across pair rows), survivors anti-join on DISTINCT ids, " +
      "the index gains nothing") {
    import graft.operators.Dedup
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sig-heavy").toFile
    val stateDir = Files.createTempDirectory("graft-sig-heavy-state").toFile
    val outDir = Files.createTempDirectory("graft-sig-heavy-out").toFile
    val sigA = 0x1111222233334444L
    val schema = Seq((0L, 0L, true)).toDF("doc_id", "sig64", "decoded").schema
    Seq((100L, sigA, true))
      .toDF("doc_id", "sig64", "decoded").coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    Thread.sleep(1100)
    // the host's target case: heavy duplication — ten byte-identical
    // redeliveries in one batch. Every one pairs the stored keeper
    // (across) and the nine non-min ones pair within the batch too, so
    // pair rows per doc id are >1: the survivor anti-join's broadcast
    // build side must be the DISTINCT dropped ids (pair-count rows
    // would scale with duplication², the exact case the host exists
    // for), and a doc paired twice must still be dropped exactly once.
    val heavy = (200L to 209L).map(i => (i, sigA, true))
    heavy.toDF("doc_id", "sig64", "decoded").coalesce(1)
      .write.mode("append").parquet(dir.getPath)
    try {
      val streamed = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false").parquet(dir.getPath)
      val q = StreamOps.streamingSignatureDedup(streamed, stateDir.getPath,
        outDir.getPath, compactEvery = 64)
      q.processAllAvailable(); q.stop()
      val p1 = spark.read.parquet(s"${outDir.getPath}/pairs-1")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      // every delivery doc pairs the stored keeper
      assert((200L to 209L).forall(d => p1.contains((100L, d))), p1)
      // and doc ids DO repeat across pair rows (within-batch pairs on
      // top of the across ones) — the distinct-build precondition
      val perDoc = p1.groupBy(_._2).map(_._2.size)
      assert(perDoc.exists(_ > 1), p1)
      // dropped exactly once each: the index still holds ONLY the keeper
      val ids = Dedup.loadSignatureIndex(spark, stateDir.getPath)
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(100L), ids)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
      org.apache.commons.io.FileUtils.deleteDirectory(stateDir)
      org.apache.commons.io.FileUtils.deleteDirectory(outDir)
    }
  }

  test("streaming crawl curation: WARC batches merge the URL keeper " +
      "set and fold the funnel — parity with the batch chain, keeper " +
      "eviction is append-only for the corpus") {
    import spark.implicits._
    import graft.operators.Curation
    import graft.sources.WarcReader
    val archiveDir = Files.createTempDirectory("graft-crawl-arch").toFile
    val stateDir = Files.createTempDirectory("graft-crawl-state").toFile
    // equal-length payloads (fixed-width tokens + stopwords) so the
    // frozen quality bounds collapse to lo==hi==L: batch-2 docs at L
    // pass, a LONGER doc fails as too_long
    def pay(tag: String, n: Int = 30) =
      (1 to n).flatMap(j => Seq("the", f"$tag%sx$j%03d")).mkString(" ")
    def html(t: String) = s"<html><body><p>$t</p></body></html>"
    val urlA = "https://d1.example/article/a"
    val urlC = "https://other.example/article/c"
    val urlD = "https://d1.example/article/d" // longer: evicts A
    val urlE = "https://e.example/article/e"
    val urlF = "https://f.example/ads/f" // path-blocked
    val date = "2026-02-01T00:00:00Z"
    val arch1 = WarcReader.buildWarcGz("a", Seq(
      (urlA, date, html(pay("a000"))),
      (urlC, date, html(pay("c000")))))
    val arch2 = WarcReader.buildWarcGz("b", Seq(
      (urlD, date, html(pay("d000", n = 40))),
      (urlE, date, html(pay("e000"))),
      (urlF, date, html(pay("f000")))))
    try {
      java.nio.file.Files.write(
        new java.io.File(archiveDir, "a.warc.gz").toPath, arch1)
      val benchmark = Seq((900L, "nothing matches this benchmark text"))
        .toDF("doc_id", "text")
      val pats = Seq("no blocklist phrase fires")
      val q = StreamOps.streamingCrawlCuration(spark,
        archiveDir.getPath, stateDir.getPath, benchmark, pats,
        blockedDomains = Set("bad.example"),
        blockedPathPrefixes = Seq("/ads/"), capPerDomain = 1,
        maxFilesPerTrigger = 1)
      try {
        q.processAllAvailable()
        Thread.sleep(1100) // distinct mtime for the second archive
        java.nio.file.Files.write(
          new java.io.File(archiveDir, "b.warc.gz").toPath, arch2)
        q.processAllAvailable()
      } finally q.stop()
      // url -> doc_id map off the same extraction the stream ran
      def extract(bytes: Array[Byte], name: String) =
        WarcReader.textDocuments(spark.createDataFrame(
          spark.sparkContext.parallelize(
            WarcReader.recordsOfBytes(name, bytes))))
      val ex1 = extract(arch1, "a.warc.gz")
      val ex2 = extract(arch2, "b.warc.gz")
      val idOf = (ex1.unionByName(ex2)).select("url", "doc_id")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // keeper state: D evicted A on d1.example; E entered; F blocked
      val keepers = spark.read.parquet(s"${stateDir.getPath}/urlkeep-1")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(keepers == Set(idOf(urlD), idOf(urlC), idOf(urlE)), keepers)
      // funnel survivors: A retained (append-only), D dropped by the
      // frozen too_long bound, E in, F never entered
      val got = StreamOps.curationFunnelState(spark, stateDir.getPath)
      val surv = got.survivors.select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(surv == Set(idOf(urlA), idOf(urlC), idOf(urlE)), surv)
      // parity with the hand-chained batch APIs over the same batches
      val keep1 = Curation.urlCuration(ex1, Set("bad.example"),
        Seq("/ads/"), 1)
      val kept1 = ex1.join(keep1.select("doc_id"), Seq("doc_id"),
        "left_semi")
      val s0 = Curation.initialFunnelState(kept1, benchmark, pats)
      val stored = keep1.join(ex1.select("doc_id", "n_chars"),
        Seq("doc_id")).select("doc_id", "domain", "n_chars")
      val merged = Curation.urlCurationMerge(stored, ex2,
        Set("bad.example"), Seq("/ads/"), 1)
      val entered2 = ex2.join(merged.select("doc_id"), Seq("doc_id"),
        "left_semi")
      val (s1, _) = Curation.incrementalFunnel(s0, entered2, benchmark,
        pats)
      val wantSurv = s1.survivors.select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(surv == wantSurv, s"$surv vs $wantSurv")
      assert(got.lenLo == s1.lenLo && got.lenHi == s1.lenHi)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(archiveDir)
      org.apache.commons.io.FileUtils.deleteDirectory(stateDir)
    }
  }
}
