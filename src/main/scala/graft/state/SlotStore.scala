package graft.state

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** THE slotted-state lifecycle — one implementation of the
  * commit/replay/supersede/sweep discipline shared by every persisted
  * incremental-state host (the curation funnel's versioned survivor
  * state, the IVF-PQ index's codes-deltas + tombstones, the span-dedup
  * gram-df index). Round 9 kept three hand-synchronized copies of
  * these rules; they now live here and the hosts are thin clients, so
  * the next lifecycle change cannot make them diverge.
  *
  * The contract every host shares:
  *
  *   - a state dir holds parts named `<prefix>-<slot>`; a part is
  *     COMMITTED iff its commit marker exists (parquet `_SUCCESS` by
  *     default; a multi-table version dir commits via its LAST-written
  *     sub-table's marker). Torn dirs (no marker) are invisible to
  *     readers and overwritten by the writer's retry.
  *   - slots are monotone per state dir (streaming hosts use batch
  *     ids). Explicit slots make at-least-once replays idempotent:
  *     a replayed slot `overwrite`s its own dirs byte-identically.
  *   - a SNAPSHOT part at slot k supersedes every part with slot ≤ k
  *     by construction — readers serve the latest snapshot plus later
  *     deltas, so deleting superseded dirs is housekeeping and a crash
  *     between a snapshot's marker and the sweep cannot double-count.
  *   - a state dir belongs to ONE checkpoint lineage. The slot gate
  *     ([[replayOrRegression]]) catches id regressions; the lineage
  *     marker ([[requireLineage]]) catches the one collision the gate
  *     cannot — a new lineage's batch 0 against a stored max slot of
  *     exactly 0.
  */
object SlotStore {

  private def fsOf(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Committed `(prefix, slot, dir)` parts under `path`, all requested
    * prefixes in ONE directory listing — this runs once per micro-batch
    * on streaming hot paths, and an object store charges per LIST. A
    * prefix that is itself a prefix of another (`dfs-delta` vs
    * `dfs-delta-old`) matches longest-first, so pass distinct prefixes.
    * `marker` is the commit marker relative to the part dir. */
  def committedParts(spark: SparkSession, path: String,
      prefixes: Seq[String], marker: String = "_SUCCESS")
      : Seq[(String, Long, String)] = {
    val (fs, dir) = fsOf(spark, path)
    if (!fs.exists(dir)) return Seq.empty
    val byLen = prefixes.sortBy(-_.length)
    fs.listStatus(dir).toSeq.flatMap { s =>
      val n = s.getPath.getName
      byLen.collectFirst {
        case p if s.isDirectory && n.matches(
            java.util.regex.Pattern.quote(p) + "-\\d+") &&
            fs.exists(new Path(s.getPath, marker)) =>
          (p, n.stripPrefix(p + "-").toLong, s.getPath.toString)
      }
    }.sortBy(_._2)
  }

  /** Latest committed `(slot, dir)` of one prefix — the single-version
    * hosts' load point (heavy-hitters state, funnel versions). */
  def latest(spark: SparkSession, path: String, prefix: String,
      marker: String = "_SUCCESS"): Option[(Long, String)] =
    committedParts(spark, path, Seq(prefix), marker)
      .map(p => (p._2, p._3)).lastOption

  /** The LIVE subset of a [[committedParts]] listing under snapshot
    * supersession: the latest `snapPrefix` part (if any) plus every
    * `deltaPrefix` part with a strictly greater slot, slot-ordered.
    * With no snapshot, every delta is live. */
  def liveParts(parts: Seq[(String, Long, String)], deltaPrefix: String,
      snapPrefix: String): Seq[(String, Long, String)] = {
    val snap = parts.filter(_._1 == snapPrefix).map(_._2).sorted.lastOption
    snap match {
      case None => parts.filter(_._1 == deltaPrefix).sortBy(_._2)
      case Some(s) => parts.filter(p =>
        (p._1 == snapPrefix && p._2 == s) ||
          (p._1 == deltaPrefix && p._2 > s)).sortBy(_._2)
    }
  }

  /** Read a set of same-schema part dirs as ONE flat multi-path scan.
    * The `reduce(_.unionByName(_))` alternative builds a union plan
    * LINEAR in part count — a long-running stream with a high
    * compaction threshold pays plan-size pressure and many small scans;
    * the multi-path read is one FileScan over one file index. Parquet
    * resolves columns by NAME per file, so column-order drift between
    * parts is safe (a column missing from an old part reads as null —
    * schema evolution, not an error). */
  def readParts(spark: SparkSession, dirs: Seq[String]): DataFrame = {
    require(dirs.nonEmpty, "readParts: no part dirs")
    spark.read.parquet(dirs: _*)
  }

  /** Guard a write slot against snapshot supersession: ANY part below
    * the latest snapshot slot would be committed (so replays skip it)
    * yet invisible to load — its rows silently lost forever. That shape
    * only arises when a NEW checkpoint lineage (batch ids reset to 0)
    * is pointed at an OLD state dir; fail loudly instead. Legit retries
    * never hit this: a torn write has no marker, and hosts skip
    * committed slots before writing. */
  def requireNotSuperseded(parts: Seq[(String, Long, String)],
      snapPrefix: String, slot: Long, what: String): Unit = {
    val latestSnap = parts.filter(_._1 == snapPrefix).map(_._2)
      .sorted.lastOption
    latestSnap.foreach(s => require(slot > s,
      s"$what: slot $slot is superseded by snapshot $s — a load would " +
        "never read it (did a new checkpoint lineage get pointed at an " +
        "old state dir?)"))
  }

  /** Delete every part dir a snapshot has superseded — committed parts
    * with slot < the latest snapshot's (or AT it, for non-snapshots) —
    * plus torn dirs in the same range. Housekeeping only: readers
    * already ignore all of them. Also catches orphans a crashed earlier
    * sweep left behind. Returns the number of dirs removed. */
  def sweepSuperseded(spark: SparkSession, path: String,
      deltaPrefix: String, snapPrefix: String): Int = {
    val snap = committedParts(spark, path, Seq(snapPrefix))
      .map(_._2).sorted.lastOption
    snap match {
      case None => 0
      case Some(s) =>
        val (fs, dir) = fsOf(spark, path)
        val dRe = java.util.regex.Pattern.quote(deltaPrefix) + "-\\d+"
        val sRe = java.util.regex.Pattern.quote(snapPrefix) + "-\\d+"
        val victims = fs.listStatus(dir).toSeq.filter { st =>
          val n = st.getPath.getName
          st.isDirectory && ((n.matches(dRe) &&
              n.stripPrefix(deltaPrefix + "-").toLong <= s) ||
            (n.matches(sRe) &&
              n.stripPrefix(snapPrefix + "-").toLong < s))
        }
        victims.foreach(st => fs.delete(st.getPath, true))
        victims.size
    }
  }

  /** Replay-vs-lineage-regression gate shared by every batchId-slotted
    * foreachBatch host. Within ONE checkpoint lineage, Structured
    * Streaming replays at most the LATEST batch (ids are monotone), so
    * `batchId == latest committed` is a legitimate at-least-once retry
    * → skip (returns true). `batchId < latest` can only mean a NEW
    * checkpoint lineage (ids reset to 0) was pointed at an OLD state
    * dir — skipping would silently drop every batch until the new ids
    * catch up, and processing would fold the same documents twice;
    * fail loudly instead. The one collision id arithmetic cannot see —
    * a new lineage's batch 0 against a stored max of exactly 0 — is
    * closed by [[requireLineage]]'s marker, which hosts check first. */
  def replayOrRegression(latest: Option[Long], batchId: Long,
      what: String): Boolean = latest match {
    case Some(v) if v == batchId => true
    case Some(v) if v > batchId => throw new IllegalStateException(
      s"$what: batch id $batchId is behind the stored version $v — a " +
        "new checkpoint lineage is pointed at an old state dir; use a " +
        "fresh state dir or resume the original checkpoint")
    case _ => false
  }

  /** Local-property key StreamExecution sets on the micro-batch thread
    * (`sql.streaming.queryId` since Spark 2.x — the query's STABLE id,
    * persisted in checkpoint metadata, identical across restarts of the
    * same checkpoint and different for every new lineage). Read as a
    * plain string: the constant lives in Spark's internal runtime
    * package, and a rename degrades this gate to a no-op instead of
    * breaking compilation. */
  private val QueryIdKey = "sql.streaming.queryId"

  /** Bind a state dir to its checkpoint lineage — closes
    * [[replayOrRegression]]'s batch-0 blind spot. The FIRST batch of a
    * lineage writes the streaming query's stable id to
    * `<stateDir>/_LINEAGE` (before any state commit: a crash between
    * marker and commit retries with the same id); every later batch —
    * including batch 0 of a DIFFERENT lineage whose slot arithmetic
    * looks like a retry — must match it or fail loudly. Call at the
    * top of the foreachBatch body. Outside a streaming query (no
    * query-id property on the thread) this is a no-op, so batch-mode
    * harnesses that drive host internals directly are unaffected.
    * Consequence of first-touch binding: a state dir is claimed by the
    * first lineage that processes a batch against it, even one that
    * crashed before committing state — recovery from a lost checkpoint
    * is a fresh state dir (or deleting `_LINEAGE` explicitly). */
  def requireLineage(spark: SparkSession, stateDir: String,
      what: String): Unit = {
    val qid = spark.sparkContext.getLocalProperty(QueryIdKey)
    if (qid == null) return
    val (fs, dir) = fsOf(spark, stateDir)
    val marker = new Path(dir, "_LINEAGE")
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val stored = try scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString.trim finally in.close()
      if (stored != qid) throw new IllegalStateException(
        s"$what: state dir $stateDir belongs to checkpoint lineage " +
          s"$stored, not $qid — a new checkpoint lineage is pointed at " +
          "an old state dir; use a fresh state dir or resume the " +
          "original checkpoint")
    } else {
      fs.mkdirs(dir)
      val out = fs.create(marker, false)
      try out.write(qid.getBytes("UTF-8")) finally out.close()
    }
  }
}
