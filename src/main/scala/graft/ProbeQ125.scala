package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Optimization-round probe: per-stage wall clock of the q125
  * crawl-to-corpus composition (warm JVM, bench session shape), so the
  * expensive stage is identified empirically instead of guessed
  * (guide §1.1). Reps via SPARK_GRAFT_REPS (default 3). */
object ProbeQ125 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dirBytes = Option(new java.io.File(sfDir).listFiles())
      .map(_.filter(_.isFile).map(_.length).sum).getOrElse(0L)
    val defaultSplit = if (dirBytes < 200L * 1024 * 1024) "128m" else "4m"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe-q125")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_SPLIT", defaultSplit))
      .config("spark.sql.codegen.wholeStage",
        sys.env.getOrElse("PROBE_CODEGEN", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    @volatile var traceJobs = false
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          starts.put(e.jobId, e.time); ()
        }
        override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          jobs.incrementAndGet()
          if (traceJobs) {
            val dt = e.time - starts.getOrDefault(e.jobId, e.time)
            System.err.println(s"[probe]   job ${e.jobId}: ${dt} ms")
          }
          ()
        }
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(e.stageInfo.numTasks)
          taskMs.addAndGet(e.stageInfo.taskMetrics.executorRunTime)
          ()
        }
      })
    def counters(): String =
      s"jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} taskMs=${taskMs.get}"

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (0 until reps).foreach { rep =>
      System.err.println(s"[probe] === rep $rep ===")
      t("TOTAL") {
        val all = t("warcDocsAll build+cache+count") {
          val a = graft.CacheRegistry.persist(
            graft.queries.PipelineOps.warcDocsAll(spark, sfDir))
          a.count(); a
        }
        val docs = all.filter(col("text").isNotNull && col("text") =!= "")
        t("nExtracted count") { docs.count() }
        val keep = graft.operators.Curation.urlCuration(
          docs, Set("src1.example"), Seq("/ads/"), 10)
        val kept = t("url kept cache+count") {
          val k = graft.CacheRegistry.persist(
            docs.join(keep.select("doc_id"), Seq("doc_id"), "left_semi"))
          k.count(); k
        }
        val benchmark = Tables(spark, sfDir).documents
          .filter(pmod(col("doc_id"), lit(7)) === 0)
        val patterns = graft.queries.ScaleOps.Blocklist
        // replicate curationStages with per-stage timing
        def staged(name: String)(df: org.apache.spark.sql.DataFrame) = t(name) {
          val p = graft.CacheRegistry.persist(df)
          (p, p.count())
        }
        val s0 = kept
        val (s1, _) = staged("s1 blocklist")(s0.join(
          graft.operators.Curation.blocklistMatches(s0, patterns, "text", "doc_id")
            .select(col("doc_id")), Seq("doc_id"), "left_anti"))
        val (s2, _) = staged("s2 quality")(s1.join(
          graft.operators.TextAnalysis.curationDecisions(s1, "text", "doc_id")
            .filter(col("keep")).select(col("doc_id")),
          Seq("doc_id"), "left_semi"))
        val (s3, _) = staged("s3 exact dedup")(
          graft.operators.Dedup.deduplicate(s2, "text", "doc_id"))
        // nearDeduplicate unrolled: time the eager CC separately
        val edges = t("s4a edge plan construct") {
          graft.operators.Dedup.ngramJaccardPairs(s3,
            textCol = "text", idCol = "doc_id", n = 2, threshold = 0.2,
            maxDocFreq = 100L)
        }
        // replicate connectedComponents' small-path internals with timers
        System.err.println(s"[probe] pre-und: ${counters()}")
        traceJobs = true
        val (und, releaseUnd) = t("s4b-1 und localCheckpoint") {
          graft.CacheRegistry.localCheckpointWithRelease(
            edges.select(col("doc_id_a").as("src"), col("doc_id_b").as("dst"))
              .union(edges.select(col("doc_id_b").as("src"),
                col("doc_id_a").as("dst")))
              .distinct())
        }
        traceJobs = false
        System.err.println(s"[probe] post-und: ${counters()}")
        val nUnd = t("s4b-2 und count") { und.count() }
        System.err.println(s"[probe] nUnd=$nUnd")
        val comps = t("s4b-3 local union-find") {
          graft.operators.Dedup.localConnectedComponents(
            und.select(col("src").as("doc_id_a"), col("dst").as("doc_id_b")))
        }
        releaseUnd()
        val losers = comps.filter(col("node") =!= col("comp"))
          .select(col("node").as("doc_id"))
        val (s4, _) = staged("s4c left_anti count")(
          s3.join(losers, Seq("doc_id"), "left_anti"))
        val s5 = t("s5a decontaminate construct") {
          graft.operators.Dedup.decontaminate(s4, benchmark, "text")
        }
        t("s5b decontaminate count") { s5.count() }
      }
      Graft.releaseCaches(spark)
    }
    spark.stop()
  }
}
