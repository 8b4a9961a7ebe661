package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import java.nio.file.{Files, Paths}

/** Optimization-round tooling: dump `.explain("formatted")` for a set
  * of declared queries to files (`plans/<round>/<name>_<tag>.txt`) so
  * plan claims in OPTIMIZATION_r*.md are checkable without running
  * Spark. Usage:
  *
  * {{{
  * SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.PlanDump plans/r16 before q125_crawl_to_corpus q88_table_profile"
  * }}}
  *
  * Same session shape as [[Bench]] (master, shuffle partitions, AQE,
  * split size) so the dumped plan is the plan the bench runs. Note
  * eager entries (funnel reports, stored-state folds) execute their
  * internal stages while the final frame's plan is built; the dump
  * shows the RETURNED frame's plan, which for those entries is the
  * report assembly — their internal stages are pinned by PlanSpec
  * suites instead.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dirBytes = Option(new java.io.File(sfDir).listFiles())
      .map(_.filter(_.isFile).map(_.length).sum).getOrElse(0L)
    val defaultSplit = if (dirBytes < 200L * 1024 * 1024) "128m" else "4m"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_SPLIT", defaultSplit))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      try {
        // warm pass first (noop sink): shared hub caches materialize, so
        // the explained plan is the plan the WARM bench reps run — an
        // unmaterialized cache reports UnknownPartitioning and the cold
        // plan shows exchanges the warm one doesn't pay
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${n}_$tag.txt"), txt)
        System.err.println(s"[plandump] wrote $n ($tag)")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n failed: ${e.getMessage}")
      }
      Graft.releaseCaches(spark)
    }
    spark.stop()
  }
}
