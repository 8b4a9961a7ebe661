package graft

import org.apache.spark.sql.SparkSession

/** Streaming-ingestion benchmark + parity check at corpus scale: replays
  * the `documents` table of `SPARK_GRAFT_SF_DIR` through the full
  * per-document DAG (`StreamOps.documentPipelineReplay`) in
  * `SPARK_GRAFT_STREAM_BATCHES` micro-batches (default 8) and verifies
  * the streamed semantic-node table fingerprint equals the batch run's.
  * Prints one JSON line with docs/sec throughput and the parity bit —
  * the BASELINE.md streaming-throughput line comes from this main.
  */
object BenchStream {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-stream")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val workDir = java.nio.file.Files
      .createTempDirectory("graft-stream-replay").toFile
    try {
      val (nDocs, nBatches, streamFp, batchFp, secs) =
        graft.streaming.StreamOps.documentPipelineReplay(
          spark, Tables(spark, sfDir).documents, workDir.getPath, nFiles)
      val ok = streamFp == batchFp
      println(s"""{"metric":"stream_pipeline","value":$secs,"unit":"sec",""" +
        s""""docs":$nDocs,"batches":$nBatches,""" +
        f""""docs_per_sec":${nDocs / secs}%.1f,""" +
        s""""hash_match":$ok,"sf":"$sfDir"}""")
      if (!ok) sys.exit(1)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(workDir)
      spark.stop()
    }
  }
}
