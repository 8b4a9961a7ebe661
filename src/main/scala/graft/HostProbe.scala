package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off sf1 per-batch scaling runs for the text/signature/vector
  * streaming hosts (the winnow/minhash hosts' protocol): 4
  * file-per-trigger deliveries, per-batch durations from the progress
  * listener — the flat-per-batch read is the hosts' O(delivery)
  * evidence. */
object HostProbe {
  def main(args: Array[String]): Unit = {
    // args: [dataDir] [master] — defaults match this container's layout
    val dataDir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val master = if (args.length > 1) args(1) else "local[32]"
    val spark = SparkSession.builder().master(master)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val times = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
          times += ((e.progress.batchId, e.progress.batchDuration))
        override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      })
    // SPARK_GRAFT_HP_TAIL=n: after the 4 corpus-quarter batches, append
    // n FIXED-SIZE deliveries (1000 rows, ids offset into fresh space)
    // — their per-batch ms at an sf1-built state vs an sf10-built state
    // is the serving-path scale read (fixed delivery, 10× state), the
    // across-family §26 protocol applied to the hosts.
    val tailBatches = sys.env.get("SPARK_GRAFT_HP_TAIL").map(_.toInt).getOrElse(0)
    def run(name: String, src: DataFrame)(
        host: (DataFrame, String, String) => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val base = java.nio.file.Files.createTempDirectory(s"graft-hp-$name").toFile
      val in = new java.io.File(base, "in"); in.mkdirs()
      (0 until 4).foreach { b =>
        src.filter(pmod(col("doc_id"), lit(4)) === b).coalesce(1)
          .write.mode("append").parquet(in.getPath)
        Thread.sleep(1100)
      }
      (0 until tailBatches).foreach { t =>
        src.orderBy("doc_id").limit(1000)
          .withColumn("doc_id", col("doc_id") + lit((t + 10) * 10000000L))
          .coalesce(1).write.mode("append").parquet(in.getPath)
        Thread.sleep(1100)
      }
      times.clear()
      val t0 = System.nanoTime()
      val q = host(
        spark.readStream.schema(src.schema).option("maxFilesPerTrigger", 1)
          .option("latestFirst", "false").parquet(in.getPath),
        new java.io.File(base, "state").getPath,
        new java.io.File(base, "out").getPath)
      q.processAllAvailable(); q.stop()
      val dt = (System.nanoTime() - t0) / 1e9
      val nb = 4 + tailBatches
      println(f"HOST $name: ${src.count()} rows / $nb batches in $dt%.2f s; " +
        s"per-batch ms=${times.sortBy(_._1).map(_._2).mkString(",")}")
      org.apache.commons.io.FileUtils.deleteDirectory(base)
    }
    import graft.streaming.StreamOps
    val docs = spark.read.parquet(s"$dataDir/documents.parquet")
      .select("doc_id", "text")
    run("span", docs)((s, st, o) => StreamOps.streamingSpanDedup(s, st, o))
    run("segment", docs)((s, st, o) => StreamOps.streamingSegmentDedup(s, st, o))
    val sigs = docs.select(col("doc_id"),
      graft.operators.Dedup.simHash64(
        graft.operators.Dedup.tokensOf(col("text"))).as("sig64"))
    run("signature", sigs)((s, st, o) =>
      StreamOps.streamingSignatureDedup(s, st, o))
    val emb = spark.read.parquet(s"$dataDir/embeddings.parquet")
      .withColumnRenamed("vec_id", "doc_id")
    run("embedding", emb)((s, st, o) =>
      StreamOps.streamingEmbeddingDedup(s, st, o, idCol = "doc_id"))
    spark.stop()
  }
}
