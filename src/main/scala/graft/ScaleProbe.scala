package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off fixed-delivery scaling probe (not part of the declared
  * surface): the SAME 1000-doc/vector delivery against a 10×-larger
  * corpus index — the direct measurement behind the across family's
  * O(delivery) claim. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup

    def med(f: () => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f()
        val dt = (System.nanoTime() - t0) / 1e9
        Graft.releaseCaches(spark)
        dt
      }.sorted
      ts(1)
    }

    Seq(("sf1", "/root/repo/testdata-sf1", 50),
        ("sf10", "/root/repo/testdata-sf10", 500)).foreach {
      case (tag, d, mod) =>
        val docs = spark.read.parquet(s"$d/documents.parquet")
          .select("doc_id", "text")
        val emb = spark.read.parquet(s"$d/embeddings.parquet")
        val base = java.nio.file.Files
          .createTempDirectory(s"graft-probe-$tag").toFile
        // sign once (the linear per-corpus cost, reported separately)
        val t0 = System.nanoTime()
        Dedup.winnowPostings(docs).write.parquet(s"$base/wpost")
        Dedup.postingsDfs(spark.read.parquet(s"$base/wpost"))
          .write.parquet(s"$base/wdfs")
        Dedup.minHashSignatures(docs).write.parquet(s"$base/sigs")
        Dedup.minHashBandTable(spark.read.parquet(s"$base/sigs"))
          .write.parquet(s"$base/bandtbl")
        // the full q102b sign-time bookkeeping (over-cap bands, star
        // keepers, binary verify table): the probe measures the
        // PRODUCTION served shape, not a per-delivery re-aggregate
        Dedup.minHashOverCapBands(spark.read.parquet(s"$base/sigs"),
            maxBucket = 100000L)
          .write.parquet(s"$base/mhover")
        Dedup.minHashStarKeepers(spark.read.parquet(s"$base/sigs"))
          .write.parquet(s"$base/mhkeep")
        Dedup.minHashBinSigs(spark.read.parquet(s"$base/sigs"))
          .write.parquet(s"$base/sigsbin")
        Dedup.embeddingIndex(emb, nbits = 8).write.parquet(s"$base/eidx")
        docs.select(col("doc_id"),
            Dedup.simHash64(Dedup.tokensOf(col("text"))).as("sim"))
          .write.parquet(s"$base/simsigs")
        Dedup.signatureOverCapChunks(spark.read.parquet(s"$base/simsigs"),
            "doc_id", "sim", maxBucket = 100000L)
          .write.parquet(s"$base/simover")
        Dedup.signatureKeepers(spark.read.parquet(s"$base/simsigs"),
            "doc_id", "sim")
          .write.parquet(s"$base/simkeep")
        graft.operators.TextAnalysis.spanGramDfs(docs)
          .write.parquet(s"$base/spandfs")
        graft.operators.TextAnalysis.segmentKeepers(docs)
          .write.parquet(s"$base/segkeep")
        val kEff = Dedup.deriveClusterCount(emb.count(), 128)
        val cs = graft.operators.Similarity.trainIvfCentroids(emb, kEff,
          sampleN = math.max(4096, 8 * kEff))
        graft.operators.Similarity.ivfAssign(emb, cs)
          .withColumnRenamed("list_id", "cluster")
          .withColumnRenamed("vec_id", "id")
          .write.parquet(s"$base/semidx")
        // FIXED 1000-row deliveries whatever the corpus size — STAGED
        // to their own files at sign time: a landing-zone delivery
        // arrives as its own small file, and deriving it per-rep by
        // filtering the corpus table would re-scan the whole corpus
        // text column inside every measured rep (round-13 finding:
        // that synthetic-construction scan, not the across kernel,
        // was the dominant "growth" — 1.5 s of the 1.9 s simhash line
        // at sf10)
        docs.filter(col("doc_id") % mod === 0)
          .select((col("doc_id") + 10000000L).as("doc_id"),
            concat(col("text"), lit(" v2")).as("text"))
          .coalesce(1).write.parquet(s"$base/deliv-docs")
        val embMod = mod * 2 // 200k vectors at sf10 -> 1000
        emb.filter(col("vec_id") % embMod === 0)
          .select((col("vec_id") + 10000000L).as("vec_id"),
            transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
          .coalesce(1).write.parquet(s"$base/deliv-vecs")
        val signS = (System.nanoTime() - t0) / 1e9
        def delDocs = spark.read.parquet(s"$base/deliv-docs")
        def delVec = spark.read.parquet(s"$base/deliv-vecs")
        val nDel = delDocs.count(); val nVec = delVec.count()
        val w = med(() => Dedup.postingsOverlapAcross(
            spark.read.parquet(s"$base/wpost"),
            spark.read.parquet(s"$base/wdfs"),
            Dedup.winnowPostings(delDocs), maxDf = 100L)
          .filter(col("shared") >= 3)
          .write.format("noop").mode("overwrite").save())
        val m = med(() => Dedup.minHashLshPairsAcross(
            spark.read.parquet(s"$base/sigs"),
            Dedup.minHashSignatures(delDocs),
            minEstJaccard = 0.5, maxBucket = 100000L)
          .write.format("noop").mode("overwrite").save())
        val mb = med(() => Dedup.minHashLshPairsAcross(
            spark.read.parquet(s"$base/sigs"),
            Dedup.minHashSignatures(delDocs),
            minEstJaccard = 0.5, maxBucket = 100000L,
            overCapBands = Some(spark.read.parquet(s"$base/mhover")),
            starKeepers = Some(spark.read.parquet(s"$base/mhkeep")),
            corpusBandTable = Some(spark.read.parquet(s"$base/bandtbl")),
            corpusBinSigs = Some(spark.read.parquet(s"$base/sigsbin")))
          .write.format("noop").mode("overwrite").save())
        val e = med(() => Dedup.embeddingCosinePairsAcross(
            spark.read.parquet(s"$base/eidx"), delVec,
            threshold = 0.95, nbits = 8, maxBucket = 100000L)
          .write.format("noop").mode("overwrite").save())
        val sh = med(() => Dedup.hamming64PairsAcross(
            spark.read.parquet(s"$base/simsigs"),
            delDocs.select(col("doc_id"),
              Dedup.simHash64(Dedup.tokensOf(col("text"))).as("sim")),
            "doc_id", "sim", maxHamming = 3, maxBucket = 100000L,
            overCapChunks = Some(spark.read.parquet(s"$base/simover")),
            starKeepers = Some(spark.read.parquet(s"$base/simkeep")))
          .write.format("noop").mode("overwrite").save())
        val sp = med(() => graft.operators.TextAnalysis
          .removeSharedSpansIncremental(delDocs,
            spark.read.parquet(s"$base/spandfs"))
          .write.format("noop").mode("overwrite").save())
        val sg = med(() => graft.operators.TextAnalysis
          .segmentDedupIncremental(delDocs,
            spark.read.parquet(s"$base/segkeep"))
          .write.format("noop").mode("overwrite").save())
        val se = med(() => Dedup.semanticDedupAcross(
            spark.read.parquet(s"$base/semidx"), cs, delVec,
            tau = 0.4, maxCluster = 100000L)
          .write.format("noop").mode("overwrite").save())
        println(f"PROBE $tag: corpus=${docs.count()} sign=$signS%.1f s; " +
          f"delivery docs=$nDel vecs=$nVec; winnow=$w%.2f minhash=$m%.2f " +
          f"minhash+bandtbl=$mb%.2f embedding=$e%.2f simhash=$sh%.2f " +
          f"span=$sp%.2f segment=$sg%.2f semantic=$se%.2f s")
        org.apache.commons.io.FileUtils.deleteDirectory(base)
    }
    spark.stop()
  }
}
