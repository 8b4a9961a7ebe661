package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.JsonlCorpus

/** JSONL corpus interchange: read/quarantine/write round-trips on the
  * documents shape (the Dolma/FineWeb-style one-object-per-line
  * format every training pipeline consumes).
  */
class JsonlCorpusSpec extends SparkSuite {

  test("read lands the documents shape; corrupt lines quarantine, not fail") {
    val dir = Files.createTempDirectory("graft-jsonl").toFile
    try {
      val lines = Seq(
        """{"doc_id": 1, "text": "the quick brown fox", "lang": "en", "source": "web"}""",
        """{"text": "no id, gets a stable hash", "lang": "en", "source": "web"}""",
        """{"doc_id": 3, "lang": "en", "source": "web"}""", // missing text
        """this is not json at all""",
        """{"doc_id": 4, "text": "extra fields ignored", "lang": "de", "source": "books", "url": "x"}""")
      Files.write(new java.io.File(dir, "part-0.jsonl").toPath,
        lines.mkString("\n").getBytes("UTF-8"))
      val docs = JsonlCorpus.read(spark, dir.getPath)
      assert(docs.columns.toSeq ==
        Seq("doc_id", "text", "lang", "source", "n_chars"))
      val rows = docs.orderBy("doc_id").collect()
      assert(rows.length == 3)
      assert(rows.exists(r => r.getLong(0) == 1L &&
        r.getString(1) == "the quick brown fox" && r.getLong(4) == 19L))
      assert(rows.exists(_.getString(3) == "books")) // extra field dropped
      // id-less doc: stable content hash, identical on a second read
      val again = JsonlCorpus.read(spark, dir.getPath)
        .orderBy("doc_id").collect()
      assert(rows.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
      // quarantine: the bad json AND the missing-text line, with reasons
      val q = JsonlCorpus.quarantine(spark, dir.getPath)
        .collect().map(r => r.getString(1)).sorted.toSeq
      assert(q == Seq("malformed_json", "missing_text"), q)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("readAll classifies every line in ONE scan: good rows and " +
      "quarantine rows from a single json relation") {
    val dir = Files.createTempDirectory("graft-jsonl-one").toFile
    try {
      val lines = Seq(
        """{"doc_id": 1, "text": "good line one", "lang": "en", "source": "web"}""",
        """broken {""",
        """{"doc_id": 2, "lang": "en", "source": "web"}""",
        """{"doc_id": 3, "text": "good line two", "lang": "en", "source": "web"}""")
      Files.write(new java.io.File(dir, "part-0.jsonl").toPath,
        lines.mkString("\n").getBytes("UTF-8"))
      val all = JsonlCorpus.readAll(spark, dir.getPath)
      // exactly one file scan in the plan — read+quarantine without a
      // second pass over 100k shards
      val scans = all.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("FileScan json"))
      assert(scans == 1, all.queryExecution.executedPlan.toString)
      val rows = all.collect()
      assert(rows.length == 4)
      val good = rows.filter(_.isNullAt(5))
      val bad = rows.filterNot(_.isNullAt(5))
      assert(good.map(_.getString(1)).sorted.toSeq ==
        Seq("good line one", "good line two"))
      assert(bad.map(_.getString(5)).sorted.toSeq ==
        Seq("malformed_json", "missing_text"))
      // the filtered views agree with the one-scan classification
      assert(JsonlCorpus.read(spark, dir.getPath).count() == 2)
      assert(JsonlCorpus.quarantine(spark, dir.getPath).count() == 2)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("gzipped multi-shard corpus reads in parallel with per-file decompression") {
    val dir = Files.createTempDirectory("graft-jsonl-gz").toFile
    try {
      def gz(name: String, lines: Seq[String]): Unit = {
        val out = new java.util.zip.GZIPOutputStream(
          new java.io.FileOutputStream(new java.io.File(dir, name)))
        out.write(lines.mkString("\n").getBytes("UTF-8"))
        out.close()
      }
      gz("shard-00.jsonl.gz", Seq(
        """{"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "web"}""",
        """{"doc_id": 2, "text": "gamma delta", "lang": "en", "source": "web"}"""))
      gz("shard-01.jsonl.gz", Seq(
        """{"doc_id": 3, "text": "epsilon zeta", "lang": "de", "source": "books"}""",
        """not json"""))
      val docs = JsonlCorpus.read(spark, dir.getPath)
      assert(docs.orderBy("doc_id").collect().map(_.getLong(0)).toSeq ==
        Seq(1L, 2L, 3L))
      assert(JsonlCorpus.quarantine(spark, dir.getPath).count() == 1)
      // two gz shards → (at least) two input partitions: per-FILE
      // parallelism survives even though gzip itself is unsplittable
      assert(docs.rdd.getNumPartitions >= 2)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("gzip export round-trips: compressed shards read back identically") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-jsonl-gzw").toFile
    try {
      val docs = Tables(spark, sf("0.001")).documents
        .select("doc_id", "text", "lang", "source")
      JsonlCorpus.write(docs, s"${dir.getPath}/gz", compression = Some("gzip"))
      val files = new java.io.File(s"${dir.getPath}/gz").listFiles
        .filter(_.getName.endsWith(".json.gz"))
      assert(files.nonEmpty, "expected .json.gz shards")
      val back = JsonlCorpus.read(spark, s"${dir.getPath}/gz")
      val orig = docs.select("doc_id", "text").as[(Long, String)]
        .collect().sorted.toSeq
      val round = back.select("doc_id", "text").as[(Long, String)]
        .collect().sorted.toSeq
      assert(round == orig)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("streaming JSONL ingestion equals the batch read as shards land") {
    val dir = Files.createTempDirectory("graft-jsonl-stream").toFile
    try {
      def shard(name: String, lines: Seq[String]): Unit = {
        Files.write(new java.io.File(dir, name).toPath,
          lines.mkString("\n").getBytes("UTF-8"))
        Thread.sleep(1100)
      }
      shard("s0.jsonl", Seq(
        """{"doc_id": 1, "text": "first shard doc", "lang": "en", "source": "web"}""",
        """broken json {"""))
      shard("s1.jsonl", Seq(
        """{"text": "id-less doc, stable hash", "lang": "de", "source": "books"}""",
        """{"doc_id": 3, "text": "second shard doc", "lang": "en", "source": "web"}"""))
      val q = JsonlCorpus.readStream(spark, dir.getPath)
        .writeStream.outputMode("append").format("memory")
        .queryName("tjsonl").start()
      q.processAllAvailable(); q.stop()
      val streamed = spark.table("tjsonl").collect().map(_.toString).sorted.toSeq
      val batch = JsonlCorpus.read(spark, dir.getPath)
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch && streamed.length == 3)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("write/read round-trip preserves the corpus; sharded layout splits by column") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-jsonl-w").toFile
    try {
      val docs = Tables(spark, sf("0.001")).documents
        .select("doc_id", "text", "lang", "source")
      JsonlCorpus.write(docs, s"${dir.getPath}/flat")
      val back = JsonlCorpus.read(spark, s"${dir.getPath}/flat")
      assert(back.count() == docs.count())
      val orig = docs.select("doc_id", "text").as[(Long, String)]
        .collect().sorted.toSeq
      val round = back.select("doc_id", "text").as[(Long, String)]
        .collect().sorted.toSeq
      assert(round == orig)
      // sharded export: one directory per shard value
      val sharded = docs.withColumn("shard", pmod(col("doc_id"), lit(3)))
      JsonlCorpus.write(sharded, s"${dir.getPath}/sharded",
        shardCol = Some("shard"))
      val shardDirs = new java.io.File(s"${dir.getPath}/sharded").listFiles
        .filter(_.getName.startsWith("shard=")).map(_.getName).sorted.toSeq
      assert(shardDirs == Seq("shard=0", "shard=1", "shard=2"))
      assert(JsonlCorpus.read(spark, s"${dir.getPath}/sharded/shard=1")
        .count() == docs.filter(pmod(col("doc_id"), lit(3)) === 1).count())
      // the whole operator surface runs on a JSONL-read corpus unchanged
      val deduped = graft.operators.Dedup.deduplicate(back)
      assert(deduped.count() <= back.count() && deduped.count() > 0)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }
}
