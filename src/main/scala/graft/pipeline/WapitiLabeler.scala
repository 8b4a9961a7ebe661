package graft.pipeline

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Wapiti CRF labeler backend (SURVEY.md D1; reference
  * `models/wapiti_model_impl.py:25-164`).
  *
  * Protocol, as the reference drives it: one persistent
  * `wapiti label --model <m>` process; feature lines written to stdin
  * (token + space-joined features), one labeled line comes back per
  * input line (`<input>\t<label>` — tab separated), documents separated
  * by a blank line; the tagger echoes the token which is verified
  * against the input (`models/model.py:317-331`).
  *
  * Spark shape: `mapPartitions` with ONE process per partition held for
  * the partition's lifetime (the reference holds one per service
  * process under a mutex — executor parallelism replaces the mutex).
  * Tokens must arrive grouped by document and ordered: callers
  * `repartition($"doc_id")` + `sortWithinPartitions` so each document's
  * sequence is contiguous — no shuffle happens inside the labeler.
  *
  * `command` is injectable: tests use a stand-in tagger (an `awk`/shell
  * echo script); production passes the real wapiti invocation.
  */
final class WapitiLabeler(
    command: Seq[String],
    featuresCol: String = "features") extends SequenceLabeler {

  override def label(tokens: DataFrame): DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    val cmd = command
    val fCol = featuresCol
    val cols = Seq("doc_id", "page_idx", "block_idx", "line_idx", "token_idx",
      "text", "whitespace", fCol)
    val labeled = tokens.select(cols.map(col): _*)
      .as[(Long, Int, Int, Int, Int, String, String, String)]
      .repartition(col("doc_id"))
      .sortWithinPartitions("doc_id", "page_idx", "block_idx", "line_idx", "token_idx")
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else WapitiLabeler.tagPartition(cmd, it)
      }
    labeled.toDF("doc_id", "page_idx", "block_idx", "line_idx", "token_idx",
      "text", "whitespace", fCol, "label")
  }
}

object WapitiLabeler {

  /** Run one tagger process over a partition: write each document's
    * feature lines + blank separator, read back `line\tlabel` rows.
    * Process started once; rows stream through without buffering whole
    * documents in memory beyond the current one (the reference batches
    * documents the same way, models/model.py:289-331).
    */
  private[pipeline] def tagPartition(
      command: Seq[String],
      it: Iterator[(Long, Int, Int, Int, Int, String, String, String)])
    : Iterator[(Long, Int, Int, Int, Int, String, String, String, String)] = {
    val pb = new ProcessBuilder(command: _*)
    pb.redirectErrorStream(false)
    val proc = pb.start()
    val in = new BufferedWriter(
      new OutputStreamWriter(proc.getOutputStream, StandardCharsets.UTF_8))
    val out = new BufferedReader(
      new InputStreamReader(proc.getInputStream, StandardCharsets.UTF_8))

    // write everything, then stream results; wapiti flushes per document
    // separator, but buffering the write side is simpler and bounded by
    // the partition's feature text. A production impl writes/reads in
    // lockstep per document batch (reference does batches of documents).
    val rows = it.toVector
    var prevDoc = Long.MinValue
    rows.foreach { r =>
      if (prevDoc != Long.MinValue && r._1 != prevDoc) in.write("\n")
      prevDoc = r._1
      in.write(r._8)
      in.write("\n")
    }
    in.close()

    val labels = Vector.newBuilder[String]
    var line = out.readLine()
    while (line != null) {
      val trimmed = line.trim
      if (trimmed.nonEmpty) {
        val tab = trimmed.lastIndexOf('\t')
        val label = if (tab >= 0) trimmed.substring(tab + 1)
          else trimmed.substring(trimmed.lastIndexOf(' ') + 1)
        labels += label
      }
      line = out.readLine()
    }
    out.close()
    proc.waitFor()
    val labelSeq = labels.result()
    require(labelSeq.size == rows.size,
      s"tagger returned ${labelSeq.size} labels for ${rows.size} tokens")
    rows.iterator.zip(labelSeq.iterator).map { case (r, lab) =>
      (r._1, r._2, r._3, r._4, r._5, r._6, r._7, r._8, lab)
    }
  }
}
