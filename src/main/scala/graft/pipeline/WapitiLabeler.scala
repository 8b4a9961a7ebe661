package graft.pipeline

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.util.concurrent.LinkedBlockingQueue

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
    featuresCol: String = "features",
    perPage: Boolean = false) extends SequenceLabeler {

  override def label(tokens: DataFrame): DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    val cmd = command
    val fCol = featuresCol
    val byPage = perPage
    val labeled = SequenceScope.contiguous(tokens, fCol, byPage)
      .as[SequenceScope.In]
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else WapitiLabeler.tagPartition(cmd, it, byPage)
      }
    labeled.toDF("doc_id", "page_idx", "block_idx", "line_idx", "token_idx",
      "text", "whitespace", fCol, "label")
  }
}

object WapitiLabeler {

  private type In = (Long, Int, Int, Int, Int, String, String, String)
  private type Out = (Long, Int, Int, Int, Int, String, String, String, String)

  /** Run one tagger process over a partition, full-duplex.
    *
    * Pipe discipline: a dedicated writer thread streams feature lines to
    * the tagger while the task thread reads labels per document in
    * lockstep. The naive write-everything-then-read shape deadlocks as
    * soon as the tagger emits output while the stdin pipe is still being
    * filled (both OS pipe buffers ~64 KB); with the writer on its own
    * thread neither side can block the other, regardless of partition or
    * document size. Memory stays bounded by one document plus the
    * writer queue (the reference batches per document the same way,
    * models/model.py:289-331).
    */
  private[pipeline] def tagPartition(
      command: Seq[String], it: Iterator[In],
      perPage: Boolean = false): Iterator[Out] = {
    val pb = new ProcessBuilder(command: _*)
    pb.redirectErrorStream(false)
    val proc = pb.start()
    val in = new BufferedWriter(
      new OutputStreamWriter(proc.getOutputStream, StandardCharsets.UTF_8))
    val out = new BufferedReader(
      new InputStreamReader(proc.getInputStream, StandardCharsets.UTF_8))

    // Bounded queue of per-document line batches; None = end of input.
    val queue = new LinkedBlockingQueue[Option[Vector[String]]](8)
    @volatile var writerError: Throwable = null
    val writer = new Thread(() => {
      try {
        var done = false
        while (!done) queue.take() match {
          case Some(lines) =>
            lines.foreach { l => in.write(l); in.write('\n') }
            in.write('\n') // document separator
            in.flush()
          case None =>
            in.close()
            done = true
        }
      } catch {
        case t: Throwable =>
          writerError = t
          try in.close() catch { case _: Throwable => () }
      }
    }, "graft-wapiti-writer")
    writer.setDaemon(true)
    writer.start()

    // Group the sorted partition iterator into consecutive sequences
    // (task thread consumes the Spark iterator; only the current
    // sequence is materialized).
    val docs: Iterator[Vector[In]] = SequenceScope.sequences(it, perPage)

    def parseLabel(line: String): String = {
      val tab = line.lastIndexOf('\t')
      if (tab >= 0) line.substring(tab + 1)
      else line.substring(line.lastIndexOf(' ') + 1)
    }

    def readLabels(n: Int): Vector[String] = {
      val b = Vector.newBuilder[String]
      var got = 0
      while (got < n) {
        val line = out.readLine()
        if (line == null) {
          if (writerError != null) throw writerError
          throw new RuntimeException(
            s"tagger terminated early: got $got of $n labels for a document")
        }
        val trimmed = line.trim
        if (trimmed.nonEmpty) { b += parseLabel(trimmed); got += 1 }
      }
      b.result()
    }

    new Iterator[Out] {
      private var current: Iterator[Out] = Iterator.empty
      private var finished = false

      override def hasNext: Boolean = {
        while (!current.hasNext && !finished) {
          if (docs.hasNext) {
            val rows = docs.next()
            queue.put(Some(rows.map(_._8)))
            val labels = readLabels(rows.size)
            current = rows.iterator.zip(labels.iterator).map { case (r, lab) =>
              (r._1, r._2, r._3, r._4, r._5, r._6, r._7, r._8, lab)
            }
          } else {
            queue.put(None)
            writer.join()
            if (writerError != null) throw writerError
            var line = out.readLine()
            while (line != null && line.trim.isEmpty) line = out.readLine()
            require(line == null, s"tagger produced extra output: $line")
            out.close()
            proc.waitFor()
            finished = true
          }
        }
        current.hasNext
      }

      override def next(): Out = {
        if (!hasNext) throw new NoSuchElementException("empty tagger iterator")
        current.next()
      }
    }
  }
}
