package graft.pipeline

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pure-JVM linear-chain CRF inference (D1/D2 backend; reference drives
  * the equivalent through a wapiti subprocess,
  * `models/wapiti_model_impl.py:25-164`, over GROBID-style feature data
  * lines, `models/data.py:46-55`).
  *
  * Model = text file with wapiti-style observation patterns and learned
  * weights; decoding = standard first-order Viterbi:
  *
  * {{{
  * [labels]
  * O
  * B-<title>
  * I-<title>
  * [patterns]
  * U00:%x[0,0]            # unigram pattern: this row, column 0
  * U01:%x[-1,0]           # previous row, column 0
  * U02:%x[0,1]/%x[0,3]    # conjunction of two columns
  * B                      # observation-independent transition bigram
  * [weights]
  * U00:Title<TAB>B-<title><TAB>2.0
  * B:<TAB>B-<title><TAB>I-<title><TAB>1.0
  * }}}
  *
  * `%x[row,col]` is the wapiti/CRF++ template addressing: the value of
  * column `col` of the data line at relative row offset `row` within the
  * current sequence (out-of-range rows expand to `_X[row,col]`, wapiti's
  * special-token behavior). An observation string is the pattern id plus
  * its expanded values; emission score of label y at row t is the sum of
  * the matched observation weights; transition scores come from the `B`
  * pattern. `score(y⃗) = Σ_t emit(t, y_t) + Σ_t trans(y_{t-1}, y_t)`,
  * decoded exactly by Viterbi — identical inference semantics to wapiti
  * with precomputed feature columns (which is how the reference calls
  * it: features are generated in Python, wapiti only labels).
  *
  * Spark shape: the parsed model is broadcast once; labeling is
  * `mapPartitions` over doc-contiguous sorted rows — embarrassingly
  * parallel by document, no shuffle beyond the one `repartition(doc_id)`.
  */
final class CrfLabeler(
    modelText: String,
    featuresCol: String = "features") extends SequenceLabeler {

  override def label(tokens: DataFrame): DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    val model = CrfModel.parse(modelText)
    val bc = spark.sparkContext.broadcast(model)
    val fCol = featuresCol
    val cols = Seq("doc_id", "page_idx", "block_idx", "line_idx", "token_idx",
      "text", "whitespace", fCol)
    val labeled = tokens.select(cols.map(col): _*)
      .as[(Long, Int, Int, Int, Int, String, String, String)]
      .repartition(col("doc_id"))
      .sortWithinPartitions("doc_id", "page_idx", "block_idx", "line_idx", "token_idx")
      .mapPartitions { it =>
        val m = bc.value
        val src = it.buffered
        val docIter = new Iterator[Vector[(Long, Int, Int, Int, Int, String, String, String)]] {
          override def hasNext: Boolean = src.hasNext
          override def next(): Vector[(Long, Int, Int, Int, Int, String, String, String)] = {
            val d = src.head._1
            val b = Vector.newBuilder[(Long, Int, Int, Int, Int, String, String, String)]
            while (src.hasNext && src.head._1 == d) b += src.next()
            b.result()
          }
        }
        docIter.flatMap { rows =>
          val labels = m.decode(rows.map(_._8))
          rows.iterator.zip(labels.iterator).map { case (r, lab) =>
            (r._1, r._2, r._3, r._4, r._5, r._6, r._7, r._8, lab)
          }
        }
      }
    labeled.toDF("doc_id", "page_idx", "block_idx", "line_idx", "token_idx",
      "text", "whitespace", fCol, "label")
  }
}

/** Parsed CRF model: labels, observation patterns, weight tables. */
final case class CrfModel(
    labels: IndexedSeq[String],
    patterns: IndexedSeq[CrfModel.Pattern],
    // observation string -> per-label emission weights
    unigram: Map[String, Array[Double]],
    // transition weights [prev][next]
    transition: Array[Array[Double]]) extends Serializable {

  /** Viterbi decode one sequence of data lines (whitespace-split into
    * observation columns). Returns one label per line.
    */
  def decode(dataLines: Seq[String]): Seq[String] = {
    val n = dataLines.size
    if (n == 0) return Nil
    val nl = labels.size
    val cols: IndexedSeq[Array[String]] =
      dataLines.iterator.map(_.split("\\s+")).toIndexedSeq

    def cell(t: Int, row: Int, c: Int): String = {
      val r = t + row
      if (r < 0 || r >= n) s"_X[$row,$c]"
      else { val line = cols(r); if (c < line.length) line(c) else s"_X[$row,$c]" }
    }

    // emission scores: sum of matched unigram observation weights
    val emit = Array.ofDim[Double](n, nl)
    var t = 0
    while (t < n) {
      patterns.foreach {
        case CrfModel.Unigram(id, cells) =>
          val obs = id + ":" + cells.map { case (r, c) => cell(t, r, c) }.mkString("|")
          unigram.get(obs) match {
            case Some(w) =>
              var y = 0
              while (y < nl) { emit(t)(y) += w(y); y += 1 }
            case None => ()
          }
        case CrfModel.Bigram => ()
      }
      t += 1
    }

    // Viterbi
    val delta = Array.ofDim[Double](n, nl)
    val back = Array.ofDim[Int](n, nl)
    var y = 0
    while (y < nl) { delta(0)(y) = emit(0)(y); y += 1 }
    t = 1
    while (t < n) {
      y = 0
      while (y < nl) {
        var best = Double.NegativeInfinity
        var bestP = 0
        var p = 0
        while (p < nl) {
          val s = delta(t - 1)(p) + transition(p)(y)
          if (s > best) { best = s; bestP = p }
          p += 1
        }
        delta(t)(y) = best + emit(t)(y)
        back(t)(y) = bestP
        y += 1
      }
      t += 1
    }
    var bestY = 0
    y = 1
    while (y < nl) { if (delta(n - 1)(y) > delta(n - 1)(bestY)) bestY = y; y += 1 }
    val out = new Array[String](n)
    t = n - 1
    while (t >= 0) {
      out(t) = labels(bestY)
      if (t > 0) bestY = back(t)(bestY)
      t -= 1
    }
    out.toIndexedSeq
  }
}

object CrfModel {

  sealed trait Pattern extends Serializable
  /** `U<id>:%x[r,c](/%x[r,c])*` — conjunction of data-line cells. */
  final case class Unigram(id: String, cells: Seq[(Int, Int)]) extends Pattern
  /** `B` — observation-independent transition features. */
  case object Bigram extends Pattern

  private val CellRe = """%x\[(-?\d+),(\d+)\]""".r

  /** Parse the text model format (see [[CrfLabeler]] scaladoc). */
  def parse(text: String): CrfModel = {
    var section = ""
    val labels = mutable.ArrayBuffer.empty[String]
    val patterns = mutable.ArrayBuffer.empty[Pattern]
    val uniRaw = mutable.ArrayBuffer.empty[(String, String, Double)]
    val transRaw = mutable.ArrayBuffer.empty[(String, String, Double)]

    text.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim match {
        case l if raw.trim.startsWith("#") => ""
        case l => l
      }
      line match {
        case "" => ()
        case s if s.startsWith("[") && s.endsWith("]") =>
          section = s.substring(1, s.length - 1)
        case l => section match {
          case "labels" => labels += l
          case "patterns" =>
            if (l == "B" || l == "b") patterns += Bigram
            else {
              val colonAt = l.indexOf(':')
              require(colonAt > 0, s"bad pattern: $l")
              val id = l.substring(0, colonAt)
              val cells = CellRe.findAllMatchIn(l.substring(colonAt + 1))
                .map(m => (m.group(1).toInt, m.group(2).toInt)).toSeq
              require(cells.nonEmpty, s"pattern without %x cells: $l")
              patterns += Unigram(id, cells)
            }
          case "weights" =>
            val parts = l.split('\t')
            // transitions only under the exact `B`/`B:` id — a unigram
            // pattern id merely beginning with "B" (e.g. `B12:…`) is an
            // observation weight
            if (parts.length == 4 && (parts(0) == "B:" || parts(0) == "B")) {
              transRaw += ((parts(1), parts(2), parts(3).toDouble))
            } else {
              require(parts.length == 3, s"bad weight line: $l")
              uniRaw += ((parts(0), parts(1), parts(2).toDouble))
            }
          case other => throw new IllegalArgumentException(s"line outside section: $l")
        }
      }
    }

    val labelIdx = labels.zipWithIndex.toMap
    val nl = labels.size
    val uni = uniRaw.groupBy(_._1).map { case (obs, ws) =>
      val arr = new Array[Double](nl)
      ws.foreach { case (_, lab, w) =>
        arr(labelIdx.getOrElse(lab,
          throw new IllegalArgumentException(s"unknown label $lab"))) += w
      }
      obs -> arr
    }
    val trans = Array.ofDim[Double](nl, nl)
    transRaw.foreach { case (p, y, w) =>
      trans(labelIdx(p))(labelIdx(y)) += w
    }
    CrfModel(labels.toIndexedSeq, patterns.toIndexedSeq, uni, trans)
  }
}
