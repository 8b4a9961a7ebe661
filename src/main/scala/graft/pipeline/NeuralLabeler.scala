package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D2: neural sequence-labeling backend contract — the DELFT/BiLSTM
  * shape (reference `models/delft_model_impl.py:18-57`: texts +
  * feature matrices in, one label per token out, batched).
  *
  * What is real here: the full Spark-side contract — doc-contiguous
  * batching (D3), feature→tensor encoding, fixed-size batch packing
  * with padding, decode (per-token argmax, or masked Viterbi over the
  * score lattice when a `transitionMask` is supplied — enforcing e.g.
  * BIO consistency, see [[NeuralLabeler.bioMask]]), and the
  * label-column output every downstream stage consumes. What is
  * injectable: `inference`, the batched tensor function — an ONNX
  * Runtime session in production (`session.run` over [batch, maxLen,
  * featDim] → [batch, maxLen, labels]); this container has no ONNX
  * runtime, so tests inject a deterministic stand-in with the same
  * signature (an ONNX-shaped golden spec pins the decode end-to-end).
  *
  * Scale shape: model weights/session are per-executor (the `inference`
  * closure is broadcast with the task), batches never cross documents,
  * and the only shuffle is the one `repartition(doc_id)`.
  *
  * @param labels output vocabulary, argmax index → label
  * @param encode token feature string → dense feature vector
  * @param inference [docs × tokens × featDim] → per-token label scores
  * @param batchSize documents per inference call (DELFT batches the
  *   same way; count asserted like the reference's tag-result check)
  * @param transitionMask optional `allowed(prev)(next)` matrix over
  *   label indices; when set, decode is Viterbi over the per-token
  *   scores with disallowed transitions scored -∞ (argmax otherwise)
  */
final class NeuralLabeler(
    labels: IndexedSeq[String],
    encode: String => Array[Float],
    inference: Seq[Seq[Array[Float]]] => Seq[Seq[Array[Float]]],
    batchSize: Int = 8,
    featuresCol: String = "features",
    transitionMask: Option[Array[Array[Boolean]]] = None,
    perPage: Boolean = false) extends SequenceLabeler {

  require(labels.nonEmpty, "label vocabulary must not be empty")
  transitionMask.foreach { m =>
    require(m.length == labels.size && m.forall(_.length == labels.size),
      s"transition mask must be ${labels.size}x${labels.size}")
  }

  override def label(tokens: DataFrame): DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    val labelVocab = labels
    val enc = encode
    val infer = inference
    val bs = batchSize
    val fCol = featuresCol
    val mask = transitionMask
    val byPage = perPage
    val labeled = SequenceScope.contiguous(tokens, fCol, byPage)
      .as[SequenceScope.In]
      .mapPartitions { it =>
        // group into sequences (D3 batch packing input)
        val docs = SequenceScope.sequences(it, byPage)
        docs.grouped(bs).flatMap { batch =>
          val tensors = batch.map(_.map(r => enc(r._8)).toSeq)
          val scores = infer(tensors)
          require(scores.size == batch.size,
            s"inference returned ${scores.size} docs for ${batch.size}")
          batch.iterator.zip(scores.iterator).flatMap { case (rows, docScores) =>
            require(docScores.size == rows.size,
              s"inference returned ${docScores.size} labels for ${rows.size} tokens")
            val decoded = NeuralLabeler.decode(docScores, labelVocab.size, mask)
            rows.iterator.zip(decoded.iterator).map { case (r, y) =>
              (r._1, r._2, r._3, r._4, r._5, r._6, r._7, r._8, labelVocab(y))
            }
          }
        }
      }
    labeled.toDF("doc_id", "page_idx", "block_idx", "line_idx", "token_idx",
      "text", "whitespace", fCol, "label")
  }
}

object NeuralLabeler {

  /** Decode one document's score lattice to label indices: per-token
    * argmax, or — with a transition mask — first-order Viterbi where a
    * disallowed `prev→next` transition scores -∞ (the max-scoring path
    * among the mask-consistent label sequences). Scores beyond the
    * label vocabulary are ignored (an ONNX head may pad its output).
    */
  private[graft] def decode(docScores: Seq[Array[Float]], nLabels: Int,
      mask: Option[Array[Array[Boolean]]]): IndexedSeq[Int] = {
    val n = docScores.size
    if (n == 0) return IndexedSeq.empty
    def width(s: Array[Float]): Int = math.min(s.length, nLabels)
    mask match {
      case None =>
        docScores.iterator.map { s =>
          var best = 0
          var i = 1
          while (i < width(s)) { if (s(i) > s(best)) best = i; i += 1 }
          best
        }.toIndexedSeq
      case Some(allowed) =>
        val delta = Array.ofDim[Double](n, nLabels)
        val back = Array.ofDim[Int](n, nLabels)
        var y = 0
        while (y < nLabels) {
          val s0 = docScores.head
          delta(0)(y) = if (y < width(s0)) s0(y) else Double.NegativeInfinity
          y += 1
        }
        var t = 1
        while (t < n) {
          val st = docScores(t)
          y = 0
          while (y < nLabels) {
            var best = Double.NegativeInfinity
            var bestP = 0
            var p = 0
            while (p < nLabels) {
              if (allowed(p)(y) && delta(t - 1)(p) > best) {
                best = delta(t - 1)(p); bestP = p
              }
              p += 1
            }
            val emit = if (y < width(st)) st(y).toDouble else Double.NegativeInfinity
            delta(t)(y) = best + emit
            back(t)(y) = bestP
            y += 1
          }
          t += 1
        }
        var bestY = 0
        y = 1
        while (y < nLabels) {
          if (delta(n - 1)(y) > delta(n - 1)(bestY)) bestY = y
          y += 1
        }
        val out = new Array[Int](n)
        t = n - 1
        while (t >= 0) {
          out(t) = bestY
          if (t > 0) bestY = back(t)(bestY)
          t -= 1
        }
        out.toIndexedSeq
    }
  }

  /** BIO-consistency transition mask over a `O`/`B-x`/`I-x` label
    * vocabulary: `I-x` may only follow `B-x` or `I-x`; at the sequence
    * start only non-`I` labels are reachable (enforced by the decoder
    * starting from raw scores — a leading `I-x` is still representable
    * when the model insists, matching DELFT's lenient reading where
    * BioSpans treats a bare `I-` as a span start).
    */
  def bioMask(labels: IndexedSeq[String]): Array[Array[Boolean]] =
    Array.tabulate(labels.size, labels.size) { (p, y) =>
      val next = labels(y)
      if (!next.startsWith("I-")) true
      else {
        val tag = next.substring(2)
        labels(p) == s"B-$tag" || labels(p) == s"I-$tag"
      }
    }

  /** Simple bag-of-columns feature encoder for the data-line format:
    * hash each whitespace feature column into `dim` buckets (the
    * embedding-free fallback encoder; a real DELFT encoder substitutes
    * word embeddings + char features behind the same String→vector
    * signature). */
  def hashingEncoder(dim: Int): String => Array[Float] = { line =>
    val v = new Array[Float](dim)
    if (line != null) {
      var start = 0
      var i = 0
      val n = line.length
      while (i <= n) {
        if (i == n || line.charAt(i) == ' ') {
          if (i > start) {
            var h = 7
            var j = start
            while (j < i) { h = h * 31 + line.charAt(j); j += 1 }
            v(math.floorMod(h, dim)) += 1f
          }
          start = i + 1
        }
        i += 1
      }
    }
    v
  }

  /** Position-AWARE hashing encoder: each column hashes as
    * `(position, value)`, so the same literal in different feature
    * columns (the "1"/"0" flags of a GROBID data line — bold vs
    * largest-font vs single-char) stays distinguishable. The right
    * encoder for the fixed-column data-line format; [[hashingEncoder]]
    * remains the bag form for free text. */
  def positionalHashingEncoder(dim: Int): String => Array[Float] = { line =>
    val v = new Array[Float](dim)
    if (line != null) {
      var start = 0
      var i = 0
      var colIdx = 0
      val n = line.length
      while (i <= n) {
        if (i == n || line.charAt(i) == ' ') {
          if (i > start) {
            var h = 7 * 31 + colIdx
            var j = start
            while (j < i) { h = h * 31 + line.charAt(j); j += 1 }
            v(math.floorMod(h, dim)) += 1f
            colIdx += 1
          }
          start = i + 1
        }
        i += 1
      }
    }
    v
  }
}
