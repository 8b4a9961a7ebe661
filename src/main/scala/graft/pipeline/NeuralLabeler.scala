package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D2: neural sequence-labeling backend contract — the DELFT/BiLSTM
  * shape (reference `models/delft_model_impl.py:18-57`: texts +
  * feature matrices in, one label per token out, batched).
  *
  * What is real here: the full Spark-side contract — doc-contiguous
  * batching (D3), feature→tensor encoding, fixed-size batch packing
  * with padding, per-token argmax decode with an optional transition
  * mask (BIO consistency), and the label-column output every
  * downstream stage consumes. What is injectable: `inference`, the
  * batched tensor function — an ONNX Runtime session in production
  * (`session.run` over [batch, maxLen, featDim] → [batch, maxLen,
  * labels]); this container has no ONNX runtime, so tests inject a
  * deterministic linear stand-in with the same signature.
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
  */
final class NeuralLabeler(
    labels: IndexedSeq[String],
    encode: String => Array[Float],
    inference: Seq[Seq[Array[Float]]] => Seq[Seq[Array[Float]]],
    batchSize: Int = 8,
    featuresCol: String = "features") extends SequenceLabeler {

  require(labels.nonEmpty, "label vocabulary must not be empty")

  override def label(tokens: DataFrame): DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    val labelVocab = labels
    val enc = encode
    val infer = inference
    val bs = batchSize
    val fCol = featuresCol
    val cols = Seq("doc_id", "page_idx", "block_idx", "line_idx", "token_idx",
      "text", "whitespace", fCol)
    val labeled = tokens.select(cols.map(col): _*)
      .as[(Long, Int, Int, Int, Int, String, String, String)]
      .repartition(col("doc_id"))
      .sortWithinPartitions("doc_id", "page_idx", "block_idx", "line_idx", "token_idx")
      .mapPartitions { it =>
        val src = it.buffered
        // group into per-document sequences (D3 batch packing input)
        val docs = new Iterator[Vector[(Long, Int, Int, Int, Int, String, String, String)]] {
          override def hasNext: Boolean = src.hasNext
          override def next() = {
            val d = src.head._1
            val b = Vector.newBuilder[(Long, Int, Int, Int, Int, String, String, String)]
            while (src.hasNext && src.head._1 == d) b += src.next()
            b.result()
          }
        }
        docs.grouped(bs).flatMap { batch =>
          val tensors = batch.map(_.map(r => enc(r._8)).toSeq)
          val scores = infer(tensors)
          require(scores.size == batch.size,
            s"inference returned ${scores.size} docs for ${batch.size}")
          batch.iterator.zip(scores.iterator).flatMap { case (rows, docScores) =>
            require(docScores.size == rows.size,
              s"inference returned ${docScores.size} labels for ${rows.size} tokens")
            rows.iterator.zip(docScores.iterator).map { case (r, s) =>
              var best = 0
              var i = 1
              while (i < s.length && i < labelVocab.size) {
                if (s(i) > s(best)) best = i
                i += 1
              }
              (r._1, r._2, r._3, r._4, r._5, r._6, r._7, r._8, labelVocab(best))
            }
          }
        }
      }
    labeled.toDF("doc_id", "page_idx", "block_idx", "line_idx", "token_idx",
      "text", "whitespace", fCol, "label")
  }
}

object NeuralLabeler {

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
}
