package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-repo training for the D2 neural seam — the p11 self-training
  * pattern with an ONNX artifact. The reference's DELFT checkpoints
  * (`config.yml:77-103`) are unreachable in a zero-egress container,
  * so the engine trains its own per-token scoring head on the corpus's
  * feature lines + rule labels, exports REAL ONNX bytes
  * ([[Onnx.buildDenseModel]]), and decodes back through the same
  * [[Onnx.labelerFromFile]] path a shipped model would take — train →
  * serialize → load → batched inference → masked-Viterbi decode, all
  * in-engine. The BiLSTM context encoder itself stays
  * environment-blocked (publishing-grade weights need the real
  * corpus); [[NeuralLabeler]]'s transition mask supplies the label
  * structure DELFT's CRF layer would.
  */
object NeuralTrainer {

  /** Fit a softmax scoring head on labeled feature lines and export it
    * as ONNX model bytes. The training sample is BOUNDED and
    * deterministic (hash-ordered `limit maxTokens` — the q87
    * classifier discipline for driver-side fits); featurization is the
    * same encoder inference will use, so train and serve can never
    * skew.
    *
    * @return (label vocabulary in score order, ONNX model bytes)
    */
  def trainDenseHead(labeled: DataFrame,
      encode: String => Array[Float], featDim: Int,
      maxTokens: Int = 20000, epochs: Int = 80, lr: Double = 0.5,
      featuresCol: String = "features",
      labelCol: String = "label"): (IndexedSeq[String], Array[Byte]) = {
    val labels = labeled.select(labelCol).distinct()
      .collect().map(_.getString(0)).sorted.toIndexedSeq
    require(labels.nonEmpty, "no labels to train on")
    val idx = labels.zipWithIndex.toMap
    val sample = labeled
      .select(col(featuresCol), col(labelCol),
        xxhash64(col("doc_id"), col("page_idx"), col("block_idx"),
          col("line_idx"), col("token_idx")).as("_h"))
      .orderBy("_h")
      .limit(maxTokens)
      .collect()
      .map(r => (encode(r.getString(0)), idx(r.getString(1))))
    val nc = labels.size
    val w = Array.ofDim[Double](nc, featDim)
    val b = new Array[Double](nc)
    var epoch = 0
    while (epoch < epochs) {
      val gw = Array.ofDim[Double](nc, featDim)
      val gb = new Array[Double](nc)
      sample.foreach { case (x, y) =>
        val logits = Array.tabulate(nc) { c =>
          var s = b(c)
          var i = 0
          while (i < featDim) { s += w(c)(i) * x(i); i += 1 }
          s
        }
        val mx = logits.max
        val exps = logits.map(v => math.exp(v - mx))
        val z = exps.sum
        var c = 0
        while (c < nc) {
          val grad = exps(c) / z - (if (y == c) 1.0 else 0.0)
          gb(c) += grad
          var i = 0
          while (i < featDim) { gw(c)(i) += grad * x(i); i += 1 }
          c += 1
        }
      }
      var c = 0
      while (c < nc) {
        b(c) -= lr * gb(c) / sample.length
        var i = 0
        while (i < featDim) { w(c)(i) -= lr * gw(c)(i) / sample.length; i += 1 }
        c += 1
      }
      epoch += 1
    }
    val flat = new Array[Float](nc * featDim)
    var c = 0
    while (c < nc) {
      var i = 0
      while (i < featDim) { flat(c * featDim + i) = w(c)(i).toFloat; i += 1 }
      c += 1
    }
    (labels, Onnx.buildDenseModel(featDim,
      Seq(Onnx.Dense(flat, nc, b.map(_.toFloat), ""))))
  }
}
