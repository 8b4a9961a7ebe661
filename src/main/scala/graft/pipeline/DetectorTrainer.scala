package graft.pipeline

import java.awt.Color
import java.awt.image.BufferedImage

/** In-repo training for the D5 layout detector — the p11 pattern
  * applied to the CV seam. The reference's detector weights come from
  * a PubLayNet checkpoint (`config.yml:105-108`), unreachable in a
  * zero-egress container, so the round-14 detector ran on hand-set
  * synthetic weights. This trainer FITS the anchor-scoring graph on
  * rendered layout fixtures and exports REAL ONNX bytes that
  * [[Onnx.detectorFromFile]] loads — the whole D5 path (pixels → luma
  * grid → trained graph → post-filter) becomes learned and
  * file-backed end to end.
  *
  * Model: independent per-anchor softmax heads over the SHARED grid
  * features — one Gemm `[nAnchors·(nCats+1) × grid²]` plus bias,
  * exported through [[Onnx.buildDenseModel]] (a single linear layer:
  * [[Onnx.detectorFromGraph]] consumes the flat logits row-per-anchor
  * by size, so no Reshape is needed). Training is full-batch gradient
  * descent on per-anchor cross-entropy: seeded, deterministic, and
  * driver-side — the fixture set is bounded by construction, while
  * the per-page FEATURE extraction is the same
  * [[graft.operators.Multimodal.decodeImage]] luma-grid pass
  * inference uses, so train and serve can never skew.
  */
object DetectorTrainer {

  /** One rendered page and its per-anchor truth: 0 = background,
    * `1 + catIdx` otherwise. */
  final case class Fixture(png: Array[Byte], labels: Array[Int])

  /** Render a synthetic layout page: per anchor, background (p≈0.4)
    * or one category — `figure` draws a solid box, `table` a striped
    * row pattern (the two are separable in per-cell mean luma, which
    * is exactly the feature the detector sees). Extents jitter so the
    * fit generalizes past one fixed darkness level. */
  def renderFixture(rnd: java.util.Random,
      anchors: Seq[(Double, Double, Double, Double)],
      nCats: Int, w: Int = 64, h: Int = 64): Fixture = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(Color.WHITE)
    g.fillRect(0, 0, w, h)
    g.setColor(Color.BLACK)
    val labels = anchors.map { case (ax, ay, aw, ah) =>
      val x0 = (ax * w).toInt
      val y0 = (ay * h).toInt
      val bw = (aw * w).toInt
      val bh = (ah * h).toInt
      val cls = if (rnd.nextDouble() < 0.4) 0 else 1 + rnd.nextInt(nCats)
      cls match {
        case 0 => () // background: stays white
        case 1 =>   // figure: solid box over 80–95% of the anchor —
          // solid ink must stay separable from the striped table class
          // in per-cell MEAN luma, the only feature the grid sees
          val cover = 0.8 + 0.15 * rnd.nextDouble()
          val fw = (bw * cover).toInt.max(2)
          val fh = (bh * cover).toInt.max(2)
          g.fillRect(x0 + (bw - fw) / 2, y0 + (bh - fh) / 2, fw, fh)
        case _ =>   // table: horizontal rules, ~35–50% ink coverage
          val rows = 3 + rnd.nextInt(3)
          val rowH = bh / (2 * rows)
          (0 until rows).foreach { r =>
            g.fillRect(x0 + bw / 10, y0 + bh / 10 + r * 2 * rowH,
              bw * 8 / 10, rowH.max(1))
          }
      }
      cls
    }.toArray
    g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    Fixture(out.toByteArray, labels)
  }

  /** Fit the per-anchor softmax heads on `nSamples` rendered fixtures
    * and export the trained graph as ONNX model bytes. */
  def train(anchors: Seq[(Double, Double, Double, Double)],
      categories: IndexedSeq[String], grid: Int = 4,
      nSamples: Int = 160, seed: Long = 7L, epochs: Int = 300,
      lr: Double = 2.0): Array[Byte] = {
    val nc = categories.length + 1
    val nA = anchors.length
    val d = grid * grid
    val rnd = new java.util.Random(seed)
    val data = (0 until nSamples).map { _ =>
      val f = renderFixture(rnd, anchors, categories.length)
      val emb = graft.operators.Multimodal.decodeImage(f.png, grid)
        .getOrElse(throw new IllegalStateException("fixture must decode"))
        ._4
      (emb, f.labels)
    }
    val wgt = Array.ofDim[Double](nA * nc, d)
    val bias = new Array[Double](nA * nc)
    var epoch = 0
    while (epoch < epochs) {
      val gw = Array.ofDim[Double](nA * nc, d)
      val gb = new Array[Double](nA * nc)
      data.foreach { case (x, labels) =>
        var a = 0
        while (a < nA) {
          // softmax over this anchor's nc logits
          val logits = Array.tabulate(nc) { c =>
            val r = a * nc + c
            var s = bias(r)
            var i = 0
            while (i < d) { s += wgt(r)(i) * x(i); i += 1 }
            s
          }
          val mx = logits.max
          val exps = logits.map(v => math.exp(v - mx))
          val z = exps.sum
          var c = 0
          while (c < nc) {
            val grad = exps(c) / z - (if (labels(a) == c) 1.0 else 0.0)
            val r = a * nc + c
            gb(r) += grad
            var i = 0
            while (i < d) { gw(r)(i) += grad * x(i); i += 1 }
            c += 1
          }
          a += 1
        }
      }
      var r = 0
      while (r < nA * nc) {
        bias(r) -= lr * gb(r) / nSamples
        var i = 0
        while (i < d) { wgt(r)(i) -= lr * gw(r)(i) / nSamples; i += 1 }
        r += 1
      }
      epoch += 1
    }
    val flat = new Array[Float](nA * nc * d)
    var r = 0
    while (r < nA * nc) {
      var i = 0
      while (i < d) { flat(r * d + i) = wgt(r)(i).toFloat; i += 1 }
      r += 1
    }
    Onnx.buildDenseModel(d,
      Seq(Onnx.Dense(flat, nA * nc, bias.map(_.toFloat), "")))
  }
}
