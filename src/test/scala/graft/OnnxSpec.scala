package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._

import graft.pipeline.{NeuralLabeler, Onnx}

/** The D2 production seam exercised end-to-end without network or an
  * ONNX Runtime jar: a tiny MLP scoring head is serialized to REAL
  * ONNX bytes (protobuf wire format built by hand in this spec — the
  * same public spec [[Onnx]] parses), loaded from disk through
  * [[Onnx.labelerFromFile]], and decoded through [[NeuralLabeler]];
  * output parity is pinned against an independently-computed closure
  * of the same network (reference analog:
  * `models/delft_model_impl.py:18-57`).
  */
class OnnxSpec extends SparkSuite {
  import spark.implicits._

  // ------------------------------------------- protobuf writer (fixture)

  private final class PbWriter {
    private val out = new java.io.ByteArrayOutputStream()
    def varint(v0: Long): this.type = {
      var v = v0
      while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt); this
    }
    def tag(field: Int, wire: Int): this.type = varint((field.toLong << 3) | wire)
    def bytes(field: Int, b: Array[Byte]): this.type = {
      tag(field, 2); varint(b.length); out.write(b); this
    }
    def str(field: Int, s: String): this.type =
      bytes(field, s.getBytes("UTF-8"))
    def msg(field: Int, w: PbWriter): this.type = bytes(field, w.result)
    def int(field: Int, v: Long): this.type = { tag(field, 0); varint(v) }
    def float32(field: Int, v: Float): this.type = {
      tag(field, 5)
      val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putFloat(v)
      out.write(bb.array()); this
    }
    def packedFloats(field: Int, vs: Array[Float]): this.type = {
      val bb = ByteBuffer.allocate(4 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(bb.putFloat)
      bytes(field, bb.array())
    }
    def result: Array[Byte] = out.toByteArray
  }

  /** TensorProto with packed float_data. */
  private def tensor(name: String, dims: Seq[Int], vs: Array[Float],
      raw: Boolean = false): PbWriter = {
    val w = new PbWriter
    dims.foreach(d => w.int(1, d))
    w.int(2, 1) // data_type FLOAT
    if (raw) {
      val bb = ByteBuffer.allocate(4 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(bb.putFloat)
      w.bytes(9, bb.array()) // raw_data
    } else w.packedFloats(4, vs) // float_data
    w.str(8, name)
    w
  }

  private def node(op: String, ins: Seq[String], outs: Seq[String],
      intAttrs: Map[String, Long] = Map.empty): PbWriter = {
    val w = new PbWriter
    ins.foreach(w.str(1, _))
    outs.foreach(w.str(2, _))
    w.str(4, op)
    intAttrs.foreach { case (k, v) =>
      val a = new PbWriter
      a.str(1, k); a.int(3, v); a.int(20, 2) // AttributeProto.type = INT
      w.msg(5, a)
    }
    w
  }

  private def valueInfo(name: String): PbWriter = {
    val w = new PbWriter; w.str(1, name); w
  }

  import OnnxSpec.{W1, b1, W2, b2, mlp}

  private def modelBytes: Array[Byte] = {
    val graph = new PbWriter
    graph.msg(1, node("MatMul", Seq("input", "W1"), Seq("h0")))
    graph.msg(1, node("Add", Seq("h0", "b1"), Seq("h1")))
    graph.msg(1, node("Tanh", Seq("h1"), Seq("h2")))
    graph.msg(1, node("Gemm", Seq("h2", "W2", "b2"), Seq("logits"),
      Map("transB" -> 1L)))
    graph.msg(5, tensor("W1", Seq(2, 3), W1))
    graph.msg(5, tensor("b1", Seq(3), b1, raw = true)) // raw_data path
    graph.msg(5, tensor("W2", Seq(2, 3), W2))
    graph.msg(5, tensor("b2", Seq(2), b2))
    graph.msg(11, valueInfo("input"))
    graph.msg(12, valueInfo("logits"))
    val model = new PbWriter
    model.int(1, 8) // ir_version (skipped by the parser, exercises skip)
    model.msg(7, graph)
    model.result
  }

  test("parse + run: hand-built ONNX bytes evaluate to the closure's output " +
      "(MatMul/Add/Tanh/Gemm-transB, float_data AND raw_data encodings)") {
    val g = Onnx.parse(modelBytes)
    assert(g.nodes.map(_.opType) == Seq("MatMul", "Add", "Tanh", "Gemm"))
    assert(g.initializers.keySet == Set("W1", "b1", "W2", "b2"))
    assert(g.inputNames == Seq("input") && g.outputNames == Seq("logits"))
    // raw_data decoded identically to float_data
    assert(g.initializers("b1").data.toSeq == b1.toSeq)
    val xs = Seq(Array(1.0f, -0.5f), Array(0.0f, 2.0f), Array(-3.0f, 0.25f))
    val out = Onnx.run(g,
      Map("input" -> Onnx.Tensor(Array(xs.size, 2), xs.flatten.toArray)))
    val logits = out("logits")
    assert(logits.dims.toSeq == Seq(xs.size, 2))
    xs.zipWithIndex.foreach { case (x, i) =>
      val expect = mlp(x)
      (0 until 2).foreach { y =>
        assert(math.abs(logits.data(i * 2 + y) - expect(y)) < 1e-5f,
          s"row $i label $y: ${logits.data(i * 2 + y)} vs ${expect(y)}")
      }
    }
  }

  test("labelerFromFile: the ONNX-backed NeuralLabeler decodes a token " +
      "table identically to the injected-closure labeler, and a missing " +
      "file degrades to None") {
    val labels = IndexedSeq("O", "B-<t>")
    // feature string "a b" → vector (a, b)
    val encode: String => Array[Float] = s => {
      val p = s.split(" "); Array(p(0).toFloat, p(1).toFloat)
    }
    val f = java.nio.file.Files.createTempFile("graft-onnx", ".onnx")
    java.nio.file.Files.write(f, modelBytes)
    try {
      val tokens = Seq(
        (0L, 0, 0, 0, 0, "t0", " ", "1.0 -0.5"),
        (0L, 0, 0, 0, 1, "t1", " ", "0.0 2.0"),
        (1L, 0, 0, 0, 0, "t2", " ", "-3.0 0.25"),
        (1L, 0, 0, 0, 1, "t3", " ", "4.0 4.0"))
        .toDF("doc_id", "page_idx", "block_idx", "line_idx", "token_idx",
          "text", "whitespace", "features")
      val onnxLab = Onnx.labelerFromFile(f.toString, labels, encode,
        featDim = 2).get
      val closureLab = new NeuralLabeler(labels, encode,
        docs => docs.map(_.map(mlp)))
      def labelsOf(l: NeuralLabeler) = l.label(tokens)
        .select("doc_id", "token_idx", "label")
        .as[(Long, Int, String)].collect().sortBy(r => (r._1, r._2)).toSeq
      val a = labelsOf(onnxLab)
      val b = labelsOf(closureLab)
      assert(a == b, s"onnx $a vs closure $b")
      assert(a.map(_._3).distinct.size == 2, a) // both labels exercised
      assert(Onnx.labelerFromFile("/nonexistent/m.onnx", labels, encode,
        featDim = 2).isEmpty)
    } finally java.nio.file.Files.delete(f)
  }

  // ------------------------------------------------- BiLSTM scoring head

  /** The DELFT-shaped graph: [len, feat] input → Unsqueeze to
    * [len, 1, feat] → bidirectional LSTM (H per direction) → Y
    * [len, 2, 1, H] → Transpose [len, 1, 2, H] → Reshape [len, 2H] →
    * Gemm dense → [len, nLabels]. Exactly the glue an exporter emits
    * around a recurrent encoder. */
  private def bilstmModelBytes(inputSize: Int, h: Int, nLabels: Int,
      w: Array[Float], r: Array[Float], b: Array[Float],
      dW: Array[Float], dB: Array[Float]): Array[Byte] = {
    val graph = new PbWriter
    // Unsqueeze axes as an INT64 initializer input (opset-13 style)
    graph.msg(5, int64Tensor("uax", Seq(1), Array(1L)))
    graph.msg(5, tensor("W", Seq(2, 4 * h, inputSize), w))
    graph.msg(5, tensor("R", Seq(2, 4 * h, h), r))
    graph.msg(5, tensor("B", Seq(2, 8 * h), b))
    graph.msg(5, int64Tensor("shape", Seq(2), Array(0L, -1L)))
    graph.msg(5, tensor("DW", Seq(nLabels, 2 * h), dW)) // Gemm transB
    graph.msg(5, tensor("DB", Seq(nLabels), dB))
    graph.msg(1, node("Unsqueeze", Seq("input", "uax"), Seq("x3")))
    graph.msg(1, nodeWithStr("LSTM", Seq("x3", "W", "R", "B"),
      Seq("Y", "Yh", "Yc"), Map("hidden_size" -> (h: Long)),
      Map("direction" -> "bidirectional")))
    graph.msg(1, nodeWithInts("Transpose", Seq("Y"), Seq("yt"),
      "perm", List(0L, 2L, 1L, 3L)))
    graph.msg(1, node("Reshape", Seq("yt", "shape"), Seq("flat")))
    graph.msg(1, node("Gemm", Seq("flat", "DW", "DB"), Seq("logits"),
      Map("transB" -> 1L)))
    graph.msg(11, valueInfo("input"))
    graph.msg(12, valueInfo("logits"))
    val model = new PbWriter
    model.msg(7, graph)
    model.result
  }

  private def int64Tensor(name: String, dims: Seq[Int],
      vs: Array[Long]): PbWriter = {
    val w = new PbWriter
    dims.foreach(d => w.int(1, d))
    w.int(2, 7) // INT64
    val bb = ByteBuffer.allocate(8 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(bb.putLong)
    w.bytes(9, bb.array()) // raw_data
    w.str(8, name)
    w
  }

  private def nodeWithStr(op: String, ins: Seq[String], outs: Seq[String],
      intAttrs: Map[String, Long], strAttrs: Map[String, String]): PbWriter = {
    val w = node(op, ins, outs, intAttrs)
    strAttrs.foreach { case (k, v) =>
      val a = new PbWriter
      a.str(1, k); a.str(4, v); a.int(20, 3) // AttributeProto.type = STRING
      w.msg(5, a)
    }
    w
  }

  private def nodeWithInts(op: String, ins: Seq[String], outs: Seq[String],
      attr: String, vs: List[Long]): PbWriter = {
    val w = node(op, ins, outs)
    val a = new PbWriter
    a.str(1, attr)
    vs.foreach(a.int(8, _)) // ints, unpacked
    a.int(20, 7)            // AttributeProto.type = INTS
    w.msg(5, a)
    w
  }

  /** Independent BiLSTM recurrence straight from the published
    * equations (iofc gate order, B = Wb ++ Rb), then the dense head —
    * the parity reference for the graph above. */
  private def bilstmClosure(inputSize: Int, h: Int, nLabels: Int,
      w: Array[Float], r: Array[Float], b: Array[Float],
      dW: Array[Float], dB: Array[Float])(
      xs: Seq[Array[Float]]): Seq[Array[Float]] = {
    val n = xs.size
    def sig(v: Double) = 1.0 / (1.0 + math.exp(-v))
    def runDir(d: Int, order: Seq[Int]): Array[Array[Double]] = {
      val out = Array.ofDim[Double](n, h)
      val hs = new Array[Double](h)
      val cs = new Array[Double](h)
      order.foreach { t =>
        val gates = Array.tabulate(4 * h) { g =>
          var s = 0.0
          (0 until inputSize).foreach(k =>
            s += xs(t)(k) * w(d * 4 * h * inputSize + g * inputSize + k))
          (0 until h).foreach(k => s += hs(k) * r(d * 4 * h * h + g * h + k))
          s + b(d * 8 * h + g) + b(d * 8 * h + 4 * h + g)
        }
        (0 until h).foreach { j =>
          val i = sig(gates(j)); val o = sig(gates(h + j))
          val f = sig(gates(2 * h + j)); val ct = math.tanh(gates(3 * h + j))
          cs(j) = f * cs(j) + i * ct
          hs(j) = o * math.tanh(cs(j))
          out(t)(j) = hs(j)
        }
      }
      out
    }
    val fwd = runDir(0, 0 until n)
    val bwd = runDir(1, (n - 1) to 0 by -1)
    (0 until n).map { t =>
      // float-precision staging mirrors the graph (Y is float32)
      val hcat = (fwd(t).map(_.toFloat) ++ bwd(t).map(_.toFloat))
      Array.tabulate(nLabels) { y =>
        var s = 0f
        (0 until 2 * h).foreach(k => s += hcat(k) * dW(y * 2 * h + k))
        s + dB(y)
      }
    }
  }

  test("BiLSTM graph: Unsqueeze→LSTM(bidirectional)→Transpose→Reshape→" +
      "Gemm evaluates to the independent recurrence, and zero weights " +
      "reduce to the dense bias") {
    val (inF, h, nl) = (2, 2, 2)
    val rnd = new scala.util.Random(7)
    def arr(n: Int) = Array.fill(n)((rnd.nextFloat() - 0.5f))
    val w = arr(2 * 4 * h * inF)
    val r = arr(2 * 4 * h * h)
    val b = arr(2 * 8 * h)
    val dW = arr(nl * 2 * h)
    val dB = arr(nl)
    val g = Onnx.parse(bilstmModelBytes(inF, h, nl, w, r, b, dW, dB))
    val xs = Seq(Array(0.6f, -1.2f), Array(2.0f, 0.1f), Array(-0.4f, 0.9f),
      Array(1.1f, 1.1f))
    val got = Onnx.run(g,
      Map("input" -> Onnx.Tensor(Array(xs.size, inF), xs.flatten.toArray)))
      .apply("logits")
    assert(got.dims.toSeq == Seq(xs.size, nl))
    val expect = bilstmClosure(inF, h, nl, w, r, b, dW, dB)(xs)
    xs.indices.foreach { t =>
      (0 until nl).foreach { y =>
        assert(math.abs(got.data(t * nl + y) - expect(t)(y)) < 1e-4f,
          s"t=$t y=$y: ${got.data(t * nl + y)} vs ${expect(t)(y)}")
      }
    }
    // zero-weight hand check: every gate is 0 ⟹ h ≡ 0 ⟹ logits = bias
    val z = Onnx.run(Onnx.parse(bilstmModelBytes(inF, h, nl,
        Array.fill(2 * 4 * h * inF)(0f), Array.fill(2 * 4 * h * h)(0f),
        Array.fill(2 * 8 * h)(0f), Array.fill(nl * 2 * h)(1f),
        Array(0.25f, -0.75f))),
      Map("input" -> Onnx.Tensor(Array(2, inF), Array(9f, 9f, -9f, -9f))))
      .apply("logits")
    assert(z.data.toSeq == Seq(0.25f, -0.75f, 0.25f, -0.75f), z.data.toSeq)
  }

  test("buildDenseModel round-trips through parse/run, and scoreRows " +
      "batches a partition into one evaluation (q122's machinery)") {
    val bytes = Onnx.buildDenseModel(2, Seq(
      Onnx.Dense(Array(0.5f, -0.25f, 0.25f, 0.125f), 2, Array(2f, -1f), "Relu"),
      Onnx.Dense(Array(1.0f, -0.5f), 1, Array(0.25f), "")))
    val g = Onnx.parse(bytes)
    assert(g.nodes.map(_.opType) == Seq("Gemm", "Relu", "Gemm"))
    assert(g.inputNames == Seq("input") && g.outputNames == Seq("score"))
    def expect(x1: Double, x2: Double): Double =
      1.0 * math.max(0, 0.5 * x1 - 0.25 * x2 + 2) -
        0.5 * math.max(0, 0.25 * x1 + 0.125 * x2 - 1) + 0.25
    val df = Seq((0L, 10L, 4L), (1L, 0L, 100L), (2L, 7L, 7L))
      .toDF("doc_id", "x1", "x2")
    val got = Onnx.scoreRows(df, g, Seq("x1", "x2"))
      .as[(Long, Double)].collect().sortBy(_._1)
    // dyadic weights on integer features: float32 ≡ float64, EXACT
    assert(got.toSeq == Seq((0L, expect(10, 4)), (1L, expect(0, 100)),
      (2L, expect(7, 7))), got.toSeq)
  }

  test("fuzz: random dense stacks round-trip through bytes and match " +
      "direct double-precision math") {
    val rnd = new scala.util.Random(20260816L)
    (0 until 40).foreach { trial =>
      val nLayers = 1 + rnd.nextInt(3)
      var in = 1 + rnd.nextInt(4)
      val inputDim = in
      // dyadic weights (k/16, |w| ≤ 0.5) keep float32 exact against
      // double for Relu/linear through 3 stacked layers (worst-case
      // magnitude × 2^12 fraction bits stays under 2^24);
      // tanh/sigmoid trials assert to 1e-4 instead
      def dy() = (rnd.nextInt(17) - 8) / 16.0f
      val acts = Array("Relu", "", "Tanh", "Sigmoid")
      val layers = (0 until nLayers).map { i =>
        val out = 1 + rnd.nextInt(5)
        val l = Onnx.Dense(Array.fill(out * in)(dy()), out,
          Array.fill(out)(dy()),
          if (i == nLayers - 1) "" else acts(rnd.nextInt(acts.length)))
        in = out
        l
      }
      val exact = layers.forall(l =>
        l.activation == "Relu" || l.activation.isEmpty)
      val g = Onnx.parse(Onnx.buildDenseModel(inputDim, layers))
      val n = 1 + rnd.nextInt(6)
      val xs = Array.fill(n * inputDim)((rnd.nextInt(17) - 8).toFloat)
      val got = Onnx.run(g,
        Map("input" -> Onnx.Tensor(Array(n, inputDim), xs))).apply("score")
      // direct double math
      var cur: Array[Array[Double]] =
        Array.tabulate(n, inputDim)((r, c) => xs(r * inputDim + c).toDouble)
      layers.foreach { l =>
        val inD = cur(0).length
        cur = cur.map { row =>
          Array.tabulate(l.outDim) { o =>
            var s = 0.0
            (0 until inD).foreach(k => s += row(k) * l.w(o * inD + k))
            s += l.b(o)
            l.activation match {
              case "Relu" => math.max(0.0, s)
              case "Tanh" => math.tanh(s)
              case "Sigmoid" => 1.0 / (1.0 + math.exp(-s))
              case _ => s
            }
          }
        }
      }
      val outDim = layers.last.outDim
      assert(got.dims.toSeq == Seq(n, outDim), s"trial $trial: $got")
      (0 until n).foreach { r =>
        (0 until outDim).foreach { c =>
          val a = got.data(r * outDim + c).toDouble
          val e = cur(r)(c)
          if (exact) assert(a == e, s"trial $trial [$r,$c]: $a vs $e")
          else assert(math.abs(a - e) < 1e-4,
            s"trial $trial [$r,$c]: $a vs $e")
        }
      }
    }
  }

  test("ONNX-backed layout detector: real PNG pixels through ImageIO → " +
      "luma grid → anchor scoring → detectBoxesScored (the D5 seam with " +
      "a real model file)") {
    import graft.pipeline.GraphicProvider
    // grid 4, four quadrant anchors, one category; class-1 logit of
    // anchor q = 4 − 8·(sum of q's luma cells): a DARK quadrant scores
    // +4 (fires), a white one −28 (background)
    val quads = Seq(
      (0.0, 0.0, 0.5, 0.5), (0.5, 0.0, 0.5, 0.5),
      (0.0, 0.5, 0.5, 0.5), (0.5, 0.5, 0.5, 0.5))
    val cells = Seq(Seq(0, 1, 4, 5), Seq(2, 3, 6, 7),
      Seq(8, 9, 12, 13), Seq(10, 11, 14, 15))
    val w = Array.ofDim[Float](8 * 16) // rows: anchor*2 + class, transB
    val b = new Array[Float](8)
    (0 until 4).foreach { q =>
      val r = q * 2 + 1
      cells(q).foreach(c => w(r * 16 + c) = -8f)
      b(r) = 4f
    }
    val graph = new PbWriter
    graph.msg(5, tensor("W", Seq(8, 16), w))
    graph.msg(5, tensor("B", Seq(8), b))
    graph.msg(5, int64Tensor("shape", Seq(2), Array(4L, 2L)))
    graph.msg(1, node("Gemm", Seq("input", "W", "B"), Seq("g0"),
      Map("transB" -> 1L)))
    graph.msg(1, node("Reshape", Seq("g0", "shape"), Seq("scores")))
    graph.msg(11, valueInfo("input"))
    graph.msg(12, valueInfo("scores"))
    val model = new PbWriter
    model.msg(7, graph)
    val f = java.nio.file.Files.createTempFile("graft-det", ".onnx")
    java.nio.file.Files.write(f, model.result)
    try {
      // white 64×64 page with a black top-left quadrant, real PNG bytes
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val gfx = img.createGraphics()
      gfx.setColor(java.awt.Color.WHITE); gfx.fillRect(0, 0, 64, 64)
      gfx.setColor(java.awt.Color.BLACK); gfx.fillRect(0, 0, 32, 32)
      gfx.dispose()
      val png = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", png)
      val det = Onnx.detectorFromFile(f.toString, IndexedSeq("figure"),
        quads, grid = 4).get
      // the raw closure fires exactly the dark quadrant
      val raw = det(png.toByteArray)
      assert(raw.map(r => (r._1, r._2, r._3, r._4, r._5)) ==
        Seq((0.0, 0.0, 32.0, 32.0, "figure")), raw)
      assert(raw.head._6 > 0.95, raw)
      // end-to-end through the reference's post-filter seam
      val pages = Seq((7L, 1, png.toByteArray))
        .toDF("doc_id", "page_number", "image")
      val boxes = GraphicProvider.detectBoxesScored(pages, det,
          typeNames = Set("figure"), scoreThreshold = 0.5)
        .select("doc_id", "page_number", "cv_id", "x", "y", "width",
          "height", "category")
        .as[(Long, Int, String, Double, Double, Double, Double, String)]
        .collect().toSeq
      assert(boxes == Seq((7L, 1, "cv_1_0", 0.0, 0.0, 32.0, 32.0,
        "figure")), boxes)
      // undecodable bytes detect nothing rather than throwing
      assert(det(Array[Byte](1, 2, 3)).isEmpty)
      assert(Onnx.detectorFromFile("/nonexistent/d.onnx",
        IndexedSeq("figure"), quads).isEmpty)
    } finally java.nio.file.Files.delete(f)
  }

  test("parse rejects a default-domain opset outside the tested range, " +
      "accepts one inside it, and ignores other domains") {
    def withOpset(domain: String, version: Long): Array[Byte] = {
      val graph = new PbWriter
      graph.msg(1, node("Identity", Seq("input"), Seq("out")))
      graph.msg(11, valueInfo("input"))
      graph.msg(12, valueInfo("out"))
      val model = new PbWriter
      model.int(1, 8)
      model.msg(7, graph)
      val op = new PbWriter
      if (domain.nonEmpty) op.str(1, domain)
      op.int(2, version)
      model.msg(8, op)
      model.result
    }
    val e = intercept[IllegalArgumentException] {
      Onnx.parse(withOpset("", Onnx.SupportedOpsetRange.end + 3L))
    }
    assert(e.getMessage.contains("unsupported ONNX opset"), e.getMessage)
    intercept[IllegalArgumentException] {
      Onnx.parse(withOpset("ai.onnx", Onnx.SupportedOpsetRange.start - 2L))
    }
    // inside the range, and a custom domain's version, both parse fine
    assert(Onnx.parse(withOpset("", 13L)).nodes.nonEmpty)
    assert(Onnx.parse(withOpset("com.example", 99L)).nodes.nonEmpty)
    // buildDenseModel stamps an in-range opset (field exercised end-to-end)
    assert(Onnx.parse(Onnx.buildDenseModel(1,
      Seq(Onnx.Dense(Array(1f), 1, Array(0f), "")))).nodes.nonEmpty)
  }

  test("LSTM rejects unimplemented optional inputs and attributes loudly " +
      "instead of evaluating silently wrong") {
    val (inF, h) = (2, 2)
    def lstmModel(extraIns: Seq[String] = Seq.empty,
        strAttrs: Map[String, String] = Map.empty,
        intAttrs: Map[String, Long] = Map.empty): Onnx.Graph = {
      val graph = new PbWriter
      graph.msg(5, int64Tensor("uax", Seq(1), Array(1L)))
      graph.msg(5, tensor("W", Seq(1, 4 * h, inF), Array.fill(4 * h * inF)(0f)))
      graph.msg(5, tensor("R", Seq(1, 4 * h, h), Array.fill(4 * h * h)(0f)))
      graph.msg(5, tensor("B", Seq(1, 8 * h), Array.fill(8 * h)(0f)))
      extraIns.filter(_.nonEmpty).foreach(nm =>
        graph.msg(5, tensor(nm, Seq(1), Array(0f))))
      graph.msg(1, node("Unsqueeze", Seq("input", "uax"), Seq("x3")))
      graph.msg(1, nodeWithStr("LSTM",
        Seq("x3", "W", "R", "B") ++ extraIns, Seq("Y"),
        Map("hidden_size" -> (h: Long)) ++ intAttrs, strAttrs))
      graph.msg(11, valueInfo("input"))
      graph.msg(12, valueInfo("Y"))
      val model = new PbWriter
      model.msg(7, graph)
      Onnx.parse(model.result)
    }
    val x = Map("input" -> Onnx.Tensor(Array(2, inF), Array(1f, 2f, 3f, 4f)))
    // baseline shape runs
    assert(Onnx.run(lstmModel(), x).apply("Y").size == 2 * h)
    // trailing EMPTY optional slots are fine (exporters pad with "")
    assert(Onnx.run(lstmModel(extraIns = Seq("", "")), x)
      .apply("Y").size == 2 * h)
    val e1 = intercept[IllegalArgumentException] {
      Onnx.run(lstmModel(extraIns = Seq("seq_lens")), x)
    }
    assert(e1.getMessage.contains("LSTM optional inputs"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Onnx.run(lstmModel(strAttrs = Map("activations" -> "Relu")), x)
    }
    assert(e2.getMessage.contains("'activations' unsupported"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      Onnx.run(lstmModel(intAttrs = Map("input_forget" -> 1L)), x)
    }
    assert(e3.getMessage.contains("'input_forget'"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException] {
      Onnx.run(lstmModel(intAttrs = Map("layout" -> 1L)), x)
    }
    assert(e4.getMessage.contains("layout"), e4.getMessage)
  }

  test("Softmax accepts only the last axis; multi-output graphs score by " +
      "output NAME, not map order") {
    def softmaxModel(axis: Option[Long]): Onnx.Graph = {
      val graph = new PbWriter
      graph.msg(1, axis match {
        case Some(a) => node("Softmax", Seq("input"), Seq("out"),
          Map("axis" -> a))
        case None => node("Softmax", Seq("input"), Seq("out"))
      })
      graph.msg(11, valueInfo("input"))
      graph.msg(12, valueInfo("out"))
      val model = new PbWriter
      model.msg(7, graph)
      Onnx.parse(model.result)
    }
    val x = Map("input" -> Onnx.Tensor(Array(2, 2), Array(0f, 0f, 0f, 0f)))
    assert(Onnx.run(softmaxModel(None), x).apply("out").data.forall(_ == 0.5f))
    assert(Onnx.run(softmaxModel(Some(-1L)), x)
      .apply("out").data.forall(_ == 0.5f))
    assert(Onnx.run(softmaxModel(Some(1L)), x)
      .apply("out").data.forall(_ == 0.5f))
    val e = intercept[IllegalArgumentException] {
      Onnx.run(softmaxModel(Some(0L)), x)
    }
    assert(e.getMessage.contains("Softmax axis=0"), e.getMessage)

    // a graph exposing >4 outputs (Scala Map loses insertion order there):
    // "score" must still be selected by name as the FIRST declared output
    val graph = new PbWriter
    graph.msg(5, tensor("W", Seq(1, 1), Array(2f)))
    graph.msg(5, tensor("B", Seq(1), Array(1f)))
    graph.msg(1, node("Gemm", Seq("input", "W", "B"), Seq("score"),
      Map("transB" -> 1L)))
    (1 to 5).foreach { i =>
      graph.msg(1, node("Mul", Seq("score", "W"), Seq(s"dbg$i")))
    }
    graph.msg(11, valueInfo("input"))
    graph.msg(12, valueInfo("score"))
    (1 to 5).foreach(i => graph.msg(12, valueInfo(s"dbg$i")))
    val model = new PbWriter
    model.msg(7, graph)
    val g = Onnx.parse(model.result)
    assert(g.outputNames.head == "score" && g.outputNames.size == 6)
    val scored = Onnx.scoreRows(Seq((0L, 3L), (1L, 5L)).toDF("doc_id", "x"),
        g, Seq("x"))
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(scored == Seq((0L, 7.0), (1L, 11.0)), scored) // 2x+1, not dbg 2(2x+1)
  }

  test("scoreRows fails with a locatable message on a null feature") {
    val g = Onnx.parse(Onnx.buildDenseModel(1,
      Seq(Onnx.Dense(Array(1f), 1, Array(0f), ""))))
    val df = Seq((0L, Some(4L)), (1L, None))
      .toDF("doc_id", "x")
    val e = intercept[Exception] {
      Onnx.scoreRows(df, g, Seq("x")).collect()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(msgs.contains("null 'x'"), msgs)
  }

  test("D5 trained in-repo: the fitted anchor graph (rendered fixtures " +
      "-> GD -> ONNX file) beats the synthetic-weights floor on held-out " +
      "pages and separates figure from table") {
    import graft.pipeline.DetectorTrainer
    val quads = Seq(
      (0.0, 0.0, 0.5, 0.5), (0.5, 0.0, 0.5, 0.5),
      (0.0, 0.5, 0.5, 0.5), (0.5, 0.5, 0.5, 0.5))
    val cats = IndexedSeq("figure", "table")
    val bytes = DetectorTrainer.train(quads, cats, grid = 4,
      nSamples = 160, seed = 7L)
    val f = java.nio.file.Files.createTempFile("graft-det-trained", ".onnx")
    java.nio.file.Files.write(f, bytes)
    try {
      val trained = Onnx.detectorFromFile(f.toString, cats, quads,
        grid = 4).get
      // the round-14 synthetic-weights floor: class "figure" fires on
      // any dark quadrant, "table" has zero weights — it cannot tell
      // the two apart
      val w = Array.ofDim[Float](12 * 16)
      val b = new Array[Float](12)
      val cells = Seq(Seq(0, 1, 4, 5), Seq(2, 3, 6, 7),
        Seq(8, 9, 12, 13), Seq(10, 11, 14, 15))
      (0 until 4).foreach { q =>
        val r = q * 3 + 1
        cells(q).foreach(c => w(r * 16 + c) = -8f)
        b(r) = 4f
      }
      val floor = Onnx.detectorFromGraph(
        Onnx.parse(Onnx.buildDenseModel(16,
          Seq(Onnx.Dense(w, 12, b, "")))), cats, quads, grid = 4)
      // held-out fixtures from a DIFFERENT seed
      val rnd = new java.util.Random(99L)
      def anchorIdx(x: Double, y: Double): Int =
        quads.indexWhere { case (ax, ay, _, _) =>
          math.abs(ax * 64 - x) < 1 && math.abs(ay * 64 - y) < 1 }
      def accuracy(det: Array[Byte] => Seq[(Double, Double, Double, Double, String, Double)],
          fixtures: Seq[DetectorTrainer.Fixture]): Double = {
        var ok = 0
        var total = 0
        fixtures.foreach { fx =>
          val pred = Array.fill(4)(0)
          det(fx.png).foreach { case (x, y, _, _, cat, _) =>
            val a = anchorIdx(x, y)
            if (a >= 0) pred(a) = cats.indexOf(cat) + 1
          }
          (0 until 4).foreach { a =>
            if (pred(a) == fx.labels(a)) ok += 1
            total += 1
          }
        }
        ok.toDouble / total
      }
      val heldOut = (0 until 40).map(_ =>
        DetectorTrainer.renderFixture(rnd, quads, cats.length))
      val accTrained = accuracy(trained, heldOut)
      val accFloor = accuracy(floor, heldOut)
      assert(accTrained > accFloor,
        s"trained $accTrained must beat floor $accFloor")
      assert(accTrained >= 0.95, s"trained accuracy $accTrained")
      // the floor's specific failure: it calls tables figures
      val tablePage = {
        val r2 = new java.util.Random(5L)
        Iterator.continually(
          DetectorTrainer.renderFixture(r2, quads, cats.length))
          .find(_.labels.contains(2)).get
      }
      val ta = tablePage.labels.indexOf(2)
      val trainedCat = trained(tablePage.png).collectFirst {
        case (x, y, _, _, cat, _) if anchorIdx(x, y) == ta => cat }
      assert(trainedCat.contains("table"), s"trained said $trainedCat")
    } finally java.nio.file.Files.delete(f)
  }

  test("unsupported op and missing input fail loudly, not silently") {
    val graph = new PbWriter
    graph.msg(1, node("Conv", Seq("input"), Seq("out")))
    graph.msg(11, valueInfo("input"))
    graph.msg(12, valueInfo("out"))
    val model = new PbWriter
    model.msg(7, graph)
    val g = Onnx.parse(model.result)
    val e = intercept[IllegalArgumentException] {
      Onnx.run(g, Map("input" -> Onnx.Tensor(Array(1, 2), Array(0f, 0f))))
    }
    assert(e.getMessage.contains("unsupported ONNX op 'Conv'"))
    val g2 = Onnx.parse(modelBytes)
    val e2 = intercept[IllegalArgumentException] {
      Onnx.run(g2, Map.empty)
    }
    assert(e2.getMessage.contains("missing input"))
  }
}

/** The fixture network lives OUTSIDE the suite so the parity closure
  * serializes without capturing scalatest state. */
object OnnxSpec {
  // the 2→3→2 MLP: logits = tanh(x·W1 + b1)·W2ᵀ·1.0 + b2 (Gemm transB)
  val W1 = Array(0.5f, -1.0f, 0.25f, 1.5f, 0.75f, -0.5f) // [2x3]
  val b1 = Array(0.1f, -0.2f, 0.3f)                      // [3]
  val W2 = Array(1.0f, -0.5f, 0.25f, -1.0f, 0.5f, 2.0f)  // [2x3] (transB)
  val b2 = Array(0.05f, -0.05f)                          // [2]

  /** The same network as a plain closure — the parity reference. */
  def mlp(x: Array[Float]): Array[Float] = {
    val h = Array.tabulate(3) { j =>
      math.tanh(x(0) * W1(j) + x(1) * W1(3 + j) + b1(j)).toFloat
    }
    Array.tabulate(2) { y =>
      h(0) * W2(y * 3) + h(1) * W2(y * 3 + 1) + h(2) * W2(y * 3 + 2) + b2(y)
    }
  }
}
