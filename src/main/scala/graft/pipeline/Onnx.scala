package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal pure-JVM ONNX inference — the production half of the D2
  * seam (reference `models/delft_model_impl.py:18-57` runs a DELFT
  * BiLSTM-CRF; the engine's [[NeuralLabeler]] takes an injectable
  * `inference` function). This container ships no ONNX Runtime jar and
  * has zero egress, so the session is implemented from the two PUBLIC
  * specifications it needs and nothing else:
  *
  *  - the protobuf wire format (varint / 64-bit / length-delimited /
  *    32-bit fields) — [[Onnx.PbReader]];
  *  - the ONNX `ModelProto`/`GraphProto`/`NodeProto`/`TensorProto`
  *    field numbers and the opset semantics of a small dense-network
  *    op set: MatMul, Gemm, Add, Sub, Mul, Relu, Tanh, Sigmoid,
  *    Softmax, Identity.
  *
  * That op set covers the per-token scoring head a sequence labeler
  * needs ([len, featDim] → [len, nLabels] MLP); recurrent ops (LSTM)
  * are out of scope by declaration — the BiLSTM context encoding is
  * exactly what [[NeuralLabeler]]'s masked-Viterbi decode replaces on
  * the JVM side, and a real cluster deployment would swap
  * [[Onnx.session]] for an ONNX-Runtime-backed closure with the same
  * signature. Weights load once on the driver and broadcast with the
  * inference closure, the [[CrfLabeler]] discipline.
  */
object Onnx {

  // ------------------------------------------------------------ tensors

  /** Row-major float tensor. */
  final case class Tensor(dims: Array[Int], data: Array[Float]) {
    def rank: Int = dims.length
    def size: Int = data.length
    override def toString = s"Tensor[${dims.mkString("x")}]"
  }

  // ----------------------------------------------- protobuf wire reader

  /** Streaming reader over one protobuf message's bytes. Field numbers
    * come from the public `onnx.proto`; unknown fields are skipped by
    * wire type, so models carrying metadata/docs/opset imports parse
    * fine. */
  private final class PbReader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasRemaining: Boolean = pos < end
    def readVarint(): Long = {
      var shift = 0
      var v = 0L
      var b = 0
      do {
        b = buf(pos) & 0xFF
        pos += 1
        v |= (b & 0x7FL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    /** (fieldNumber, wireType) */
    def readTag(): (Int, Int) = {
      val t = readVarint()
      ((t >>> 3).toInt, (t & 7).toInt)
    }
    /** Bounds of a length-delimited field; positions past it. */
    def readBytes(): (Int, Int) = {
      val len = readVarint().toInt
      val s = pos
      pos += len
      (s, s + len)
    }
    def sub(): PbReader = {
      val (s, e) = readBytes()
      new PbReader(buf, s, e)
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => readVarint(); ()
      case 1 => pos += 8
      case 2 => val len = readVarint().toInt; pos += len
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
    def readFloatAt(p: Int): Float =
      ByteBuffer.wrap(buf, p, 4).order(ByteOrder.LITTLE_ENDIAN).getFloat
    def utf8(s: Int, e: Int): String =
      new String(buf, s, e - s, java.nio.charset.StandardCharsets.UTF_8)
    def raw(s: Int, e: Int): Array[Byte] =
      java.util.Arrays.copyOfRange(buf, s, e)
  }

  // --------------------------------------------------------- ONNX model

  final case class Node(opType: String, inputs: Seq[String],
      outputs: Seq[String], attrs: Map[String, Any])

  final case class Graph(nodes: Seq[Node], initializers: Map[String, Tensor],
      inputNames: Seq[String], outputNames: Seq[String])

  /** Parse an ONNX model file's bytes into its graph. Only the fields
    * inference needs are materialized (nodes, initializers, graph
    * input/output names); everything else is skipped structurally. */
  def parse(bytes: Array[Byte]): Graph = {
    val model = new PbReader(bytes, 0, bytes.length)
    var graph: Graph = null
    while (model.hasRemaining) {
      val (f, w) = model.readTag()
      if (f == 7 && w == 2) graph = parseGraph(model.sub()) // ModelProto.graph
      else model.skip(w)
    }
    require(graph != null, "no GraphProto in model bytes")
    graph
  }

  def parseFile(path: String): Graph =
    parse(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))

  private def parseGraph(r: PbReader): Graph = {
    val nodes = Seq.newBuilder[Node]
    var initList = List.empty[(String, Tensor)]
    val ins = Seq.newBuilder[String]
    val outs = Seq.newBuilder[String]
    while (r.hasRemaining) {
      val (f, w) = r.readTag()
      f match {
        case 1 => nodes += parseNode(r.sub())                 // node
        case 5 => initList ::= parseTensor(r.sub())           // initializer
        case 11 => ins += parseValueInfoName(r.sub())         // input
        case 12 => outs += parseValueInfoName(r.sub())        // output
        case _ => r.skip(w)
      }
    }
    Graph(nodes.result(), initList.toMap, ins.result(), outs.result())
  }

  private def parseValueInfoName(r: PbReader): String = {
    var name = ""
    while (r.hasRemaining) {
      val (f, w) = r.readTag()
      if (f == 1 && w == 2) { val (s, e) = r.readBytes(); name = r.utf8(s, e) }
      else r.skip(w)
    }
    name
  }

  private def parseNode(r: PbReader): Node = {
    val in = Seq.newBuilder[String]
    val out = Seq.newBuilder[String]
    var op = ""
    val attrs = Map.newBuilder[String, Any]
    while (r.hasRemaining) {
      val (f, w) = r.readTag()
      f match {
        case 1 => val (s, e) = r.readBytes(); in += r.utf8(s, e)
        case 2 => val (s, e) = r.readBytes(); out += r.utf8(s, e)
        case 4 => val (s, e) = r.readBytes(); op = r.utf8(s, e)
        case 5 => attrs += parseAttr(r.sub())
        case _ => r.skip(w)
      }
    }
    Node(op, in.result(), out.result(), attrs.result())
  }

  private def parseAttr(r: PbReader): (String, Any) = {
    var name = ""
    var value: Any = null
    while (r.hasRemaining) {
      val (f, w) = r.readTag()
      (f, w) match {
        case (1, 2) => val (s, e) = r.readBytes(); name = r.utf8(s, e)
        case (2, 5) =>                                // f: float (fixed32)
          value = r.readFloatAt(r.pos); r.pos += 4
        case (3, 0) => value = r.readVarint()         // i: int
        case (5, 2) => value = parseTensor(r.sub())._2 // t: tensor
        case (6, 2) =>                                // floats (packed)
          val (s, e) = r.readBytes()
          value = (s until e by 4).map(p => r.readFloatAt(p)).toArray
        case (8, 0) =>                                // ints (unpacked)
          value = (value match {
            case xs: List[_] => r.readVarint() :: xs.asInstanceOf[List[Long]]
            case _ => List(r.readVarint())
          })
        case (8, 2) =>                                // ints (packed)
          val sub = r.sub()
          val b = List.newBuilder[Long]
          while (sub.hasRemaining) b += sub.readVarint()
          value = b.result()
        case (20, 0) => r.readVarint(); ()            // type enum: implied
        case (_, ww) => r.skip(ww)
      }
    }
    name -> value
  }

  /** TensorProto → (name, tensor). FLOAT (data_type 1) only — the
    * dense-network weights this seam serves. Accepts both `float_data`
    * and `raw_data` encodings. */
  private def parseTensor(r: PbReader): (String, Tensor) = {
    val dims = List.newBuilder[Int]
    var name = ""
    var dataType = -1L
    var floats: Array[Float] = Array.empty
    while (r.hasRemaining) {
      val (f, w) = r.readTag()
      (f, w) match {
        case (1, 0) => dims += r.readVarint().toInt            // dims
        case (1, 2) =>                                          // dims packed
          val sub = r.sub()
          while (sub.hasRemaining) dims += sub.readVarint().toInt
        case (2, 0) => dataType = r.readVarint()                // data_type
        case (4, 2) =>                                          // float_data packed
          val (s, e) = r.readBytes()
          floats = (s until e by 4).map(p => r.readFloatAt(p)).toArray
        case (4, 5) =>                                          // float_data single
          floats = floats :+ r.readFloatAt(r.pos); r.pos += 4
        case (8, 2) => val (s, e) = r.readBytes(); name = r.utf8(s, e)
        case (9, 2) =>                                          // raw_data
          val (s, e) = r.readBytes()
          floats = (s until e by 4).map(p => r.readFloatAt(p)).toArray
        case (_, ww) => r.skip(ww)
      }
    }
    require(dataType == 1L || floats.nonEmpty,
      s"tensor '$name': only FLOAT tensors supported (data_type=$dataType)")
    val d = dims.result()
    val t = Tensor(if (d.isEmpty) Array(floats.length) else d.toArray, floats)
    require(t.dims.product == t.data.length,
      s"tensor '$name': dims ${t.dims.mkString("x")} vs ${t.data.length} values")
    name -> t
  }

  // ---------------------------------------------------------- evaluator

  /** Evaluate the graph on named inputs. Single-pass topological-order
    * execution (ONNX graphs are serialized in topological order). */
  def run(g: Graph, inputs: Map[String, Tensor]): Map[String, Tensor] = {
    val env = scala.collection.mutable.HashMap[String, Tensor]()
    env ++= g.initializers
    env ++= inputs
    g.nodes.foreach { n =>
      def in(i: Int): Tensor = env.getOrElse(n.inputs(i),
        throw new IllegalArgumentException(
          s"${n.opType}: missing input '${n.inputs(i)}'"))
      val out: Tensor = n.opType match {
        case "MatMul" => matmul(in(0), in(1))
        case "Gemm" =>
          val alpha = n.attrs.get("alpha").map(_.asInstanceOf[Float]).getOrElse(1f)
          val beta = n.attrs.get("beta").map(_.asInstanceOf[Float]).getOrElse(1f)
          val transA = n.attrs.get("transA").exists(_.asInstanceOf[Long] != 0L)
          val transB = n.attrs.get("transB").exists(_.asInstanceOf[Long] != 0L)
          gemm(in(0), in(1), if (n.inputs.size > 2) Some(in(2)) else None,
            alpha, beta, transA, transB)
        case "Add" => broadcastBinary(in(0), in(1), _ + _)
        case "Sub" => broadcastBinary(in(0), in(1), _ - _)
        case "Mul" => broadcastBinary(in(0), in(1), _ * _)
        case "Relu" => mapT(in(0))(v => math.max(0f, v))
        case "Tanh" => mapT(in(0))(v => math.tanh(v).toFloat)
        case "Sigmoid" => mapT(in(0))(v => (1.0 / (1.0 + math.exp(-v))).toFloat)
        case "Identity" => in(0)
        case "Softmax" => softmaxLastAxis(in(0))
        case op => throw new IllegalArgumentException(
          s"unsupported ONNX op '$op' (supported: MatMul Gemm Add Sub Mul " +
            "Relu Tanh Sigmoid Softmax Identity)")
      }
      env(n.outputs.head) = out
    }
    g.outputNames.map(o => o -> env.getOrElse(o,
      throw new IllegalArgumentException(s"graph output '$o' never produced")))
      .toMap
  }

  private def mapT(t: Tensor)(f: Float => Float): Tensor =
    Tensor(t.dims, t.data.map(f))

  /** [..., m, k] × [k, n] (stacked) or [m, k] × [k, n]. */
  private def matmul(a: Tensor, b: Tensor): Tensor = {
    require(b.rank == 2, s"MatMul rhs must be rank-2, got $b")
    val k = b.dims(0)
    val n = b.dims(1)
    require(a.dims.last == k, s"MatMul $a × $b")
    val m = a.size / k
    val out = new Array[Float](m * n)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < n) {
        var s = 0f
        var x = 0
        while (x < k) { s += a.data(i * k + x) * b.data(x * n + j); x += 1 }
        out(i * n + j) = s
        j += 1
      }
      i += 1
    }
    Tensor(a.dims.dropRight(1) :+ n, out)
  }

  private def transpose2d(t: Tensor): Tensor = {
    require(t.rank == 2, s"transpose needs rank-2, got $t")
    val Array(m, n) = t.dims
    val out = new Array[Float](m * n)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < n) { out(j * m + i) = t.data(i * n + j); j += 1 }
      i += 1
    }
    Tensor(Array(n, m), out)
  }

  private def gemm(a0: Tensor, b0: Tensor, c: Option[Tensor],
      alpha: Float, beta: Float, transA: Boolean, transB: Boolean): Tensor = {
    val a = if (transA) transpose2d(a0) else a0
    val b = if (transB) transpose2d(b0) else b0
    val y0 = matmul(a, b)
    val y = if (alpha == 1f) y0 else mapT(y0)(_ * alpha)
    c match {
      case Some(bias) =>
        val scaled = if (beta == 1f) bias else mapT(bias)(_ * beta)
        broadcastBinary(y, scaled, _ + _)
      case None => y
    }
  }

  /** Same-shape, or right operand broadcast over the left's last dim
    * (the bias shape of every dense layer). */
  private def broadcastBinary(a: Tensor, b: Tensor,
      f: (Float, Float) => Float): Tensor = {
    if (java.util.Arrays.equals(a.dims, b.dims)) {
      val out = new Array[Float](a.size)
      var i = 0
      while (i < out.length) { out(i) = f(a.data(i), b.data(i)); i += 1 }
      Tensor(a.dims, out)
    } else {
      require(b.rank == 1 && b.dims(0) == a.dims.last,
        s"unsupported broadcast $a vs $b")
      val n = b.dims(0)
      val out = new Array[Float](a.size)
      var i = 0
      while (i < out.length) { out(i) = f(a.data(i), b.data(i % n)); i += 1 }
      Tensor(a.dims, out)
    }
  }

  private def softmaxLastAxis(t: Tensor): Tensor = {
    val n = t.dims.last
    val rows = t.size / n
    val out = new Array[Float](t.size)
    var r = 0
    while (r < rows) {
      var mx = Float.NegativeInfinity
      var i = 0
      while (i < n) { mx = math.max(mx, t.data(r * n + i)); i += 1 }
      var sum = 0.0
      i = 0
      while (i < n) {
        val e = math.exp(t.data(r * n + i) - mx)
        out(r * n + i) = e.toFloat
        sum += e
        i += 1
      }
      i = 0
      while (i < n) { out(r * n + i) = (out(r * n + i) / sum).toFloat; i += 1 }
      r += 1
    }
    Tensor(t.dims, out)
  }

  // ----------------------------------------------------- labeler bridge

  /** Build a [[NeuralLabeler]]-shaped inference function from a parsed
    * graph: each document's tokens run as ONE [len, featDim] input (the
    * per-token scoring-head contract — [len, nLabels] out). The graph
    * is parsed once on the driver; the returned closure carries only
    * the immutable weights and is broadcast with the task. */
  def session(g: Graph, featDim: Int): Seq[Seq[Array[Float]]] => Seq[Seq[Array[Float]]] = {
    val inName = g.inputNames.headOption.getOrElse("input")
    (docs: Seq[Seq[Array[Float]]]) => docs.map { toks =>
      if (toks.isEmpty) Seq.empty
      else {
        val len = toks.size
        val flat = new Array[Float](len * featDim)
        var i = 0
        toks.foreach { v =>
          require(v.length == featDim, s"feature dim ${v.length} != $featDim")
          System.arraycopy(v, 0, flat, i * featDim, featDim)
          i += 1
        }
        val out = run(g, Map(inName -> Tensor(Array(len, featDim), flat)))
          .values.head
        val nl = out.dims.last
        require(out.size == len * nl,
          s"graph emitted $out for $len tokens")
        (0 until len).map(t =>
          java.util.Arrays.copyOfRange(out.data, t * nl, (t + 1) * nl))
      }
    }
  }

  /** [[NeuralLabeler]] backed by an ONNX model file when one exists —
    * the production entry: `Onnx.labelerFromFile(path, labels, encode)`
    * (load once, broadcast weights). Returns None when the file is
    * absent so a pipeline can fall back to its rule labeler, the same
    * soft-degrade the reference applies when a model directory is
    * missing. */
  def labelerFromFile(path: String, labels: IndexedSeq[String],
      encode: String => Array[Float], featDim: Int,
      batchSize: Int = 8, featuresCol: String = "features",
      transitionMask: Option[Array[Array[Boolean]]] = None,
      perPage: Boolean = false): Option[NeuralLabeler] = {
    val f = new java.io.File(path)
    if (!f.isFile) None
    else Some(new NeuralLabeler(labels, encode,
      session(parseFile(path), featDim), batchSize, featuresCol,
      transitionMask, perPage))
  }
}
