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

  /** Row-major tensor: float payload for weights/activations, with an
    * optional int64 payload for the shape/axes operands the glue ops
    * (Reshape/Squeeze/Unsqueeze) take as inputs since opset 13. */
  final case class Tensor(dims: Array[Int], data: Array[Float],
      longs: Array[Long] = null) {
    def rank: Int = dims.length
    def size: Int = if (data != null) data.length else longs.length
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

  /** Default-domain opset versions this evaluator's op semantics were
    * written and tested against. Below 9 several ops carried legacy
    * attributes this reader never sees; above 19 an op's semantics may
    * have changed in ways the reader would evaluate silently wrong
    * (the axes-moved-from-attribute-to-input shift at opset 13 is
    * already handled in both forms, but nothing future-proofs beyond
    * the tested range). Outside the range, fail at PARSE time — the
    * `requireIndexMeta` loud-failure discipline applied to model
    * files. */
  val SupportedOpsetRange: Range = 9 to 19

  /** Parse an ONNX model file's bytes into its graph. Only the fields
    * inference needs are materialized (nodes, initializers, graph
    * input/output names); everything else is skipped structurally —
    * except `opset_import`, which is validated against
    * [[SupportedOpsetRange]] (a model exported at an untested opset
    * must fail loudly here, not evaluate silently wrong). A model with
    * no default-domain opset import (our own [[buildDenseModel]] up to
    * round 14, hand-built test fixtures) is accepted as-is. */
  def parse(bytes: Array[Byte]): Graph = {
    val model = new PbReader(bytes, 0, bytes.length)
    var graph: Graph = null
    while (model.hasRemaining) {
      val (f, w) = model.readTag()
      if (f == 7 && w == 2) graph = parseGraph(model.sub()) // ModelProto.graph
      else if (f == 8 && w == 2) {                          // opset_import
        val r = model.sub()
        var domain = ""
        var version = -1L
        while (r.hasRemaining) {
          val (ff, ww) = r.readTag()
          (ff, ww) match {
            case (1, 2) => val (s, e) = r.readBytes(); domain = r.utf8(s, e)
            case (2, 0) => version = r.readVarint()
            case _ => r.skip(ww)
          }
        }
        if (domain.isEmpty || domain == "ai.onnx") {
          require(version < 0 || SupportedOpsetRange.contains(version.toInt),
            s"unsupported ONNX opset $version (tested range " +
              s"${SupportedOpsetRange.start}..${SupportedOpsetRange.end}); " +
              "re-export the model inside the range")
        }
      }
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
        case (4, 2) =>                                // s: string
          val (s, e) = r.readBytes(); value = r.utf8(s, e)
        case (5, 2) => value = parseTensor(r.sub())._2 // t: tensor
        case (6, 2) =>                                // floats (packed)
          val (s, e) = r.readBytes()
          value = (s until e by 4).map(p => r.readFloatAt(p)).toArray
        case (8, 0) =>                                // ints (unpacked)
          value = (value match {
            case xs: List[_] => xs.asInstanceOf[List[Long]] :+ r.readVarint()
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

  /** TensorProto → (name, tensor). FLOAT (data_type 1) for weights,
    * INT64 (data_type 7) for the shape/axes operands of the glue ops.
    * Accepts typed-array and `raw_data` encodings for both. */
  private def parseTensor(r: PbReader): (String, Tensor) = {
    val dims = List.newBuilder[Int]
    var name = ""
    var dataType = -1L
    var floats: Array[Float] = Array.empty
    var ints: List[Long] = Nil
    var rawBytes: Array[Byte] = null
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
        case (7, 0) => ints ::= r.readVarint()                  // int64_data
        case (7, 2) =>                                          // int64 packed
          val sub = r.sub()
          while (sub.hasRemaining) ints ::= sub.readVarint()
        case (8, 2) => val (s, e) = r.readBytes(); name = r.utf8(s, e)
        case (9, 2) =>                                          // raw_data
          val (s, e) = r.readBytes()
          rawBytes = r.raw(s, e)
        case (_, ww) => r.skip(ww)
      }
    }
    val d = dims.result()
    val t = dataType match {
      case 7L =>
        val vs =
          if (rawBytes != null) {
            val bb = ByteBuffer.wrap(rawBytes).order(ByteOrder.LITTLE_ENDIAN)
            Array.fill(rawBytes.length / 8)(bb.getLong)
          } else ints.reverse.toArray
        Tensor(if (d.isEmpty) Array(vs.length) else d.toArray, null, vs)
      case _ =>
        require(dataType == 1L || floats.nonEmpty || rawBytes != null,
          s"tensor '$name': unsupported data_type=$dataType (FLOAT/INT64 only)")
        val vs =
          if (rawBytes != null) {
            val bb = ByteBuffer.wrap(rawBytes).order(ByteOrder.LITTLE_ENDIAN)
            Array.fill(rawBytes.length / 4)(bb.getFloat)
          } else floats
        Tensor(if (d.isEmpty) Array(vs.length) else d.toArray, vs)
    }
    require(t.dims.product == t.size,
      s"tensor '$name': dims ${t.dims.mkString("x")} vs ${t.size} values")
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
      def axesOf(attrName: String, inputIdx: Int): Array[Int] =
        n.attrs.get(attrName).map(_.asInstanceOf[List[Long]].map(_.toInt).toArray)
          .orElse(if (n.inputs.size > inputIdx) Some(in(inputIdx).longs.map(_.toInt))
            else None)
          .getOrElse(throw new IllegalArgumentException(
            s"${n.opType}: no '$attrName' attribute or input"))
      val outs: Seq[Tensor] = n.opType match {
        case "MatMul" => Seq(matmul(in(0), in(1)))
        case "Gemm" =>
          val alpha = n.attrs.get("alpha").map(_.asInstanceOf[Float]).getOrElse(1f)
          val beta = n.attrs.get("beta").map(_.asInstanceOf[Float]).getOrElse(1f)
          val transA = n.attrs.get("transA").exists(_.asInstanceOf[Long] != 0L)
          val transB = n.attrs.get("transB").exists(_.asInstanceOf[Long] != 0L)
          Seq(gemm(in(0), in(1), if (n.inputs.size > 2) Some(in(2)) else None,
            alpha, beta, transA, transB))
        case "Add" => Seq(broadcastBinary(in(0), in(1), _ + _))
        case "Sub" => Seq(broadcastBinary(in(0), in(1), _ - _))
        case "Mul" => Seq(broadcastBinary(in(0), in(1), _ * _))
        case "Relu" => Seq(mapT(in(0))(v => math.max(0f, v)))
        case "Tanh" => Seq(mapT(in(0))(v => math.tanh(v).toFloat))
        case "Sigmoid" => Seq(mapT(in(0))(v => (1.0 / (1.0 + math.exp(-v))).toFloat))
        case "Identity" => Seq(in(0))
        case "Softmax" =>
          // only last-axis softmax is implemented; an exported model
          // normalizing another axis must fail loudly, not evaluate wrong
          n.attrs.get("axis").foreach { a =>
            val axis = a.asInstanceOf[Long].toInt
            require(axis == -1 || axis == in(0).rank - 1,
              s"Softmax axis=$axis unsupported (last axis only; input ${in(0)})")
          }
          Seq(softmaxLastAxis(in(0)))
        case "Reshape" => Seq(reshape(in(0), in(1).longs))
        case "Transpose" =>
          val perm = n.attrs.get("perm")
            .map(_.asInstanceOf[List[Long]].map(_.toInt).toArray)
            .getOrElse(in(0).dims.indices.reverse.toArray)
          Seq(transposeNd(in(0), perm))
        case "Squeeze" =>
          val t = in(0)
          val axes = n.attrs.get("axes")
            .map(_.asInstanceOf[List[Long]].map(_.toInt).toArray)
            .orElse(if (n.inputs.size > 1) Some(in(1).longs.map(_.toInt))
              else None)
            .getOrElse(t.dims.indices.filter(t.dims(_) == 1).toArray)
            .map(a => if (a < 0) a + t.rank else a).toSet
          Seq(Tensor(t.dims.indices.filterNot(axes).map(t.dims).toArray,
            t.data, t.longs))
        case "Unsqueeze" =>
          val t = in(0)
          val outRank = t.rank + axesOf("axes", 1).length
          val axes = axesOf("axes", 1).map(a => if (a < 0) a + outRank else a).toSet
          val nd = Array.newBuilder[Int]
          var src = 0
          (0 until outRank).foreach { i =>
            if (axes(i)) nd += 1 else { nd += t.dims(src); src += 1 }
          }
          Seq(Tensor(nd.result(), t.data, t.longs))
        case "Concat" =>
          val axis0 = n.attrs("axis").asInstanceOf[Long].toInt
          Seq(concat(n.inputs.map(x => env(x)), axis0))
        case "LSTM" =>
          val hidden = n.attrs("hidden_size").asInstanceOf[Long].toInt
          val dir = n.attrs.get("direction").map(_.toString).getOrElse("forward")
          // implemented: default activations (sigmoid/tanh/tanh), zero
          // initial state, full-length sequences, layout 0. A model
          // wiring sequence_lens / initial_h / initial_c / peepholes
          // (inputs 4+) or non-default activations/clip/input_forget
          // would evaluate silently wrong — reject loudly instead.
          require(n.inputs.drop(4).forall(_.isEmpty),
            s"LSTM optional inputs 4+ unsupported (got ${n.inputs.drop(4).filter(_.nonEmpty).mkString(", ")})")
          Seq("activations", "activation_alpha", "activation_beta",
            "clip", "input_forget").foreach { a =>
            require(!n.attrs.contains(a), s"LSTM attribute '$a' unsupported")
          }
          n.attrs.get("layout").foreach { l =>
            require(l.asInstanceOf[Long] == 0L,
              s"LSTM layout=$l unsupported (layout 0 only)")
          }
          lstm(in(0), in(1), in(2),
            if (n.inputs.size > 3 && n.inputs(3).nonEmpty) Some(in(3)) else None,
            hidden, dir)
        case op => throw new IllegalArgumentException(
          s"unsupported ONNX op '$op' (supported: MatMul Gemm Add Sub Mul " +
            "Relu Tanh Sigmoid Softmax Identity Reshape Transpose Squeeze " +
            "Unsqueeze Concat LSTM)")
      }
      n.outputs.zip(outs).foreach { case (name, t) =>
        if (name.nonEmpty) env(name) = t
      }
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

  /** ONNX Reshape: -1 infers one dim, 0 copies the input dim. Data is
    * row-major so only the dims change. */
  private def reshape(t: Tensor, shape: Array[Long]): Tensor = {
    val out = new Array[Int](shape.length)
    var inferAt = -1
    var known = 1L
    shape.indices.foreach { i =>
      shape(i) match {
        case -1L =>
          require(inferAt < 0, "Reshape: more than one -1"); inferAt = i
        case 0L => out(i) = t.dims(i); known *= out(i)
        case v => out(i) = v.toInt; known *= v
      }
    }
    if (inferAt >= 0) out(inferAt) = (t.size / known).toInt
    require(out.product == t.size,
      s"Reshape $t to ${out.mkString("x")}")
    Tensor(out, t.data, t.longs)
  }

  /** General N-D transpose by permutation. */
  private def transposeNd(t: Tensor, perm: Array[Int]): Tensor = {
    require(perm.length == t.rank, s"Transpose perm ${perm.length} vs $t")
    val nd = perm.map(t.dims)
    val inStrides = new Array[Int](t.rank)
    var acc = 1
    (t.rank - 1 to 0 by -1).foreach { i => inStrides(i) = acc; acc *= t.dims(i) }
    val outStrides = new Array[Int](t.rank)
    acc = 1
    (t.rank - 1 to 0 by -1).foreach { i => outStrides(i) = acc; acc *= nd(i) }
    val out = new Array[Float](t.size)
    val idx = new Array[Int](t.rank)
    var flat = 0
    while (flat < t.size) {
      // decompose output-flat index into output coords, map through perm
      var rem = flat
      var inPos = 0
      var i = 0
      while (i < t.rank) {
        val c = rem / outStrides(i)
        rem -= c * outStrides(i)
        inPos += c * inStrides(perm(i))
        i += 1
      }
      out(flat) = t.data(inPos)
      flat += 1
    }
    Tensor(nd, out)
  }

  /** Concat along `axis` (negative counts from the back). */
  private def concat(ts: Seq[Tensor], axis0: Int): Tensor = {
    val rank = ts.head.rank
    val axis = if (axis0 < 0) axis0 + rank else axis0
    val outer = ts.head.dims.take(axis).product
    val inner = ts.head.dims.drop(axis + 1).product
    val axLens = ts.map(_.dims(axis))
    val outAx = axLens.sum
    val nd = ts.head.dims.clone(); nd(axis) = outAx
    val out = new Array[Float](outer * outAx * inner)
    var o = 0
    while (o < outer) {
      var off = 0
      ts.zip(axLens).foreach { case (t, al) =>
        System.arraycopy(t.data, o * al * inner, out,
          (o * outAx + off) * inner, al * inner)
        off += al
      }
      o += 1
    }
    Tensor(nd, out)
  }

  /** ONNX LSTM (the DELFT BiLSTM shape): X [seq, batch, input],
    * W [dirs, 4H, input], R [dirs, 4H, H], B [dirs, 8H] — iofc gate
    * order, outputs Y [seq, dirs, batch, H], Y_h and Y_c
    * [dirs, batch, H]. Default activations (sigmoid/tanh/tanh), zero
    * initial state, no peepholes/clip — the exported-recurrent-network
    * common case. */
  private def lstm(x: Tensor, wT: Tensor, rT: Tensor, bT: Option[Tensor],
      hiddenSize: Int, direction: String): Seq[Tensor] = {
    require(x.rank == 3, s"LSTM X must be [seq, batch, input], got $x")
    val Array(seqLen, batch, inputSize) = x.dims
    val dirs = direction match {
      case "forward" | "reverse" => 1
      case "bidirectional" => 2
      case d => throw new IllegalArgumentException(s"LSTM direction '$d'")
    }
    val H = hiddenSize
    require(wT.dims.sameElements(Array(dirs, 4 * H, inputSize)), s"LSTM W $wT")
    require(rT.dims.sameElements(Array(dirs, 4 * H, H)), s"LSTM R $rT")
    bT.foreach(b => require(b.dims.sameElements(Array(dirs, 8 * H)),
      s"LSTM B $b"))
    val y = new Array[Float](seqLen * dirs * batch * H)
    val yh = new Array[Float](dirs * batch * H)
    val yc = new Array[Float](dirs * batch * H)
    def sig(v: Double): Double = 1.0 / (1.0 + math.exp(-v))
    var d = 0
    while (d < dirs) {
      val reverse = direction == "reverse" || d == 1
      val wOff = d * 4 * H * inputSize
      val rOff = d * 4 * H * H
      val bOff = d * 8 * H
      var b = 0
      while (b < batch) {
        val h = new Array[Double](H)
        val c = new Array[Double](H)
        var step = 0
        while (step < seqLen) {
          val t = if (reverse) seqLen - 1 - step else step
          val xOff = (t * batch + b) * inputSize
          // gates in iofc order
          val gates = new Array[Double](4 * H)
          var g = 0
          while (g < 4 * H) {
            var s = 0.0
            var k = 0
            while (k < inputSize) {
              s += x.data(xOff + k) * wT.data(wOff + g * inputSize + k); k += 1
            }
            k = 0
            while (k < H) { s += h(k) * rT.data(rOff + g * H + k); k += 1 }
            bT.foreach { bb =>
              s += bb.data(bOff + g) + bb.data(bOff + 4 * H + g)
            }
            gates(g) = s
            g += 1
          }
          var j = 0
          while (j < H) {
            val i = sig(gates(j))
            val o = sig(gates(H + j))
            val f = sig(gates(2 * H + j))
            val ct = math.tanh(gates(3 * H + j))
            c(j) = f * c(j) + i * ct
            h(j) = o * math.tanh(c(j))
            y(((t * dirs + d) * batch + b) * H + j) = h(j).toFloat
            j += 1
          }
          step += 1
        }
        var j = 0
        while (j < H) {
          yh((d * batch + b) * H + j) = h(j).toFloat
          yc((d * batch + b) * H + j) = c(j).toFloat
          j += 1
        }
        b += 1
      }
      d += 1
    }
    Seq(Tensor(Array(seqLen, dirs, batch, H), y),
      Tensor(Array(dirs, batch, H), yh),
      Tensor(Array(dirs, batch, H), yc))
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

  // ------------------------------------------------------- model writer

  /** Protobuf wire writer — the serialization half of [[PbReader]],
    * for exporting dense models ([[buildDenseModel]]). */
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
    def str(field: Int, s: String): this.type = bytes(field, s.getBytes("UTF-8"))
    def msg(field: Int, w: PbWriter): this.type = bytes(field, w.result)
    def int(field: Int, v: Long): this.type = { tag(field, 0); varint(v) }
    def result: Array[Byte] = out.toByteArray
  }

  /** One dense layer: row-major weights `[outDim × inDim]` (the Gemm
    * `transB` layout), bias `[outDim]`, activation `"Relu"`, `"Tanh"`,
    * `"Sigmoid"` or `""` (linear). */
  final case class Dense(w: Array[Float], outDim: Int, b: Array[Float],
      activation: String)

  /** Serialize an MLP to real ONNX ModelProto bytes — Gemm(transB=1) +
    * activation per layer, graph input `"input"` `[n, inputDim]`,
    * output `"score"`. Round-trips through [[parse]]/[[run]]; what a
    * trained quality classifier exports to and what [[scoreRows]]
    * loads at the corpus. */
  def buildDenseModel(inputDim: Int, layers: Seq[Dense]): Array[Byte] = {
    val graph = new PbWriter
    var in = inputDim
    var src = "input"
    layers.zipWithIndex.foreach { case (l, i) =>
      require(l.w.length == l.outDim * in,
        s"layer $i: ${l.w.length} weights for ${l.outDim}x$in")
      require(l.b.length == l.outDim, s"layer $i bias")
      graph.msg(5, floatTensor(s"W$i", Seq(l.outDim, in), l.w))
      graph.msg(5, floatTensor(s"B$i", Seq(l.outDim), l.b))
      val last = i == layers.size - 1 && l.activation.isEmpty
      val gemmOut = if (last) "score"
        else if (l.activation.isEmpty) s"h$i" else s"g$i"
      val gemm = new PbWriter
      Seq(src, s"W$i", s"B$i").foreach(gemm.str(1, _))
      gemm.str(2, gemmOut)
      gemm.str(4, "Gemm")
      val tb = new PbWriter
      tb.str(1, "transB"); tb.int(3, 1L); tb.int(20, 2)
      gemm.msg(5, tb)
      graph.msg(1, gemm)
      src = gemmOut
      if (l.activation.nonEmpty) {
        val actOut = if (i == layers.size - 1) "score" else s"h$i"
        val act = new PbWriter
        act.str(1, src); act.str(2, actOut); act.str(4, l.activation)
        graph.msg(1, act)
        src = actOut
      }
      in = l.outDim
    }
    val vin = new PbWriter; vin.str(1, "input")
    val vout = new PbWriter; vout.str(1, "score")
    graph.msg(11, vin)
    graph.msg(12, vout)
    val model = new PbWriter
    model.int(1, 8) // ir_version
    model.msg(7, graph)
    val opset = new PbWriter
    opset.int(2, 13) // default-domain opset 13 (inside SupportedOpsetRange)
    model.msg(8, opset)
    model.result
  }

  private def floatTensor(name: String, dims: Seq[Int],
      vs: Array[Float]): PbWriter = {
    val w = new PbWriter
    dims.foreach(d => w.int(1, d))
    w.int(2, 1) // FLOAT
    val bb = ByteBuffer.allocate(4 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(bb.putFloat)
    w.bytes(9, bb.array())
    w.str(8, name)
    w
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
        // select the scored tensor BY NAME — a model exposing several
        // graph outputs (logits + LSTM Y_h/Y_c + debug) must not hand
        // back an arbitrary Map value
        val out = run(g, Map(inName -> Tensor(Array(len, featDim), flat)))
          .apply(g.outputNames.head)
        val nl = out.dims.last
        require(out.size == len * nl,
          s"graph emitted $out for $len tokens")
        (0 until len).map(t =>
          java.util.Arrays.copyOfRange(out.data, t * nl, (t + 1) * nl))
      }
    }
  }

  /** Corpus-scale row scoring with an ONNX graph — the quality-
    * classifier inference pass of an LLM-data pipeline (fastText-style
    * filter, CCNet/DSIR-style model-based curation) run as a Spark
    * map: `featureCols` project row-locally, each PARTITION evaluates
    * as ONE [n, featDim] batch through the graph (one MatMul per
    * layer per partition, not per row), and the scalar score lands in
    * `outCol`. The parsed graph is immutable and rides the closure
    * broadcast; nothing shuffles at any corpus size.
    *
    * Output column is DOUBLE (the float32 score widened). For an
    * engine-portable declared query, use weights that are dyadic
    * rationals (0.5/0.25/…) on integer-valued features with ReLU-only
    * nonlinearity — every intermediate is then exactly representable
    * in float32 AND float64, so the score hashes identically across
    * engines (the q122 discipline; transcendental heads are for
    * rows-only use). */
  def scoreRows(df: org.apache.spark.sql.DataFrame, g: Graph,
      featureCols: Seq[String], idCol: String = "doc_id",
      outCol: String = "score"): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val inName = g.inputNames.headOption.getOrElse("input")
    val featDim = featureCols.length
    val scored = df
      .select(col(idCol).cast("long") +:
        featureCols.map(c => col(c).cast("float")): _*)
      .map { row =>
        // fail with a locatable message, not an opaque task NPE — a
        // single null feature row in a streaming delivery would
        // otherwise kill the whole stream inside getFloat
        var i = 0
        while (i <= featDim) {
          require(!row.isNullAt(i), {
            val what = if (i == 0) idCol else featureCols(i - 1)
            s"scoreRows: null '$what' (drop or impute nulls before scoring)"
          })
          i += 1
        }
        (row.getLong(0), Array.tabulate(featDim)(i => row.getFloat(i + 1)))
      }
      .mapPartitions { it =>
        val rows = it.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val flat = new Array[Float](rows.length * featDim)
          var i = 0
          while (i < rows.length) {
            System.arraycopy(rows(i)._2, 0, flat, i * featDim, featDim)
            i += 1
          }
          val out = run(g,
            Map(inName -> Tensor(Array(rows.length, featDim), flat)))
            .apply(g.outputNames.head)
          require(out.size == rows.length,
            s"classifier graph emitted $out for ${rows.length} rows")
          rows.iterator.zipWithIndex.map { case ((id, _), j) =>
            (id, out.data(j).toDouble)
          }
        }
      }
    scored.toDF(idCol, outCol)
  }

  /** ONNX-backed page-layout detector behind the D5 seam (reference
    * `cv_models/layout_parser_cv_model.py:112-141` runs EfficientDet /
    * PubLayNet): REAL ImageIO pixel decode
    * ([[graft.operators.Multimodal.decodeImage]] — the same
    * deterministic integer luma-grid path the media family ships) →
    * `grid²` features → ONE graph evaluation scoring every anchor:
    * input `[1, grid²]`, output `[nAnchors, nCategories+1]` logits
    * with class 0 = background. Anchors are page-relative `(x, y, w,
    * h)` boxes scaled to the decoded size; per anchor the argmax
    * class wins with its softmax probability as the detection score,
    * background anchors emit nothing. Plugs directly into
    * [[GraphicProvider.detectBoxesScored]] — the score threshold,
    * type allowlist and greedy overlap suppression stay the
    * reference's post-filter. Undecodable bytes detect nothing (the
    * reference's behavior for an unreadable page image). */
  def detectorFromGraph(g: Graph, categories: IndexedSeq[String],
      anchors: Seq[(Double, Double, Double, Double)], grid: Int = 8)
      : Array[Byte] => Seq[(Double, Double, Double, Double, String, Double)] = {
    require(categories.nonEmpty, "categories must not be empty")
    require(anchors.nonEmpty, "anchors must not be empty")
    val inName = g.inputNames.headOption.getOrElse("input")
    (image: Array[Byte]) =>
      graft.operators.Multimodal.decodeImage(image, grid) match {
        case None => Seq.empty
        case Some((w, h, _, emb)) =>
          val out = run(g,
            Map(inName -> Tensor(Array(1, grid * grid), emb)))
            .apply(g.outputNames.head)
          val nc = categories.length + 1
          require(out.size == anchors.length * nc,
            s"detector graph emitted $out for ${anchors.length} anchors × $nc classes")
          anchors.zipWithIndex.flatMap { case ((ax, ay, aw, ah), i) =>
            val logits =
              java.util.Arrays.copyOfRange(out.data, i * nc, (i + 1) * nc)
            var best = 0
            var j = 1
            while (j < nc) { if (logits(j) > logits(best)) best = j; j += 1 }
            if (best == 0) None
            else {
              val mx = logits(best)
              var z = 0.0
              j = 0
              while (j < nc) { z += math.exp((logits(j) - mx).toDouble); j += 1 }
              Some((ax * w, ay * h, aw * w, ah * h,
                categories(best - 1), 1.0 / z))
            }
          }
      }
  }

  /** [[detectorFromGraph]] from a model file when one exists — the D5
    * production entry, None when absent so a pipeline degrades to its
    * injected/stub detector. */
  def detectorFromFile(path: String, categories: IndexedSeq[String],
      anchors: Seq[(Double, Double, Double, Double)], grid: Int = 8)
      : Option[Array[Byte] => Seq[(Double, Double, Double, Double, String, Double)]] = {
    val f = new java.io.File(path)
    if (!f.isFile) None
    else Some(detectorFromGraph(parseFile(path), categories, anchors, grid))
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
