package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{BioSpans, NeuralLabeler}

/** D2 neural-labeler contract: batching, encoding, argmax decode —
  * with a deterministic linear stand-in for the ONNX session.
  */
class NeuralLabelerSpec extends SparkSuite {
  import spark.implicits._

  test("hashingEncoder: deterministic, dimension-bounded, column counts") {
    val enc = NeuralLabeler.hashingEncoder(16)
    val a = enc("tok A B")
    assert(a.sameElements(enc("tok A B")))
    assert(a.length == 16 && a.sum == 3.0f)
    assert(enc("").sum == 0.0f)
  }

  test("label: batched inference over doc-contiguous sequences") {
    // inference stand-in: score label 1 when the feature vector has
    // mass in any bucket hit by the token "TITLE" marker column
    val enc = NeuralLabeler.hashingEncoder(32)
    val titleMask = enc("TITLE")
    val labels = IndexedSeq("O", "I-<title>")
    val infer: Seq[Seq[Array[Float]]] => Seq[Seq[Array[Float]]] = { batch =>
      batch.map(_.map { v =>
        val hit = v.zip(titleMask).exists { case (x, m) => m > 0 && x >= m }
        Array(if (hit) 0f else 1f, if (hit) 1f else 0f)
      })
    }
    val rows = (0 until 5).flatMap { doc =>
      (0 until 3).map { i =>
        val feat = if (doc % 2 == 0 && i == 0) s"t$i TITLE" else s"t$i BODY"
        (doc.toLong, 0, 0, 0, i, s"t$i", " ", feat)
      }
    }
    val df = rows.toDF("doc_id", "page_idx", "block_idx", "line_idx",
      "token_idx", "text", "whitespace", "features")
    val labeled = new NeuralLabeler(labels, enc, infer, batchSize = 2).label(df)
    val out = labeled.select("doc_id", "token_idx", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    assert(out((0L, 0)) == "I-<title>" && out((0L, 1)) == "O")
    assert(out((1L, 0)) == "O")
    assert(out((4L, 0)) == "I-<title>")
    // labels flow into span grouping like every other backend
    assert(BioSpans.spans(labeled).filter(col("tag") === "<title>").count() == 3)
  }

  test("decode: transition mask repairs BIO-inconsistent argmax paths") {
    val labels = IndexedSeq("O", "B-<a>", "I-<a>", "I-<b>")
    val mask = NeuralLabeler.bioMask(labels)
    // argmax would give [O, I-<a>] — inconsistent (I-<a> after O);
    // masked Viterbi must pick the best consistent path [O, O]
    val scores = Seq(
      Array(2f, 0f, 0f, 0f),
      Array(1f, 0f, 1.5f, 0f))
    val plain = NeuralLabeler.decode(scores, labels.size, None)
    assert(plain.map(labels) == Seq("O", "I-<a>"))
    val masked = NeuralLabeler.decode(scores, labels.size, Some(mask))
    assert(masked.map(labels) == Seq("O", "O"))
    // when the span is opened properly the mask keeps it
    val ok = Seq(Array(0f, 2f, 0f, 0f), Array(0f, 0f, 2f, 0f))
    assert(NeuralLabeler.decode(ok, labels.size, Some(mask)).map(labels) ==
      Seq("B-<a>", "I-<a>"))
    // I-<b> after B-<a>/I-<a> is disallowed — cross-tag continuation
    val cross = Seq(Array(0f, 2f, 0f, 0f), Array(0f, 0f, 1f, 1.5f))
    assert(NeuralLabeler.decode(cross, labels.size, Some(mask)).map(labels) ==
      Seq("B-<a>", "I-<a>"))
  }

  test("label: ONNX-shaped golden — padded score width, batch boundaries, mask") {
    // fixture tensors the way an ONNX head returns them: score arrays
    // WIDER than the label vocabulary (padded head), fixed per doc
    val labels = IndexedSeq("O", "B-<t>", "I-<t>")
    val fixtureScores: Map[String, Array[Float]] = Map(
      "w0" -> Array(0.1f, 2.0f, 0.3f, 9f, 9f), // pad columns must be ignored
      "w1" -> Array(0.2f, 0.1f, 1.5f, 9f, 9f),
      "w2" -> Array(1.8f, 0.0f, 0.2f, 9f, 9f))
    // 5 docs × 3 tokens with batchSize=2 → batches of 2,2,1 (boundary)
    val rows = (0 until 5).flatMap { doc =>
      Seq("w0", "w1", "w2").zipWithIndex.map { case (w, i) =>
        (doc.toLong, 0, 0, 0, i, w, " ", w)
      }
    }
    val df = rows.toDF("doc_id", "page_idx", "block_idx", "line_idx",
      "token_idx", "text", "whitespace", "features")
    val labeler = new NeuralLabeler(labels,
      encode = s => Array(s.hashCode.toFloat),
      inference = batch => batch.map(_.map { v =>
        // recover the token key from its encoded hash
        val key = Seq("w0", "w1", "w2").find(_.hashCode.toFloat == v(0)).get
        fixtureScores(key)
      }),
      batchSize = 2,
      transitionMask = Some(NeuralLabeler.bioMask(labels)))
    val out = labeler.label(df).select("doc_id", "token_idx", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    // golden: every doc decodes B-<t>, I-<t>, O — pad columns ignored,
    // the last (odd) batch decoded identically to full batches
    (0 until 5).foreach { doc =>
      assert(out((doc.toLong, 0)) == "B-<t>", s"doc $doc tok 0")
      assert(out((doc.toLong, 1)) == "I-<t>", s"doc $doc tok 1")
      assert(out((doc.toLong, 2)) == "O", s"doc $doc tok 2")
    }
  }

  test("end-to-end: score lattice -> masked decode -> spans -> header fold -> TEI") {
    // the full D2 consumer chain, driven from a recorded ONNX-shaped
    // lattice: NeuralLabeler decode -> BioSpans -> headerPipeline
    // (name-model pass included) -> TEI title + structured persName
    val labels = IndexedSeq("O", "B-<title>", "I-<title>", "B-<author>", "I-<author>")
    // per-token lattice keyed by token text; widths padded like an ONNX
    // head, B-<author> deliberately under-scored at "Jane" so only the
    // BIO mask's Viterbi (not argmax) yields a well-formed author span
    val lattice: Map[String, Array[Float]] = Map(
      "Deep" -> Array(0.1f, 3f, 0.2f, 0f, 0f, 9f),
      "Learning" -> Array(0.1f, 0.2f, 3f, 0f, 0f, 9f),
      "Jane" -> Array(0.4f, 0f, 0f, 0.5f, 0.6f, 9f), // argmax: I-<author> bare
      "Doe" -> Array(0.1f, 0f, 0f, 0.2f, 3f, 9f))
    val rows = Seq(
      (7L, 0, 0, 0, 0, "Deep", " ", "Deep"),
      (7L, 0, 0, 0, 1, "Learning", " ", "Learning"),
      (7L, 0, 1, 0, 0, "Jane", " ", "Jane"),
      (7L, 0, 1, 0, 1, "Doe", " ", "Doe"))
    val df = rows.toDF("doc_id", "page_idx", "block_idx", "line_idx",
      "token_idx", "text", "whitespace", "features")
    val labeler = new NeuralLabeler(labels,
      encode = s => Array(s.hashCode.toFloat),
      inference = batch => batch.map(_.map { v =>
        val key = lattice.keys.find(_.hashCode.toFloat == v(0)).get
        lattice(key)
      }),
      batchSize = 2,
      transitionMask = Some(NeuralLabeler.bioMask(labels)))
    val nodes = graft.pipeline.Processor.headerPipeline(df, labeler)
    val tei = graft.sinks.Tei.serialize(nodes.toDF()).collect().head.getString(1)
    assert(tei.contains("""<title level="a" type="main">Deep Learning</title>"""), tei)
    assert(tei.contains(
      """<forename type="first">Jane</forename><surname>Doe</surname>"""), tei)
  }

  test("label: inference returning wrong shape fails loudly") {
    val enc = NeuralLabeler.hashingEncoder(8)
    val bad: Seq[Seq[Array[Float]]] => Seq[Seq[Array[Float]]] =
      batch => batch.map(_.drop(1).map(_ => Array(1f, 0f)))
    val df = Seq((0L, 0, 0, 0, 0, "a", " ", "a"), (0L, 0, 0, 0, 1, "b", " ", "b"))
      .toDF("doc_id", "page_idx", "block_idx", "line_idx", "token_idx",
        "text", "whitespace", "features")
    val ex = intercept[org.apache.spark.SparkException] {
      new NeuralLabeler(IndexedSeq("O", "X"), enc, bad).label(df).count()
    }
    assert(ex.getMessage.contains("labels") || ex.getCause != null)
  }

  test("in-repo trained ONNX head (NeuralTrainer): train -> export -> " +
      "labelerFromFile decode agrees with the rule teacher; p21 trains " +
      "and serves per scale dir") {
    import spark.implicits._
    import graft.pipeline.{HeaderFeatures, NeuralTrainer, Onnx, RuleLabeler}
    val docs = (0L until 24L).map { id =>
      (id, graft.queries.PipelineOps.altoOf(id,
        s"Paper Title$id Engine Alice Author$id " +
          (1 to 25).map(i => s"word$i").mkString(" ")))
    }
    val toks = graft.sources.AltoReader.tokens(docs.toDS()).toDF()
    val lines = HeaderFeatures.dataLines(toks)
      .withColumnRenamed("data_line", "features")
    val teacher = new RuleLabeler().label(lines)
    val featDim = 64
    val (labels, bytes) = NeuralTrainer.trainDenseHead(teacher,
      NeuralLabeler.positionalHashingEncoder(featDim), featDim)
    assert(labels.contains("B-<title>") && labels.contains("O"))
    val f = java.nio.file.Files.createTempFile("graft-head", ".onnx")
    java.nio.file.Files.write(f, bytes)
    try {
      val labeler = Onnx.labelerFromFile(f.toString, labels,
        NeuralLabeler.positionalHashingEncoder(featDim), featDim,
        transitionMask = Some(NeuralLabeler.bioMask(labels))).get
      val key = Seq("doc_id", "page_idx", "block_idx", "line_idx",
        "token_idx")
      val joined = labeler.label(lines)
        .select((key.map(col) :+ col("label").as("pred")): _*)
        .join(teacher.select((key.map(col) :+ col("label").as("truth")): _*),
          key)
      val n = joined.count()
      val ok = joined.filter(col("pred") === col("truth")).count()
      assert(n > 0 && ok.toDouble / n >= 0.85, s"agreement $ok/$n")
      // the cleanly-learnable class: largest-font title tokens
      val titleTruth = joined.filter(col("truth").contains("<title>"))
      val titleOk = titleTruth.filter(col("pred") === col("truth")).count()
      val titleN = titleTruth.count()
      assert(titleOk.toDouble / titleN >= 0.95,
        s"title agreement $titleOk/$titleN")
    } finally java.nio.file.Files.delete(f)
    // the pipeline entry trains once per scale dir and reports spans
    val p = graft.queries.PipelineOps.p21(spark, sf("0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = graft.Tables(spark, sf("0.001")).documents.count()
    assert(p.length == nDocs, s"${p.length} of $nDocs docs reported")
    val withTitle = p.count(_._2 >= 1)
    assert(withTitle >= nDocs * 8 / 10, s"$withTitle/$nDocs docs have a title span")
  }
}
