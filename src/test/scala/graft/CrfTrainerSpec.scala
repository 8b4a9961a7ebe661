package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{CrfLabeler, CrfModel, CrfTrainer}

/** In-repo CRF training (the D1 labeler's missing half): distributed
  * averaged-perceptron training over wapiti-template features, native
  * model-format serialization, and the train → save → load → decode
  * loop a retraining user runs.
  */
class CrfTrainerSpec extends SparkSuite {
  import spark.implicits._

  /** Synthetic separable task: col0 drives most labels, but token "x"
    * is I-<t> after a title token and O after anything else — only the
    * transition structure can disambiguate it, so fitting this proves
    * sequence training, not pointwise counting. */
  private def syntheticDocs(nDocs: Int) = {
    val seqs = (0 until nDocs).map { d =>
      val rows =
        if (d % 2 == 0)
          Seq(("T", "B-<t>"), ("x", "I-<t>"), ("x", "I-<t>"), ("o", "O"),
            ("x", "O"))
        else
          Seq(("o", "O"), ("x", "O"), ("T", "B-<t>"), ("x", "I-<t>"),
            ("o", "O"))
      rows.zipWithIndex.map { case ((tok, lab), i) =>
        (d.toLong, 0, 0, 0, i, s"$tok f$i", lab)
      }
    }
    seqs.flatten.toDF("doc_id", "page_idx", "block_idx", "line_idx",
      "token_idx", "features", "label")
  }

  private val templates = Seq("u00:%x[0,0]", "u01:%x[-1,0]", "b")

  test("trainer fits a transition-dependent task to zero training error") {
    val df = syntheticDocs(8)
    val res = CrfTrainer.train(df, templates, epochs = 10,
      numPartitions = 2)
    assert(res.seqErrors.last == 0L,
      s"training error trace: ${res.seqErrors}")
    // decode the two sequence shapes with the trained model
    val m = res.model
    assert(m.decode(Seq("T a", "x b", "x c", "o d", "x e")) ==
      Seq("B-<t>", "I-<t>", "I-<t>", "O", "O"))
    assert(m.decode(Seq("o a", "x b", "T c", "x d", "o e")) ==
      Seq("O", "O", "B-<t>", "I-<t>", "O"))
  }

  test("training is deterministic: same input, same serialized model") {
    val df = syntheticDocs(6)
    val a = CrfModel.toWapitiNative(
      CrfTrainer.train(df, templates, epochs = 5, numPartitions = 3).model)
    val b = CrfModel.toWapitiNative(
      CrfTrainer.train(df, templates, epochs = 5, numPartitions = 3).model)
    assert(a == b)
  }

  test("native-format round trip: save -> parse decodes identically, " +
      "and the gzipped file loads through CrfLabeler.fromFile") {
    val res = CrfTrainer.train(syntheticDocs(8), templates, epochs = 10,
      numPartitions = 2)
    val text = CrfModel.toWapitiNative(res.model)
    assert(text.startsWith("#mdl#"))
    val reparsed = CrfModel.parse(text)
    assert(reparsed.labels == res.model.labels)
    val probes = Seq(
      Seq("T a", "x b", "x c", "o d", "x e"),
      Seq("o a", "x b", "T c", "x d", "o e"),
      Seq("x a"), Seq("T a"))
    probes.foreach { p =>
      assert(reparsed.decode(p) == res.model.decode(p),
        s"round-trip decode drift on $p")
    }
    // gzip + fromFile: the exact loading path a reference-shipped
    // model.wapiti.gz takes
    val dir = java.nio.file.Files.createTempDirectory("graft-crf-train")
    try {
      val gz = dir.resolve("model.wapiti.gz")
      val out = new java.util.zip.GZIPOutputStream(
        java.nio.file.Files.newOutputStream(gz))
      try out.write(text.getBytes("UTF-8")) finally out.close()
      val labeled = CrfLabeler.fromFile(gz.toString).label(
        syntheticDocs(2).withColumn("whitespace", lit(" "))
          .withColumn("text", split(col("features"), " ").getItem(0)))
      val got = labeled.orderBy("doc_id", "token_idx")
        .select("label").as[String].collect().toSeq
      assert(got == Seq("B-<t>", "I-<t>", "I-<t>", "O", "O",
        "O", "O", "B-<t>", "I-<t>", "O"))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("averaging across partitions preserves the fit when data is " +
      "spread one sequence per partition") {
    val df = syntheticDocs(8)
    val res = CrfTrainer.train(df, templates, epochs = 12,
      numPartitions = 8)
    assert(res.seqErrors.last == 0L,
      s"training error trace: ${res.seqErrors}")
  }
}
