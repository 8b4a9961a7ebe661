package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.http.HttpRequest.BodyPublishers
import java.net.http.HttpResponse.BodyHandlers

import graft.pipeline.Onnx
import graft.service.{AppConfig, GraftService}

/** The file-based configuration surface (reference
  * `resources/default_config/config.yml` loaded at
  * `app/parser.py:173-199`): the YAML-subset reader over the exact
  * shapes the reference config uses, the key mappings into
  * [[graft.pipeline.Processor.Config]] and the model/lexicon loaders,
  * and a service booted end-to-end from a config file with a REAL
  * ONNX model file driving the header labeler.
  */
class AppConfigSpec extends SparkSuite {

  private val referenceShapedYaml =
    """# deployment config (reference config.yml shape)
      |download_dir: '~/.cache/engine/downloads'
      |processors:
      |  fulltext:
      |    merge_raw_authors: false
      |    use_cv_model: true
      |    cv_render_dpi: 72   # inline comment
      |    max_graphic_distance: 0.4
      |    extract_citation_editors: true
      |xslt:
      |  tei_to_jats:
      |    parameters:
      |      output_parameters: 'false'
      |      acknowledgement_target: 'ack'
      |lookup:
      |  country:
      |    paths:
      |      - https://example.org/CountryCodes.xml
      |models:
      |  segmentation:
      |    path: 'https://example.org/model.tar.gz'
      |  name_header:
      |    path: 'https://example.org/name/header'
      |    engine: 'wapiti'
      |cv_models:
      |  default:
      |    path: 'lp://efficientdet/PubLayNet'
      |    engine: 'layout_parser'
      |    score_threshold: 0.25
      |""".stripMargin

  test("YAML-subset reader: nested maps, quoted scalars, lists, " +
      "comments, URL values with colons") {
    val cfg = AppConfig.parse(referenceShapedYaml)
    assert(cfg.get("download_dir").contains("~/.cache/engine/downloads"))
    assert(cfg.getInt("processors.fulltext.cv_render_dpi", 100) == 72)
    assert(cfg.getDouble("processors.fulltext.max_graphic_distance", 0.3)
      == 0.4)
    assert(cfg.useCvModel && !cfg.useOcrModel)
    assert(cfg.cvScoreThreshold == 0.25)
    assert(cfg.get("models.segmentation.path")
      .contains("https://example.org/model.tar.gz"))
    assert(cfg.getSeq("lookup.country.paths") ==
      Seq("https://example.org/CountryCodes.xml"))
    assert(cfg.teiToJatsParameters ==
      Map("output_parameters" -> "false", "acknowledgement_target" -> "ack"))
    // OCR wiring: use_ocr_model gates; engine glyph yields the in-JVM
    // recognizer reading real pixels; other engines degrade
    assert(cfg.ocrModel.isEmpty) // use_ocr_model absent in this yaml
    val ocrCfg = AppConfig.parse(
      """processors:
        |  fulltext:
        |    use_ocr_model: true
        |ocr_models:
        |  default:
        |    engine: 'glyph'
        |    max_resolution: 512
        |""".stripMargin)
    val ocr = ocrCfg.ocrModel.get
    assert(ocr(graft.pipeline.GlyphOcr.renderTextImage(Seq("Figure 4")))
      == "Figure 4")
    assert(AppConfig.parse(
      """processors:
        |  fulltext:
        |    use_ocr_model: true
        |ocr_models:
        |  default:
        |    engine: 'tesserocr'
        |""".stripMargin).ocrModel.isEmpty)
    assert(cfg.keys("models").toSet == Set("segmentation", "name_header"))
    // processors.fulltext.* → Processor.Config mapping
    val pc = cfg.processorConfig
    assert(pc.extractCitationEditors && pc.extractAuthors)
    // URL model paths and the lp:// CV scheme soft-degrade to None
    assert(cfg.labelerFor("segmentation").isEmpty)
    assert(cfg.labelerFor("name_header").isEmpty)
    assert(cfg.cvDetector.isEmpty)
    // absent lookup paths → no lexicon
    assert(cfg.lexicon(spark, "country").isEmpty)
    assert(cfg.lexicon(spark, "nonexistent").isEmpty)
    // tabs fail loudly like YAML proper
    intercept[IllegalArgumentException] { AppConfig.parse("a:\n\tb: 1") }
  }

  test("lexicon loader merges local word lists and TEI tables; " +
      "URL entries are skipped") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cfg-lex")
    try {
      java.nio.file.Files.write(dir.resolve("names.txt"),
        "Alice\nbob\n# comment\n\n".getBytes)
      java.nio.file.Files.write(dir.resolve("countries.xml"),
        "<table><row><cell>DE</cell><cell>Germany</cell></row></table>"
          .getBytes)
      val cfg = AppConfig.parse(
        s"""lookup:
           |  merged:
           |    paths:
           |      - https://example.org/skip-me.txt
           |      - ${dir.resolve("names.txt")}
           |      - ${dir.resolve("countries.xml")}
           |""".stripMargin)
      val words = cfg.lexicon(spark, "merged").get
        .collect().map(_.getString(0)).toSet
      assert(words == Set("alice", "bob", "de", "germany"), words)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("examples/config.yml parses and maps every documented surface " +
      "(and soft-degrades all its absent artifact paths)") {
    val cfg = AppConfig.fromFile("examples/config.yml")
    assert(cfg.cvRenderDpi == 100)
    assert(cfg.maxGraphicDistance == 0.3)
    assert(!cfg.useCvModel && !cfg.useOcrModel)
    assert(cfg.ocrModel.isEmpty) // use_ocr_model=false gates the engine
    assert(cfg.get("ocr_models.default.engine").contains("glyph"))
    // the example declares exactly the reference defaults
    assert(cfg.processorConfig == graft.pipeline.Processor.Config())
    assert(cfg.keys("models").toSet ==
      Set("segmentation", "header", "fulltext", "reference_segmenter"))
    assert(cfg.getSeq("models.header.labels").size == 5)
    // every artifact path in the example is absent here — each slot
    // soft-degrades instead of failing the boot
    Seq("segmentation", "header", "fulltext", "reference_segmenter")
      .foreach(m => assert(cfg.labelerFor(m).isEmpty, m))
    assert(cfg.cvDetector.isEmpty)
    assert(cfg.cvScoreThreshold == 0.1)
    assert(cfg.teiToJatsParameters("acknowledgement_target") == "ack")
    assert(cfg.getSeq("lookup.first_name.paths").size == 3)
    assert(cfg.lexicon(spark, "country").isEmpty)
  }

  test("cv_models.default with a local trained artifact loads the D5 " +
      "detector through the config path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cfg-cv")
    try {
      val quads = Seq(
        (0.0, 0.0, 0.5, 0.5), (0.5, 0.0, 0.5, 0.5),
        (0.0, 0.5, 0.5, 0.5), (0.5, 0.5, 0.5, 0.5))
      val cats = IndexedSeq("figure", "table")
      // the in-repo trained artifact (DetectorTrainer) IS the file a
      // deployment points cv_models.default.path at
      val bytes = graft.pipeline.DetectorTrainer.train(quads, cats,
        grid = 4, nSamples = 120, seed = 11L)
      val modelPath = dir.resolve("layout.onnx")
      java.nio.file.Files.write(modelPath, bytes)
      val cfg = AppConfig.parse(
        s"""cv_models:
           |  default:
           |    engine: 'onnx'
           |    path: '$modelPath'
           |    score_threshold: 0.5
           |    grid: 4
           |    categories:
           |      - 'figure'
           |      - 'table'
           |    anchors:
           |      - '0.0, 0.0, 0.5, 0.5'
           |      - '0.5, 0.0, 0.5, 0.5'
           |      - '0.0, 0.5, 0.5, 0.5'
           |      - '0.5, 0.5, 0.5, 0.5'
           |""".stripMargin)
      assert(cfg.cvScoreThreshold == 0.5)
      val det = cfg.cvDetector.get
      // a held-out fixture detects its planted boxes by category
      val rnd = new java.util.Random(123L)
      val fx = Iterator.continually(
        graft.pipeline.DetectorTrainer.renderFixture(rnd, quads, 2))
        .find(f => f.labels.contains(1) && f.labels.contains(2)).get
      val got = det(fx.png).map { case (x, y, _, _, cat, _) =>
        val a = quads.indexWhere { case (ax, ay, _, _) =>
          math.abs(ax * 64 - x) < 1 && math.abs(ay * 64 - y) < 1 }
        a -> cat
      }.toMap
      fx.labels.zipWithIndex.foreach { case (truth, a) =>
        val want = truth match {
          case 0 => None
          case c => Some(cats(c - 1))
        }
        assert(got.get(a) == want, s"anchor $a: ${got.get(a)} vs $want")
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("service boots from a config file: the configured ONNX model " +
      "file drives the header labeler, unresolved slots keep rule " +
      "labelers, processor flags apply") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cfg-srv")
    try {
      // a real ONNX file whose argmax is ALWAYS label 1 (I-<title>):
      // zero weights, bias (0, 1) — every header token labels title,
      // which the rule labeler never does for the author block, so the
      // response proves the configured model is the one labeling
      val featDim = 4
      val onnx = Onnx.buildDenseModel(featDim, Seq(
        Onnx.Dense(new Array[Float](2 * featDim), 2, Array(0f, 1f), "")))
      val modelPath = dir.resolve("header.onnx")
      java.nio.file.Files.write(modelPath, onnx)
      val cfgPath = dir.resolve("config.yml")
      java.nio.file.Files.write(cfgPath,
        s"""processors:
           |  fulltext:
           |    extract_citation_editors: true
           |models:
           |  header:
           |    engine: 'onnx'
           |    path: '$modelPath'
           |    feat_dim: $featDim
           |    labels:
           |      - 'O'
           |      - 'I-<title>'
           |  segmentation:
           |    engine: 'onnx'
           |    path: 'https://example.org/unreachable.onnx'
           |""".stripMargin.getBytes)
      val service = GraftService.fromConfigFile(spark, cfgPath.toString)
        .start()
      try {
        val alto = graft.queries.PipelineOps.altoOf(1L,
          "Neural Corpus Engines Alice Smith " +
            (1 to 30).map(i => s"word$i").mkString(" "))
        val client = HttpClient.newHttpClient()
        def modelRoute(): HttpResponse[String] = client.send(
          HttpRequest.newBuilder(
              URI.create(s"http://127.0.0.1:${service.boundPort}" +
                "/api/models/header?output_format=json"))
            .POST(BodyPublishers.ofString(alto)).build(),
          BodyHandlers.ofString())
        val r = modelRoute()
        assert(r.statusCode() == 200, r.body())
        // the configured all-title ONNX head labels EVERY header token
        // I-<title> — the rule labeler would put Alice Smith under
        // B-/I-<author>, so this output proves the model file is the
        // labeler answering the route
        assert(r.body().contains("\"Alice\""), r.body())
        assert(r.body().contains("I-<title>"), r.body())
        assert(!r.body().contains("<author>"), r.body())
        // unresolved segmentation slot kept its rule labeler: the
        // documentPipeline route still answers (rule fold untouched)
        val doc = client.send(
          HttpRequest.newBuilder(
              URI.create(s"http://127.0.0.1:${service.boundPort}" +
                "/api/processHeaderDocument"))
            .header("Accept", "application/tei+xml")
            .POST(BodyPublishers.ofString(alto)).build(),
          BodyHandlers.ofString())
        assert(doc.statusCode() == 200, doc.body())
        assert(doc.body().contains("Neural Corpus Engines"), doc.body())
      } finally service.stop()
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("train → export → config-load round-trip: a NeuralTrainer " +
      "artifact scores identically through labelerFor (positional " +
      "encoder + BIO mask), where the bag encoder would mislabel") {
    import spark.implicits._
    import graft.pipeline.{NeuralLabeler, NeuralTrainer}
    val dir = java.nio.file.Files.createTempDirectory("graft-cfg-rt")
    try {
      val featDim = 32
      // Two-column "1"/"0" flag lines where the LABEL depends on which
      // column carries the 1 — exactly the GROBID data-line shape whose
      // information the bag encoder destroys ("1 0" and "0 1" hash to
      // the same bag) and the positional encoder preserves.
      val rows = (0 until 40).map { i =>
        val flagFirst = i % 2 == 0
        val feats = if (flagFirst) "1 0" else "0 1"
        val label = if (flagFirst) "B-<kept>" else "O"
        (i.toLong, 0, 0, 0, 0, s"t$i", " ", feats, label)
      }
      val labeled = rows.toDF("doc_id", "page_idx", "block_idx",
        "line_idx", "token_idx", "text", "whitespace", "features", "label")
      val (labels, bytes) = NeuralTrainer.trainDenseHead(labeled,
        NeuralLabeler.positionalHashingEncoder(featDim), featDim,
        maxTokens = 1000, epochs = 200)
      val modelPath = dir.resolve("header.onnx")
      java.nio.file.Files.write(modelPath, bytes)
      val cfg = AppConfig.parse(
        s"""models:
           |  header:
           |    engine: 'onnx'
           |    path: '$modelPath'
           |    feat_dim: $featDim
           |    labels:
           |${labels.map(l => s"      - '$l'").mkString("\n")}
           |""".stripMargin)
      val got = cfg.labelerFor("header").get
        .label(labeled.drop("label"))
        .select("doc_id", "label").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      // the config-loaded labeler reproduces the training labels
      // exactly — scoring matches training featurization
      rows.foreach { case (id, _, _, _, _, _, _, _, want) =>
        assert(got(id) == want, s"doc $id: ${got(id)} vs $want")
      }
      // negative control: the SAME artifact scored through the bag
      // encoder (the pre-fix default) cannot separate the two classes
      val bag = graft.pipeline.Onnx.labelerFromFile(modelPath.toString,
        labels, NeuralLabeler.hashingEncoder(featDim), featDim).get
        .label(labeled.drop("label"))
        .select("label").distinct().collect().map(_.getString(0)).toSet
      assert(bag.size == 1, s"bag encoder separated anyway: $bag")
      // encoder: bag stays available as the declared opt-out
      val cfgBag = AppConfig.parse(
        s"""models:
           |  header:
           |    engine: 'onnx'
           |    path: '$modelPath'
           |    feat_dim: $featDim
           |    encoder: 'bag'
           |    labels:
           |${labels.map(l => s"      - '$l'").mkString("\n")}
           |""".stripMargin)
      val bagViaCfg = cfgBag.labelerFor("header").get
        .label(labeled.drop("label"))
        .select("label").distinct().collect().map(_.getString(0)).toSet
      assert(bagViaCfg == bag)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
