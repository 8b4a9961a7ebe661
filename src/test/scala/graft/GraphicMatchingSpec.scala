package graft

import graft.pipeline.GraphicMatching
import graft.pipeline.GraphicMatching.Box

class GraphicMatchingSpec extends SparkSuite {
  import spark.implicits._

  test("distance: overlap is zero, axis gaps are euclidean") {
    val a = Box(0, 0, 1, 1, 1)
    assert(GraphicMatching.distance(a, Box(0.5, 0.5, 1, 1, 1)) == 0.0)
    assert(GraphicMatching.distance(a, Box(4, 0, 1, 1, 1)) == 3.0)
    assert(math.abs(GraphicMatching.distance(a, Box(4, 5, 1, 1, 1)) - 5.0) < 1e-12)
  }

  test("normalized: page-scaled with page-number y offset") {
    val n = GraphicMatching.normalized(Box(306, 396, 153, 198, 2), 612, 792)
    assert(n == Box(0.5, 2.5, 0.25, 0.25, 2))
  }

  test("greedyAssign: per-candidate best wins, losers rematch with absorbed boxes") {
    // two graphics close to the same candidate; after g1 wins round 1,
    // the candidate absorbs g1's box, bringing g2 within range round 2
    val g1 = ("g1", Seq(Box(0.10, 1.0, 0.1, 0.1, 1)))
    val g2 = ("g2", Seq(Box(0.45, 1.0, 0.1, 0.1, 1)))
    val cand = ("fig1", Seq(Box(0.0, 1.0, 0.05, 0.1, 1)))
    val ms = GraphicMatching.greedyAssign(Seq(g1, g2), Seq(cand), maxDistance = 0.3)
    assert(ms == Seq(("g1", "fig1"), ("g2", "fig1")))
  }

  test("greedyAssign: out-of-range graphic stays unmatched") {
    val ms = GraphicMatching.greedyAssign(
      Seq(("g1", Seq(Box(0.9, 5.0, 0.05, 0.05, 5)))),
      Seq(("fig1", Seq(Box(0.0, 1.0, 0.05, 0.1, 1)))))
    assert(ms.isEmpty)
  }

  test("F4 text matcher: reference related-block cases") {
    // ported from tests/processors/graphic_matching_test.py
    // TestGraphicRelatedBlockTextGraphicMatcher (prefix-3 key: "Fig 1"
    // matches "Figure 1", "F 1"/"Fug 1" do not)
    val cases = Seq(
      ("Figure 1", "Figure 1", true),
      ("Figure 1", "Figure 2", false),
      ("Fig 1", "Figure 1", true),
      ("F 1", "Figure 1", false),
      ("Fug 1", "Figure 1", false),
      ("Other\nFigure 1\nMore", "Figure 1", true))
    cases.foreach { case (related, label, should) =>
      val gl = Seq((0L, "g0", related.split("\n")))
        .toDF("doc_id", "graphic_id", "lines")
      val cand = Seq((0L, "fig_0", label))
        .toDF("doc_id", "candidate_id", "label_text")
      val m = GraphicMatching.matchGraphicsByText(gl, cand).collect()
      assert(m.nonEmpty == should, s"'$related' vs '$label'")
      if (should) assert(m.head.getString(2) == "fig_0")
    }
  }

  test("F4 text matcher: '' keys kept — a label-less candidate matches a " +
      "punctuation-only line; natural-order last wins duplicate keys") {
    // SimpleContentIdMatcher's dicts keep the ''-normalized key
    // (ref_matching.py:44-63); a whitespace-only line still probes it
    // (only STRICTLY empty lines skip, graphic_matching.py:533-535)
    val cand = Seq((0L, "fig_0", "·"), (0L, "fig_1", "Figure 1"))
      .toDF("doc_id", "candidate_id", "label_text")
    val punct = Seq((0L, "g0", Array("¶")))
      .toDF("doc_id", "graphic_id", "lines")
    assert(GraphicMatching.matchGraphicsByText(punct, cand)
      .collect().map(_.getString(2)).toSeq == Seq("fig_0"))
    val blank = Seq((0L, "g0", Array("   ")))
      .toDF("doc_id", "graphic_id", "lines")
    assert(GraphicMatching.matchGraphicsByText(blank, cand)
      .collect().map(_.getString(2)).toSeq == Seq("fig_0"))
    // duplicate '' keys: the LAST candidate in natural id order wins,
    // like the reference dict's last-inserted entry (fig_10 > fig_9)
    val many = (0 to 10).map(i => (0L, s"fig_$i", "·"))
      .toDF("doc_id", "candidate_id", "label_text")
    assert(GraphicMatching.matchGraphicsByText(punct, many)
      .collect().map(_.getString(2)).toSeq == Seq("fig_10"))
  }

  test("F4 text matcher: graphic without related-block lines stays unmatched") {
    val gl = Seq((0L, "g0", Array.empty[String]))
      .toDF("doc_id", "graphic_id", "lines")
    val cand = Seq((0L, "fig_0", "Figure 1"))
      .toDF("doc_id", "candidate_id", "label_text")
    assert(GraphicMatching.matchGraphicsByText(gl, cand).collect().isEmpty)
  }

  test("F4 text matcher: first matching line wins, per doc") {
    val gl = Seq(
      (0L, "g0", Array("noise", "Table 2", "Figure 1")),
      (1L, "g0", Array("Figure 1"))).toDF("doc_id", "graphic_id", "lines")
    val cand = Seq(
      (0L, "fig_0", "Figure 1"), (0L, "tab_1", "Table 2"),
      (1L, "figA", "Figure 1")).toDF("doc_id", "candidate_id", "label_text")
    val ms = GraphicMatching.matchGraphicsByText(gl, cand)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(ms == Set((0L, "g0", "tab_1"), (1L, "g0", "figA")))
  }

  test("D6 OCR seam: binary graphic -> lines -> text matcher") {
    // deterministic fake OCR: decodes the bytes as UTF-8 (tesserocr
    // slots into the same function seam in production)
    val graphics = Seq(
      (0L, "g0", "Other\nFigure 1".getBytes("UTF-8")),
      (0L, "g1", Array.empty[Byte])).toDF("doc_id", "graphic_id", "image")
    val lines = GraphicMatching.ocrLines(graphics,
      bytes => new String(bytes, "UTF-8"))
    val cand = Seq((0L, "fig_0", "Figure 1"))
      .toDF("doc_id", "candidate_id", "label_text")
    val ms = GraphicMatching.matchGraphicsByText(lines, cand)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(ms.toSeq == Seq(("g0", "fig_0")))
  }

  test("D6 in-JVM OCR: template-correlation recognition on REAL rendered " +
      "pixels drives the F4 text matcher end-to-end") {
    import graft.pipeline.GlyphOcr
    // direct round-trip: rendered label text reads back exactly
    val png = GlyphOcr.renderTextImage(Seq("Other text", "Figure 1"))
    assert(GlyphOcr.recognize(png) == "Other text\nFigure 1")
    // different render size than the templates (scale normalization)
    val small = GlyphOcr.renderTextImage(Seq("Table 2"), fontSize = 18)
    assert(GlyphOcr.recognize(small) == "Table 2")
    // a wide render exercises the reference's 1024 resolution cap
    // (utils/image.py:4-17) — the downscaled glyphs still read
    val wide = GlyphOcr.renderTextImage(
      Seq("Figure 3 shows the measured throughput over time"),
      fontSize = 40)
    assert(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(wide)).getWidth > 1024)
    assert(GlyphOcr.recognize(wide)
      .contains("Figure 3"))
    // undecodable bytes read as empty text, not an exception
    assert(GlyphOcr.recognize(Array[Byte](9, 9, 9)) == "")

    // end-to-end: real pixels -> ocrLines -> matchGraphicsByText (F4)
    val graphics = Seq(
      (0L, "g0", GlyphOcr.renderTextImage(Seq("Other", "Figure 1"))),
      (0L, "g1", Array[Byte](1, 2, 3)))
      .toDF("doc_id", "graphic_id", "image")
    val lines = GraphicMatching.ocrLines(graphics,
      GlyphOcr.recognize(_))
    val cand = Seq((0L, "fig_0", "Figure 1"))
      .toDF("doc_id", "candidate_id", "label_text")
    val ms = GraphicMatching.matchGraphicsByText(lines, cand)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(ms.toSeq == Seq(("g0", "fig_0")))
  }

  test("p20 OCR pipeline entry: every document's rendered figure label " +
      "reads back and selects exactly its own candidate") {
    val got = graft.queries.PipelineOps.p20(spark, sf("0.001"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.nonEmpty)
    got.foreach { case (id, cand) =>
      assert(cand == s"fig_${id / 7 % 7 + 1}", s"doc $id matched $cand")
    }
    // one match per sliced document: OCR read every rendered graphic
    val n = graft.Tables(spark, sf("0.001")).documents
      .filter(org.apache.spark.sql.functions.col("doc_id") % 7 === 0).count()
    assert(got.length == n, s"${got.length} of $n docs matched")
    assert(got.map(_._2).distinct.length > 1, "labels must vary")
  }

  test("relatedBlockLines: nearest block's lines in reading order") {
    val xml =
      """<alto xmlns="http://www.loc.gov/standards/alto/ns-v3#">
        |<Styles><TextStyle ID="f1" FONTFAMILY="Times" FONTSIZE="10.0" FONTSTYLE=""/></Styles>
        |<Layout><Page PHYSICAL_IMG_NR="1" WIDTH="612" HEIGHT="792"><PrintSpace>
        |<TextBlock><TextLine><String CONTENT="far" HPOS="500" VPOS="700" WIDTH="30" HEIGHT="10" STYLEREFS="f1"/></TextLine></TextBlock>
        |<TextBlock>
        |<TextLine><String CONTENT="Figure" HPOS="100" VPOS="300" WIDTH="50" HEIGHT="10" STYLEREFS="f1"/>
        |<String CONTENT="1" HPOS="155" VPOS="300" WIDTH="10" HEIGHT="10" STYLEREFS="f1"/></TextLine>
        |<TextLine><String CONTENT="caption" HPOS="100" VPOS="314" WIDTH="60" HEIGHT="10" STYLEREFS="f1"/></TextLine>
        |</TextBlock>
        |</PrintSpace></Page></Layout></alto>""".stripMargin
    val tokens = graft.sources.AltoReader.tokens(Seq((0L, xml)).toDS()).toDF()
    val graphics = Seq((0L, "g0", 0, 100.0, 250.0, 80.0, 40.0))
      .toDF("doc_id", "graphic_id", "page_idx", "x", "y", "width", "height")
    val lines = GraphicMatching.relatedBlockLines(graphics, tokens)
      .collect().map(r => r.getSeq[String](2))
    assert(lines.length == 1 && lines.head == Seq("Figure 1", "caption"))
  }

  test("relatedLines: only-graphic-on-page takes the page text; shared pages fall back") {
    // page 1: one graphic -> page-level linkage (all blocks' lines);
    // page 2: two graphics -> nearest-block fallback each
    val xml =
      """<alto xmlns="http://www.loc.gov/standards/alto/ns-v3#">
        |<Styles><TextStyle ID="f1" FONTFAMILY="Times" FONTSIZE="10.0" FONTSTYLE=""/></Styles>
        |<Layout><Page PHYSICAL_IMG_NR="1" WIDTH="612" HEIGHT="792"><PrintSpace>
        |<TextBlock><TextLine><String CONTENT="intro" HPOS="100" VPOS="100" WIDTH="40" HEIGHT="10" STYLEREFS="f1"/></TextLine></TextBlock>
        |<TextBlock><TextLine><String CONTENT="Figure" HPOS="100" VPOS="300" WIDTH="50" HEIGHT="10" STYLEREFS="f1"/>
        |<String CONTENT="1" HPOS="155" VPOS="300" WIDTH="10" HEIGHT="10" STYLEREFS="f1"/></TextLine></TextBlock>
        |</PrintSpace></Page>
        |<Page PHYSICAL_IMG_NR="2" WIDTH="612" HEIGHT="792"><PrintSpace>
        |<TextBlock><TextLine><String CONTENT="near-g2" HPOS="100" VPOS="100" WIDTH="40" HEIGHT="10" STYLEREFS="f1"/></TextLine></TextBlock>
        |<TextBlock><TextLine><String CONTENT="near-g3" HPOS="100" VPOS="700" WIDTH="40" HEIGHT="10" STYLEREFS="f1"/></TextLine></TextBlock>
        |</PrintSpace></Page></Layout></alto>""".stripMargin
    val tokens = graft.sources.AltoReader.tokens(Seq((0L, xml)).toDS()).toDF()
    val graphics = Seq(
      (0L, "g1", 0, 400.0, 600.0, 50.0, 50.0),  // alone on page 1
      (0L, "g2", 1, 100.0, 120.0, 50.0, 50.0),  // page 2, near first block
      (0L, "g3", 1, 100.0, 650.0, 50.0, 50.0),  // page 2, near second block
    ).toDF("doc_id", "graphic_id", "page_idx", "x", "y", "width", "height")
    val lines = GraphicMatching.relatedLines(graphics, tokens)
      .collect().map(r => r.getString(1) -> r.getSeq[String](2)).toMap
    // g1 gets the WHOLE page-1 text even though its box is far from both
    // blocks — the page-level linkage, no distance involved
    assert(lines("g1") == Seq("intro", "Figure 1"))
    assert(lines("g2") == Seq("near-g2"))
    assert(lines("g3") == Seq("near-g3"))
    // the F4 matcher resolves g1 from the page linkage alone
    val cands = Seq((0L, "fig_0", "Figure 1"))
      .toDF("doc_id", "candidate_id", "label_text")
    val m = GraphicMatching.matchGraphicsByText(
        GraphicMatching.relatedLines(graphics, tokens), cands)
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    assert(m == Map("g1" -> "fig_0"))
  }

  test("relatedLines: ALTO Illustration adjacency wins over derived linkage") {
    // the Illustration is NESTED in the caption block (block 1); its
    // bounding box sits NEXT TO the decoy block, so the nearest-block
    // fallback would pick the decoy and the page-level linkage would
    // take everything — only the explicit adjacency yields exactly the
    // caption block
    val xml =
      """<alto xmlns="http://www.loc.gov/standards/alto/ns-v3#">
        |<Styles><TextStyle ID="f1" FONTFAMILY="Times" FONTSIZE="10.0" FONTSTYLE=""/></Styles>
        |<Layout><Page PHYSICAL_IMG_NR="1" WIDTH="612" HEIGHT="792"><PrintSpace>
        |<TextBlock><TextLine><String CONTENT="decoy" HPOS="100" VPOS="100" WIDTH="40" HEIGHT="10" STYLEREFS="f1"/></TextLine></TextBlock>
        |<TextBlock>
        |<TextLine><String CONTENT="Figure" HPOS="100" VPOS="700" WIDTH="50" HEIGHT="10" STYLEREFS="f1"/>
        |<String CONTENT="1" HPOS="155" VPOS="700" WIDTH="10" HEIGHT="10" STYLEREFS="f1"/></TextLine>
        |<Illustration FILEID="img1" TYPE="png" HPOS="100" VPOS="90" WIDTH="60" HEIGHT="30"/>
        |</TextBlock>
        |</PrintSpace></Page></Layout></alto>""".stripMargin
    import org.apache.spark.sql.functions.col
    val ds = Seq((0L, xml)).toDS()
    val tokens = graft.sources.AltoReader.tokens(ds).toDF()
    val parsed = graft.sources.AltoReader.graphics(ds).toDF()
    // parser recorded the enclosing block as the adjacency
    assert(parsed.select("related_block_idx").collect().head.getInt(0) == 1)
    val graphics = parsed.select(col("doc_id"),
      col("file_id").as("graphic_id"), col("page_idx"),
      col("coords.x").as("x"), col("coords.y").as("y"),
      col("coords.width").as("width"), col("coords.height").as("height"),
      col("related_block_idx"))
    val lines = GraphicMatching.relatedLines(graphics, tokens)
      .collect().map(r => r.getString(1) -> r.getSeq[String](2)).toMap
    assert(lines == Map("img1" -> Seq("Figure 1")), lines)
    // with the adjacency column dropped, the derived page-level linkage
    // (only graphic on page) would have taken the decoy too
    val fallback = GraphicMatching.relatedLines(
        graphics.drop("related_block_idx"), tokens)
      .collect().map(r => r.getString(1) -> r.getSeq[String](2)).toMap
    assert(fallback("img1") == Seq("decoy", "Figure 1"))
  }

  test("matchGraphics: distributed join + per-doc fold") {
    val graphics = Seq(
      (0L, "g1", 61.2, 79.2, 61.2, 79.2, 1, 612.0, 792.0),   // near fig1
      (0L, "g2", 550.0, 700.0, 50.0, 50.0, 3, 612.0, 792.0), // far page
      (1L, "g1", 61.2, 79.2, 61.2, 79.2, 1, 612.0, 792.0),   // other doc
    ).toDF("doc_id", "graphic_id", "x", "y", "width", "height",
      "page_number", "page_width", "page_height")
    val candidates = Seq(
      (0L, "fig1", 61.2, 158.4, 61.2, 79.2, 1, 612.0, 792.0),
      (1L, "figA", 61.2, 158.4, 61.2, 79.2, 1, 612.0, 792.0),
    ).toDF("doc_id", "candidate_id", "x", "y", "width", "height",
      "page_number", "page_width", "page_height")
    val ms = GraphicMatching.matchGraphics(graphics, candidates)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(ms == Set((0L, "g1", "fig1"), (1L, "g1", "figA")))
  }

  test("matchGraphics: reference page-boundary and empty-graphic cases") {
    // graphic_matching_test.py BoundingBoxDistanceGraphicMatcher —
    // page 100x200, candidate at the bottom of page 1
    def gdf(rows: (Long, String, Double, Double, Double, Double, Int)*) =
      rows.map { case (d, id, x, y, w, h, p) => (d, id, x, y, w, h, p, 100.0, 200.0) }
        .toDF("doc_id", "graphic_id", "x", "y", "width", "height",
          "page_number", "page_width", "page_height")
    def cdf(rows: (Long, String, Double, Double, Double, Double, Int)*) =
      rows.map { case (d, id, x, y, w, h, p) => (d, id, x, y, w, h, p, 100.0, 200.0) }
        .toDF("doc_id", "candidate_id", "x", "y", "width", "height",
          "page_number", "page_width", "page_height")
    def matches(g: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.DataFrame) =
      GraphicMatching.matchGraphics(g, c).collect()
        .map(r => r.getString(1) -> r.getString(2)).toSet
    // a zero-area graphic never matches, even at identical coordinates
    assert(matches(gdf((0L, "empty", 20, 180, 0, 0, 1)),
      cdf((0L, "cand", 20, 180, 60, 20, 1))).isEmpty)
    // the same box a whole page away stays unmatched (distance 1.0)
    assert(matches(gdf((0L, "far", 20, 100, 60, 20, 2)),
      cdf((0L, "cand", 20, 100, 60, 20, 1))).isEmpty)
    // a graphic at the TOP of the NEXT page matches the candidate at
    // the bottom of the previous one (cross-page gap 0.05 < 0.3)
    assert(matches(gdf((0L, "g1", 20, 10, 60, 50, 2)),
      cdf((0L, "cand", 20, 180, 60, 20, 1))) == Set("g1" -> "cand"))
    // continuation: BOTH page-1 and page-2 graphics match the same
    // candidate across greedy rounds (winners stay in the pool)
    assert(matches(
      gdf((0L, "g1", 20, 140, 60, 50, 1), (0L, "g2", 20, 10, 60, 50, 2)),
      cdf((0L, "cand", 20, 110, 60, 20, 1))) ==
      Set("g1" -> "cand", "g2" -> "cand"))
    // acceptance is the reference's STRICT bound (graphic_matching.py:
    // 334-335 euclidean < max_distance): a gap of exactly 0.3 does
    // not match (cand bottom ny 1.8, graphic top ny 2.1)
    assert(matches(gdf((0L, "g1", 20, 20, 60, 40, 2)),
      cdf((0L, "cand", 20, 150, 60, 10, 1))).isEmpty)
    // a continuation CHAIN through a tall absorbed graphic reaches a
    // page the candidate is not adjacent to (the reference's greedy
    // has no page bound; a pairwise page-adjacency pre-filter would
    // wrongly drop g2): cand p1 ny 1.75-1.8; g1 p2 ny 2.05-2.95 (gap
    // 0.25, round 1); g2 p3 ny 3.0-3.2 (gap 0.05 to the absorbed box,
    // round 2, but 1.2 to the candidate itself, 2 pages away)
    assert(matches(
      gdf((0L, "g1", 20, 10, 60, 180, 2), (0L, "g2", 20, 0, 60, 40, 3)),
      cdf((0L, "cand", 20, 150, 60, 10, 1))) ==
      Set("g1" -> "cand", "g2" -> "cand"))
  }

  test("assignDocument parity: distributed output equals the per-doc loop " +
      "on random box sets") {
    val rnd = new scala.util.Random(42)
    val docs = (0 until 8).map { d =>
      def box() = (rnd.nextDouble() * 80, rnd.nextDouble() * 180,
        rnd.nextInt(4) * 20.0, rnd.nextInt(4) * 15.0, // width/height may be 0
        1 + rnd.nextInt(3))
      val gs = (0 until 1 + rnd.nextInt(5)).map(i => (s"g$i", box()))
      val cs = (0 until 1 + rnd.nextInt(4)).map(i => (s"c$i", box()))
      (d.toLong, gs, cs)
    }
    val gdf = docs.flatMap { case (d, gs, _) => gs.map { case (id, (x, y, w, h, p)) =>
      (d, id, x, y, w, h, p, 100.0, 200.0) } }
      .toDF("doc_id", "graphic_id", "x", "y", "width", "height",
        "page_number", "page_width", "page_height")
    val cdf = docs.flatMap { case (d, _, cs) => cs.map { case (id, (x, y, w, h, p)) =>
      (d, id, x, y, w, h, p, 100.0, 200.0) } }
      .toDF("doc_id", "candidate_id", "x", "y", "width", "height",
        "page_number", "page_width", "page_height")
    val distributed = GraphicMatching.matchGraphics(gdf, cdf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val local = docs.flatMap { case (d, gs, cs) =>
      GraphicMatching.assignDocument(
        gs.map { case (id, (x, y, w, h, p)) =>
          id -> Seq(GraphicMatching.normalized(Box(x, y, w, h, p), 100, 200)) },
        cs.map { case (id, (x, y, w, h, p)) =>
          id -> Seq(GraphicMatching.normalized(Box(x, y, w, h, p), 100, 200)) })
        .map { case (g, c) => (d, g, c) }
    }.toSet
    assert(distributed == local)
  }

  test("assignDocument parity: the distributed and the in-fold form agree") {
    // the same chain scenario, page 100x200, through assignDocument
    // (the function Processor.matchGraphicsLocal delegates to)
    def nb(x: Double, y: Double, w: Double, h: Double, p: Int) =
      GraphicMatching.normalized(Box(x, y, w, h, p), 100, 200)
    val gs = Seq(
      "g1" -> Seq(nb(20, 10, 60, 180, 2)),
      "g2" -> Seq(nb(20, 0, 60, 40, 3)),
      "empty" -> Seq(nb(20, 150, 0, 0, 1)))
    val cs = Seq("cand" -> Seq(nb(20, 150, 60, 10, 1)))
    assert(GraphicMatching.assignDocument(gs, cs) ==
      Seq("g1" -> "cand", "g2" -> "cand"))
  }

  test("greedyAssign rounds >= 2: only previously-matched candidates " +
      "stay in the pool, in match-insertion order") {
    // graphic_matching.py:410-417 iter_remaining_candidate_bounding_
    // box_refs: the next round's candidate list is EXACTLY this
    // round's matches (extended), in the order they were won. g3 sits
    // out round 1 (0.316 > 0.3 to both originals) and in round 2 ties
    // at distance 0.0 against both extended candidates — the winner
    // must be the FIRST-matched one (c2, won by g1), not the
    // naturally-first id (c1)
    val cs = Seq(
      "c1" -> Seq(Box(0.0, 1.55, 0.1, 0.1, 1)),
      "c2" -> Seq(Box(0.0, 1.0, 0.1, 0.1, 1)))
    val gs = Seq(
      "g1" -> Seq(Box(0.0, 1.15, 0.5, 0.1, 1)),
      "g2" -> Seq(Box(0.0, 1.40, 0.5, 0.1, 1)),
      "g3" -> Seq(Box(0.4, 1.20, 0.1, 0.25, 1)))
    assert(GraphicMatching.assignDocument(gs, cs) ==
      Seq("g1" -> "c2", "g2" -> "c1", "g3" -> "c2"))
  }

  test("assignDocument: duplicate ids merge into one multi-box ref") {
    def nb(x: Double, y: Double, w: Double, h: Double, p: Int) =
      GraphicMatching.normalized(Box(x, y, w, h, p), 100, 200)
    // the same graphic id arrives as two rows (one box per page); it
    // must propose ONCE with the box union, not double-match two
    // candidates
    val gs = Seq(
      "g1" -> Seq(nb(20, 150, 60, 40, 1)),
      "g1" -> Seq(nb(20, 10, 60, 40, 2)))
    val cs = Seq(
      "c1" -> Seq(nb(20, 120, 60, 20, 1)),
      "c2" -> Seq(nb(20, 60, 60, 20, 2)))
    val ms = GraphicMatching.assignDocument(gs, cs)
    assert(ms.size == 1, ms)
    assert(ms.head._1 == "g1")
  }
}
