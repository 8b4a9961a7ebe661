package graft

import graft.pipeline.GraphicProvider

class GraphicProviderSpec extends SparkSuite {
  import spark.implicits._

  private def pages = Seq(
    (0L, 1, 612.0, 792.0), (0L, 2, 612.0, 792.0), (0L, 3, 1224.0, 792.0),
    (0L, 4, 612.0, 792.0),
    (1L, 1, 612.0, 792.0), (1L, 2, 612.0, 792.0), // uniform → none
  ).toDF("doc_id", "page_number", "width", "height")

  test("G5: uncommon page dimensions; uniform docs yield nothing") {
    val r = GraphicProvider.pagesWithUncommonDimension(pages)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(r == Set((0L, 3)))
  }

  test("G6 + I1: mostly-bitmap pages excluded from CV candidates") {
    val graphics = Seq(
      // covers 3/4 of page 3 → mostly bitmap
      (0L, 3, "g1", "png", 0.0, 0.0, 1224.0, 594.0),
      // svg ignored even though large
      (0L, 4, "g2", "svg", 0.0, 0.0, 612.0, 792.0),
      // small graphic → not mostly bitmap
      (0L, 1, "g3", "png", 0.0, 0.0, 50.0, 50.0),
    ).toDF("doc_id", "page_number", "graphic_id", "graphic_type", "x", "y", "w", "h")
      .selectExpr("doc_id", "page_number", "graphic_id", "graphic_type",
        "named_struct('x', x, 'y', y, 'width', w, 'height', h) as coords")
    val bitmap = GraphicProvider.pagesWithMostlyBitmapGraphics(pages, graphics)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(bitmap == Set((0L, 3)))
    val cv = GraphicProvider.cvCandidatePages(pages, graphics)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(cv == Set.empty) // the only uncommon page is mostly-bitmap
  }

  test("I2: next-page widening only for pages present in the document") {
    val candidates = Seq((0L, 2), (0L, 4)).toDF("doc_id", "page_number")
    val widened = GraphicProvider.withNextPages(candidates, pages)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(widened == Set((0L, 2), (0L, 3), (0L, 4))) // page 5 absent → not added
  }

  // ported from reference tests/cv_models/layout_parser_cv_model_test.py
  test("D5 filter: should filter by score") {
    // rectangles are (x1,y1,x2,y2) in the reference; our tuples are x,y,w,h
    val dets = Seq(
      (11.0, 10.0, 89.0, 90.0, "Test", 0.4),
      (12.0, 10.0, 88.0, 90.0, "Test", 0.5),
      (13.0, 10.0, 87.0, 90.0, "Test", 0.6))
    val r = GraphicProvider.filterDetections(dets, Set("Test"),
      scoreThreshold = 0.5, avoidOverlapping = false)
    assert(r == Seq((12.0, 10.0, 88.0, 90.0, "Test"),
      (13.0, 10.0, 87.0, 90.0, "Test")))
  }

  test("D5 filter: should avoid overlapping") {
    val dets = Seq(
      (11.0, 10.0, 89.0, 90.0, "Test", 0.6),
      (12.0, 10.0, 88.0, 90.0, "Test", 0.5))
    val r = GraphicProvider.filterDetections(dets, Set("Test"),
      scoreThreshold = 0.0, avoidOverlapping = true)
    assert(r == Seq((11.0, 10.0, 89.0, 90.0, "Test")))
  }

  test("D5 filter: should ignore empty bounding boxes") {
    val dets = Seq(
      (11.0, 10.0, 89.0, 0.0, "Test", 0.6),  // zero height
      (12.0, 10.0, 88.0, 90.0, "Test", 0.5),
      (13.0, 10.0, 87.0, 0.0, "Test", 0.4))
    val r = GraphicProvider.filterDetections(dets, Set("Test"),
      scoreThreshold = 0.0, avoidOverlapping = true)
    assert(r == Seq((12.0, 10.0, 88.0, 90.0, "Test")))
  }

  test("D5 filter: type-name selection") {
    val dets = Seq(
      (0.0, 0.0, 10.0, 10.0, "Figure", 0.9),
      (50.0, 50.0, 10.0, 10.0, "Table", 0.9))
    val r = GraphicProvider.filterDetections(dets, Set("Figure"))
    assert(r.map(_._5) == Seq("Figure"))
  }

  test("CV rewrite: tokens and graphics within the box replaced, " +
      "coordinate-less tokens kept (graphic_provider_test.py " +
      "test_should_replace_text_and_graphics_within_bounding_box...)") {
    // reference geometry: CV box (10,90,100x50); keep at (10,10,100x20)
    // does not overlap, remove at (10,100,100x20) is fully inside
    val base = Seq(
      (0L, "keep", 10.0, 10.0, 100.0, 20.0),
      (0L, "remove", 10.0, 100.0, 100.0, 20.0),
      (0L, "halfout", 10.0, 70.0, 100.0, 30.0), // 1/3 inside -> kept
    ).toDF("doc_id", "text", "cx", "cy", "cw", "ch")
      .withColumn("page_number", org.apache.spark.sql.functions.lit(1))
      .withColumn("page_width", org.apache.spark.sql.functions.lit(200.0))
      .withColumn("page_height", org.apache.spark.sql.functions.lit(200.0))
      .selectExpr("doc_id", "text",
        "named_struct('x', cx, 'y', cy, 'width', cw, 'height', ch) as coords",
        "page_number", "page_width", "page_height")
    val noCoords = Seq((0L, "nocoords")).toDF("doc_id", "text")
      .withColumn("coords", org.apache.spark.sql.functions
        .lit(null).cast(base.schema("coords").dataType))
      .withColumn("page_number", org.apache.spark.sql.functions.lit(1))
      .withColumn("page_width", org.apache.spark.sql.functions.lit(200.0))
      .withColumn("page_height", org.apache.spark.sql.functions.lit(200.0))
    val tokens = base.unionByName(noCoords)
    val graphics = Seq(
      (0L, "keep-graphic", "png", 10.0, 10.0, 100.0, 20.0, 1, 200.0, 200.0),
      (0L, "remove-graphic", "png", 10.0, 100.0, 100.0, 20.0, 1, 200.0, 200.0),
    ).toDF("doc_id", "graphic_id", "graphic_type", "x", "y", "width",
      "height", "page_number", "page_width", "page_height")
    val cv = Seq((0L, 1, "cv_1_0", 10.0, 90.0, 100.0, 50.0, "new-graphic"))
      .toDF("doc_id", "page_number", "cv_id", "x", "y", "width", "height",
        "category")
    val pageTable = Seq((0L, 1, 200.0, 200.0), (0L, 2, 200.0, 200.0))
      .toDF("doc_id", "page_number", "width", "height")
    val (t2, g2) = GraphicProvider.replaceByCvGraphics(tokens, graphics, cv,
      pageTable)
    assert(t2.collect().map(_.getString(1)).toSet ==
      Set("keep", "halfout", "nocoords"))
    val gRows = g2.collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(gRows == Set(("keep-graphic", "png"), ("cv_1_0", "new-graphic")))
    // replaceText = false keeps every token
    val (t3, _) = GraphicProvider.replaceByCvGraphics(tokens, graphics, cv,
      pageTable, replaceText = false)
    assert(t3.count() == 4)
    // a CV box on a TOKEN-LESS page (the scanned pages CV targets)
    // still lands in the graphics table with the page table's dims
    val cv2 = Seq((0L, 2, "cv_2_0", 5.0, 5.0, 50.0, 50.0, "figure"))
      .toDF("doc_id", "page_number", "cv_id", "x", "y", "width", "height",
        "category")
    val (_, g3) = GraphicProvider.replaceByCvGraphics(tokens, graphics, cv2,
      pageTable)
    val cvRow = g3.filter("graphic_id = 'cv_2_0'").collect().head
    assert(cvRow.getDouble(cvRow.fieldIndex("page_width")) == 200.0)
  }

  test("CV rewrite reconciles first: a matching embedded graphic keeps " +
      "its id and asset linkage (cv_graphic_provider.py:147-157)") {
    val tokens = Seq((0L, "caption"))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text",
        "named_struct('x', 12.0, 'y', 95.0, 'width', 20.0, 'height', 5.0) as coords",
        "1 as page_number")
    val graphics = Seq(
      (0L, "embedded.png", "png", 10.0, 90.0, 100.0, 50.0, 1, 200.0, 200.0))
      .toDF("doc_id", "graphic_id", "graphic_type", "x", "y", "width",
        "height", "page_number", "page_width", "page_height")
    // the CV box coincides with the embedded PNG (ratio 1.0 >= 0.80)
    val cv = Seq((0L, 1, "cv_1_0", 10.0, 90.0, 100.0, 50.0, "figure"))
      .toDF("doc_id", "page_number", "cv_id", "x", "y", "width", "height",
        "category")
    val pageTable = Seq((0L, 1, 200.0, 200.0))
      .toDF("doc_id", "page_number", "width", "height")
    val (t2, g2) = GraphicProvider.replaceByCvGraphics(tokens, graphics, cv,
      pageTable)
    // the embedded graphic survives under its own id; no cv row added
    assert(g2.collect().map(_.getString(1)).toSeq == Seq("embedded.png"))
    // text inside the reconciled graphic's box is still replaced
    assert(t2.count() == 0)
    // ... but a reconciled graphic mostly inside an UNMATCHED bigger
    // box is replaced by that box (the reference's sequential rewrite
    // processing the bigger box afterwards removes it)
    val cv2 = Seq(
      (0L, 1, "cv_1_0", 10.0, 90.0, 100.0, 50.0, "figure"), // reconciles
      (0L, 1, "cv_1_1", 5.0, 85.0, 180.0, 110.0, "figure")  // unmatched, contains it
    ).toDF("doc_id", "page_number", "cv_id", "x", "y", "width", "height",
      "category")
    val (_, g3) = GraphicProvider.replaceByCvGraphics(tokens, graphics, cv2,
      pageTable)
    assert(g3.collect().map(_.getString(1)).toSet == Set("cv_1_1"))
  }

  test("F5 outer: one row per CV box, unmatched boxes keep null graphic_id") {
    val cv = Seq(
      (0L, 1, "cv1", 10.0, 10.0, 100.0, 100.0),
      (0L, 1, "cv2", 400.0, 400.0, 50.0, 50.0),
      (0L, 9, "cv3", 0.0, 0.0, 10.0, 10.0), // page with no graphics at all
    ).toDF("doc_id", "page_number", "cv_id", "x", "y", "width", "height")
    val graphics = Seq(
      (0L, 1, "g1", 12.0, 12.0, 100.0, 100.0, "png"),
      (0L, 1, "g2", 30.0, 30.0, 100.0, 100.0, "png"),
    ).toDF("doc_id", "page_number", "graphic_id", "x", "y", "width", "height",
      "graphic_type")
    val rows = GraphicProvider.reconcileCvBoxesOuter(cv, graphics)
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    assert(rows == Map("cv1" -> Some("g1"), "cv2" -> None, "cv3" -> None))
  }

  test("F5: CV boxes reconcile to best-overlap graphic above threshold") {
    val cv = Seq(
      (0L, 1, "cv1", 10.0, 10.0, 100.0, 100.0),
      (0L, 1, "cv2", 400.0, 400.0, 50.0, 50.0),
    ).toDF("doc_id", "page_number", "cv_id", "x", "y", "width", "height")
    val graphics = Seq(
      (0L, 1, "g1", 12.0, 12.0, 100.0, 100.0, "png"),  // ≈0.96 overlap with cv1
      (0L, 1, "g2", 30.0, 30.0, 100.0, 100.0, "png"),  // lower overlap
      (0L, 1, "g3", 400.0, 400.0, 50.0, 50.0, "svg"),  // ignored type
    ).toDF("doc_id", "page_number", "graphic_id", "x", "y", "width", "height",
      "graphic_type")
    val r = GraphicProvider.reconcileCvBoxes(cv, graphics)
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    assert(r == Map("cv1" -> "g1")) // cv2's only overlap is svg → unmatched
  }
}
