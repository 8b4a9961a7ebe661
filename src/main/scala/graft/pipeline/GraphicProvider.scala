package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CV candidate-page pruning + CV-box reconciliation (SURVEY.md G5, G6,
  * I1, I2, F5, H3; reference `processors/graphic_provider.py:78-162`,
  * `cv_graphic_provider.py:38-80`).
  *
  * This is the reference's "partition pruning" analog (§4): the
  * expensive CV/page-render stage only runs on pages selected here, so
  * these cheap aggregations gate the costly `mapPartitions` — the
  * pruning itself is plain filters and per-doc window aggregates.
  */
object GraphicProvider {

  /** G5: pages whose dimensions differ from the document's modal page
    * dimension (no result when all pages share one dimension).
    * `pages`: (doc_id, page_number, width, height).
    */
  def pagesWithUncommonDimension(pages: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy("doc_id")
    val byDim = Window.partitionBy("doc_id", "width", "height")
    // modal dimension via count desc, ties broken deterministically
    val winner = Window.partitionBy("doc_id")
      .orderBy(col("dim_n").desc, col("width"), col("height"))
    pages
      .withColumn("dim_n", count(lit(1)).over(byDim))
      .withColumn("n_dims", size(collect_set(struct(col("width"), col("height"))).over(byDoc)))
      .withColumn("dim_rank", dense_rank().over(winner))
      .filter(col("n_dims") >= 2 && col("dim_rank") > 1)
      .select("doc_id", "page_number")
  }

  /** G6: pages where any non-svg graphic covers > `ratio` of the page.
    * `graphics`: GraphicRow-shaped frame joined against page dims.
    */
  def pagesWithMostlyBitmapGraphics(pages: DataFrame, graphics: DataFrame,
      ratio: Double = 0.5): DataFrame =
    graphics
      .filter(col("graphic_type") =!= "svg" && col("coords").isNotNull)
      .join(pages, Seq("doc_id", "page_number"))
      .filter(col("width") * col("height") > 0 &&
        (col("coords.width") * col("coords.height")) /
          (col("width") * col("height")) > ratio)
      .select("doc_id", "page_number").distinct()

  /** I1: CV candidate pages = uncommon-dimension − mostly-bitmap. */
  def cvCandidatePages(pages: DataFrame, graphics: DataFrame): DataFrame =
    pagesWithUncommonDimension(pages)
      .except(pagesWithMostlyBitmapGraphics(pages, graphics))

  /** I2: page set ∪ next-page-if-present (candidate widening). */
  def withNextPages(pageNumbers: DataFrame, allPages: DataFrame): DataFrame =
    pageNumbers
      .union(pageNumbers.withColumn("page_number", col("page_number") + 1)
        .join(allPages.select("doc_id", "page_number").distinct(),
          Seq("doc_id", "page_number"), "left_semi"))
      .distinct()

  /** D5: the reference's post-detection filter
    * (`cv_models/layout_parser_cv_model.py:56-110`): keep detections of
    * the requested types with `score >= scoreThreshold` and a non-empty
    * bounding box, then — when `avoidOverlapping` — a greedy sequential
    * suppression in detection order: a box is dropped when its
    * intersection with ANY previously-kept box covers ≥ `maxOverlapRatio`
    * of the box's own area. Pure per-image logic (row-local), applied
    * inside the detector `mapPartitions` — no shuffle.
    *
    * @param detections (x, y, width, height, category, score) in
    *                   detector output order
    * @param typeNames categories to keep; empty = all
    */
  def filterDetections(
      detections: Seq[(Double, Double, Double, Double, String, Double)],
      typeNames: Set[String] = Set.empty,
      scoreThreshold: Double = 0.1,
      avoidOverlapping: Boolean = true,
      maxOverlapRatio: Double = 0.1)
    : Seq[(Double, Double, Double, Double, String)] = {
    val eligible = detections.collect {
      case (x, y, w, h, cat, score)
        if score >= scoreThreshold && w > 0 && h > 0 &&
          (typeNames.isEmpty || typeNames.contains(cat)) => (x, y, w, h, cat)
    }
    if (!avoidOverlapping) eligible
    else {
      val kept = scala.collection.mutable.ArrayBuffer
        .empty[(Double, Double, Double, Double, String)]
      eligible.foreach { case d @ (x, y, w, h, _) =>
        val overlapping = kept.exists { case (kx, ky, kw, kh, _) =>
          val ix = math.min(x + w, kx + kw) - math.max(x, kx)
          val iy = math.min(y + h, ky + kh) - math.max(y, ky)
          ix > 0 && iy > 0 && ix * iy / (w * h) >= maxOverlapRatio
        }
        if (!overlapping) kept += d
      }
      kept.toSeq
    }
  }

  /** D5 seam: CV layout detection over rendered page images (reference
    * `cv_models/layout_parser_cv_model.py:56-141`). The detector is an
    * injectable function — ONNX/layout-parser session in production, a
    * deterministic fake in tests (this container ships no CV model).
    * `mapPartitions` so one detector session amortizes over a
    * partition; run it on [[cvCandidatePages]]-pruned images only.
    *
    * @param pageImages (doc_id, page_number, image: binary)
    * @param detector image bytes → (x, y, width, height, category) boxes
    * @return (doc_id, page_number, cv_id, x, y, width, height, category)
    */
  def detectBoxes(pageImages: DataFrame,
      detector: Array[Byte] => Seq[(Double, Double, Double, Double, String)])
    : DataFrame =
    detectBoxesScored(pageImages,
      detector.andThen(_.map { case (x, y, w, h, cat) => (x, y, w, h, cat, 1.0) }),
      scoreThreshold = 0.0, avoidOverlapping = false)

  /** D5 with the reference's production post-filter: a scored detector
    * (the raw model output) run through [[filterDetections]] per image —
    * score threshold (shipped config `config.yml:108` uses 0.1),
    * type-name selection and greedy overlap suppression, all inside the
    * per-partition detector session.
    */
  def detectBoxesScored(pageImages: DataFrame,
      detector: Array[Byte] => Seq[(Double, Double, Double, Double, String, Double)],
      typeNames: Set[String] = Set.empty,
      scoreThreshold: Double = 0.1,
      avoidOverlapping: Boolean = true,
      maxOverlapRatio: Double = 0.1): DataFrame = {
    val sparkSession = pageImages.sparkSession
    import sparkSession.implicits._
    pageImages.select(col("doc_id"), col("page_number"), col("image"))
      .as[(Long, Int, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (docId, pageNumber, image) =>
          filterDetections(detector(image), typeNames, scoreThreshold,
              avoidOverlapping, maxOverlapRatio)
            .zipWithIndex.map { case ((x, y, w, h, cat), i) =>
              (docId, pageNumber, s"cv_${pageNumber}_$i", x, y, w, h, cat)
            }
        }
      }
      .toDF("doc_id", "page_number", "cv_id", "x", "y", "width", "height",
        "category")
  }

  /** F5/H3: reconcile CV-detected boxes with embedded page graphics by
    * area-intersection ratio ≥ `threshold`, best-overlap-wins (max_by +
    * row_number top-1). Unmatched CV boxes fall through to page-image
    * cropping in the reference.
    * `cvBoxes`: (doc_id, page_number, cv_id, x, y, width, height)
    * `graphics`: (doc_id, page_number, graphic_id, x, y, width, height,
    * graphic_type)
    */
  def reconcileCvBoxes(cvBoxes: DataFrame, graphics: DataFrame,
      threshold: Double = 0.80,
      ignoredGraphicTypes: Seq[String] = Seq("svg")): DataFrame =
    reconcileCvBoxesOuter(cvBoxes, graphics, threshold, ignoredGraphicTypes)
      .filter(col("graphic_id").isNotNull)
      .select("doc_id", "cv_id", "graphic_id", "area_ratio")

  /** Broadcast anti-join dropping rows mostly inside any box
    * (`are_page_coordinates_within_bounding_box`,
    * processors/graphic_provider.py:150-175: intersection ≥
    * `minAreaRatio` of the ITEM's own area; zero-area items always
    * stay). `boxes` needs (doc_id, page_number, x, y, width, height).
    * The corpus-sized side never shuffles. */
  private def removeWithinBoxes(df: DataFrame, boxes: DataFrame,
      itemX: Column, itemY: Column, itemW: Column, itemH: Column,
      extraCondition: Column, minAreaRatio: Double): DataFrame = {
    val b = broadcast(boxes.select(col("doc_id").as("b_doc"),
      col("page_number").as("b_page"), col("x").as("bx"), col("y").as("by"),
      col("width").as("bw"), col("height").as("bh")))
    val ix = greatest(lit(0.0),
      least(itemX + itemW, col("bx") + col("bw")) - greatest(itemX, col("bx")))
    val iy = greatest(lit(0.0),
      least(itemY + itemH, col("by") + col("bh")) - greatest(itemY, col("by")))
    df.join(b,
      col("doc_id") === col("b_doc") && col("page_number") === col("b_page") &&
        extraCondition && itemW * itemH > 0 &&
        ix * iy >= lit(minAreaRatio) * itemW * itemH,
      "left_anti")
  }

  /** Tokens mostly inside any box leave the token table
    * (`_remove_tokens_within_bounding_box_flatmap_fn`; tokens without
    * coordinates always stay). The reference's follow-up
    * `remove_empty_blocks` is structural-only here: block grouping is
    * positional, so emptied blocks simply stop existing. */
  def removeTokensWithinBoxes(tokens: DataFrame, boxes: DataFrame,
      minAreaRatio: Double = 0.5): DataFrame =
    removeWithinBoxes(tokens, boxes,
      col("coords.x"), col("coords.y"),
      col("coords.width"), col("coords.height"),
      col("coords").isNotNull, minAreaRatio)

  /** Embedded graphics mostly inside any box leave the graphics table
    * (`is_layout_graphic_within_bounding_box`). */
  def removeGraphicsWithinBoxes(graphics: DataFrame, boxes: DataFrame,
      minAreaRatio: Double = 0.5): DataFrame =
    removeWithinBoxes(graphics, boxes,
      col("x"), col("y"), col("width"), col("height"),
      lit(true), minAreaRatio)

  /** The CV-graphics document rewrite
    * (`get_layout_document_with_text_and_graphics_replaced_by_graphics`
    * / `..._graphics_replaced_by_graphics`,
    * processors/graphic_provider.py:238-310, wired at
    * fulltext/processor.py:310-335), reconcile-first as the CV
    * provider does (`cv_graphic_provider.py:147-157`): a CV box whose
    * embedded graphic overlaps ≥ `reconcileThreshold` yields THAT
    * graphic — id, type and asset linkage survive — and only
    * unmatched boxes become new `cv_id` graphics (the reference
    * attaches a cropped page image there; box + detector category is
    * this engine's declared equivalent until a real CV backend
    * renders crops). Embedded graphics inside any resulting semantic
    * box are replaced, and with `replaceText` on (config
    * `replace_text_by_cv_graphic`) overlapping tokens leave the token
    * table.
    *
    * Derive F4 related lines ([[GraphicMatching.relatedLines]]) from
    * the PRE-rewrite token table: the reference attaches the related
    * block BEFORE removing caption tokens. Boxes are assumed
    * overlap-suppressed ([[detectBoxesScored]], the shipped config) —
    * the reference's sequential rewrite lets a later box swallow an
    * earlier box's graphic, which cannot occur on suppressed output.
    *
    * @param tokens    ALTO token table (coords struct)
    * @param graphics  [[graft.pipeline.Processor.graphicsForMatching]] shape
    * @param cvBoxes   [[detectBoxes]] output
    * @param pages     (doc_id, page_number, width, height) — page dims
    *                  for the new graphics rows (token-derived dims
    *                  would silently drop boxes on token-less pages,
    *                  exactly the scanned pages CV targets)
    * @return (rewritten tokens, rewritten graphics)
    */
  def replaceByCvGraphics(tokens: DataFrame, graphics: DataFrame,
      cvBoxes: DataFrame, pages: DataFrame, replaceText: Boolean = true,
      minAreaRatio: Double = 0.5,
      reconcileThreshold: Double = 0.80): (DataFrame, DataFrame) = {
    // the reconcile aggregate (and, through it, the detector output)
    // feeds several branches of BOTH returned frames — persist the
    // tiny per-doc result so materializing them does not re-run the
    // render+detect stage per consumer
    val rec = reconcileCvBoxes(cvBoxes, graphics, reconcileThreshold)
      .select(col("doc_id"), col("cv_id"), col("graphic_id"))
      .transform(graft.CacheRegistry.persist(_))
    val newBoxes = cvBoxes.join(rec.select(col("doc_id"), col("cv_id")),
        Seq("doc_id", "cv_id"), "left_anti")
      .transform(graft.CacheRegistry.persist(_))
    val newBoxGeom = newBoxes.select(col("doc_id"), col("page_number"),
      col("x"), col("y"), col("width"), col("height"))
    // a reconciled graphic survives under its own id — unless it is
    // also mostly inside an UNMATCHED new box, which the reference's
    // sequential rewrite (processing the bigger box after) replaces
    val keptEmbedded = removeGraphicsWithinBoxes(
      graphics.join(rec.select(col("doc_id"), col("graphic_id")),
        Seq("doc_id", "graphic_id"), "left_semi"),
      newBoxGeom, minAreaRatio)
    // removal is driven by the SEMANTIC graphic boxes: unmatched CV
    // detections at their detected box, reconciled ones at the
    // embedded graphic's own coordinates (the reference removes
    // within the yielded layout graphic's bbox and re-appends it —
    // so a reconciled graphic needs no extra exclusion from the
    // survivors: its own box removes it at ratio 1.0)
    val semanticBoxes = newBoxGeom
      .unionByName(keptEmbedded.select(col("doc_id"), col("page_number"),
        col("x"), col("y"), col("width"), col("height")))
    val survivors = removeGraphicsWithinBoxes(graphics, semanticBoxes,
      minAreaRatio)
    val added = newBoxes.join(
        broadcast(pages.select(col("doc_id"), col("page_number"),
          col("width").as("page_width"), col("height").as("page_height"))),
        Seq("doc_id", "page_number"), "left")
      .select(col("doc_id"), col("cv_id").as("graphic_id"),
        col("category").as("graphic_type"),
        col("x"), col("y"), col("width"), col("height"),
        col("page_number"), col("page_width"), col("page_height"))
    val newTokens =
      if (replaceText) removeTokensWithinBoxes(tokens, semanticBoxes, minAreaRatio)
      else tokens
    (newTokens, survivors.unionByName(keptEmbedded).unionByName(added))
  }

  /** F5/H3, outer form: one output row per CV box, `graphic_id` /
    * `area_ratio` null when no embedded graphic overlaps above the
    * threshold (in the reference those unmatched boxes fall through to
    * page-image cropping). Keeping unmatched boxes lets a consumer
    * derive both the per-doc detection count and the matched count from
    * ONE pass over the detector output — no re-evaluation of the
    * (expensive) upstream render+detect stage and no persist needed.
    */
  def reconcileCvBoxesOuter(cvBoxes: DataFrame, graphics: DataFrame,
      threshold: Double = 0.80,
      ignoredGraphicTypes: Seq[String] = Seq("svg")): DataFrame = {
    val g = graphics.filter(!col("graphic_type").isin(ignoredGraphicTypes: _*))
      .select(col("doc_id"), col("page_number"), col("graphic_id"),
        col("x").as("gx"), col("y").as("gy"),
        col("width").as("gw"), col("height").as("gh"))
    val ix = greatest(lit(0.0),
      least(col("x") + col("width"), col("gx") + col("gw")) - greatest(col("x"), col("gx")))
    val iy = greatest(lit(0.0),
      least(col("y") + col("height"), col("gy") + col("gh")) - greatest(col("y"), col("gy")))
    val maxArea = greatest(col("width") * col("height"), col("gw") * col("gh"))
    val ratio = when(maxArea > 0, ix * iy / maxArea).otherwise(lit(0.0))
    val w = Window.partitionBy("doc_id", "cv_id")
      .orderBy(col("area_ratio").desc_nulls_last, col("graphic_id").asc_nulls_last)
    cvBoxes.join(g, Seq("doc_id", "page_number"), "left")
      .withColumn("area_ratio",
        when(col("gx").isNotNull && ratio >= threshold, ratio))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("page_number"), col("cv_id"),
        when(col("area_ratio").isNotNull, col("graphic_id")).as("graphic_id"),
        col("area_ratio"))
  }
}
