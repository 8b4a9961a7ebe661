package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Graphic ↔ figure bounding-box matching (SURVEY.md F3; reference
  * `processors/graphic_matching.py:97-494`).
  *
  * Scale shape: the O(graphics × candidates) distance computation is a
  * spatial theta-join pruned by (same doc, |page diff| ≤ 1, distance ≤
  * maxDistance) — executed as a Spark join so the corpus fans out by
  * document; the greedy multi-round 1–1 assignment (matched candidates
  * absorb the graphic's box and re-match) operates on the few surviving
  * pairs per document, as a per-doc fold (the reference runs the same
  * loop in-process per request).
  */
object GraphicMatching {

  /** Default acceptance threshold (config.yml `max_graphic_distance`). */
  val DefaultMaxDistance = 0.3

  final case class Box(x: Double, y: Double, width: Double, height: Double,
      pageNumber: Int)

  /** Page-normalized box (graphic_matching.py:215-227): coordinates
    * scaled to page size, y offset by page number so cross-page
    * distances are comparable. */
  def normalized(b: Box, pageWidth: Double, pageHeight: Double): Box =
    Box(
      x = b.x / pageWidth,
      y = b.y / pageHeight + b.pageNumber,
      width = b.width / pageWidth,
      height = b.height / pageHeight,
      pageNumber = b.pageNumber)

  /** Rectangle gap distance (graphic_matching.py:112-135): Euclidean
    * norm of the axis gaps (0 when overlapping on an axis). */
  def distance(a: Box, b: Box): Double = {
    val dx = math.max(0, math.max(b.x - (a.x + a.width), a.x - (b.x + b.width)))
    val dy = math.max(0, math.max(b.y - (a.y + a.height), a.y - (b.y + b.height)))
    math.sqrt(dx * dx + dy * dy)
  }

  private def minDistance(as: Seq[Box], bs: Seq[Box]): Double =
    (for (a <- as; b <- bs) yield distance(a, b)).min

  /** Greedy multi-round 1–1 assignment
    * (graphic_matching.py:371-459): each round, every unmatched graphic
    * proposes its closest candidate; per candidate only the best
    * proposal wins; winners absorb the graphic's boxes (so subsequent
    * rounds measure against the union) and matched graphics leave the
    * pool. Rounds repeat until no graphic matches.
    */
  def greedyAssign(
      graphics: Seq[(String, Seq[Box])],
      candidates: Seq[(String, Seq[Box])],
      maxDistance: Double = DefaultMaxDistance): Seq[(String, String)] = {
    var remainingGraphics = graphics
    var cands = candidates
    val matches = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var done = false
    while (!done && remainingGraphics.nonEmpty) {
      // per graphic: closest candidate, if acceptable
      val proposals = remainingGraphics.flatMap { case (gid, gBoxes) =>
        val scored = cands.map { case (cid, cBoxes) =>
          (cid, cBoxes, minDistance(gBoxes, cBoxes))
        }
        if (scored.isEmpty) None
        else {
          val best = scored.minBy(_._3)
          if (best._3 <= maxDistance) Some((gid, gBoxes, best._1, best._3)) else None
        }
      }
      // per candidate: best proposal wins
      val winners = proposals.groupBy(_._3).map { case (_, ps) => ps.minBy(_._4) }.toSeq
      if (winners.isEmpty) done = true
      else {
        matches ++= winners.map(w => (w._1, w._3))
        val matchedG = winners.map(_._1).toSet
        // winners absorb the graphic's boxes for subsequent rounds
        val absorbed = winners.map(w => w._3 -> w._2).toMap
        cands = cands.map { case (cid, boxes) =>
          (cid, boxes ++ absorbed.getOrElse(cid, Nil))
        }
        remainingGraphics = remainingGraphics.filterNot(g => matchedG(g._1))
      }
    }
    matches.sortBy(identity).toList
  }

  /** Distributed stage: graphics × candidates pruned by the spatial
    * theta-join, then the per-doc greedy fold on survivors.
    *
    * @param graphics  (doc_id, graphic_id, x, y, width, height, page_number,
    *                  page_width, page_height)
    * @param candidates same schema with candidate_id
    * @return (doc_id, graphic_id, candidate_id)
    */
  def matchGraphics(graphics: DataFrame, candidates: DataFrame,
      maxDistance: Double = DefaultMaxDistance): DataFrame = {
    val sparkSession = graphics.sparkSession
    import sparkSession.implicits._

    def norm(df: DataFrame, idCol: String): DataFrame =
      df.select(col("doc_id"), col(idCol).as("id"),
        (col("x") / col("page_width")).as("nx"),
        (col("y") / col("page_height") + col("page_number")).as("ny"),
        (col("width") / col("page_width")).as("nw"),
        (col("height") / col("page_height")).as("nh"),
        col("page_number"))

    val g = norm(graphics, "graphic_id")
    val c = norm(candidates, "candidate_id")
    // spatial theta-join: same doc, adjacent pages, gap distance bound.
    // The equi part (doc_id) hash-partitions; the rest is a post-filter.
    val dx = greatest(lit(0.0), col("c.nx") - (col("g.nx") + col("g.nw")),
      col("g.nx") - (col("c.nx") + col("c.nw")))
    val dy = greatest(lit(0.0), col("c.ny") - (col("g.ny") + col("g.nh")),
      col("g.ny") - (col("c.ny") + col("c.nh")))
    val pairs = g.as("g").join(c.as("c"),
        col("g.doc_id") === col("c.doc_id") &&
          abs(col("g.page_number") - col("c.page_number")) <= 1 &&
          sqrt(dx * dx + dy * dy) <= maxDistance)
      .select(col("g.doc_id").as("doc_id"),
        col("g.id").as("graphic_id"),
        struct(col("g.nx").as("x"), col("g.ny").as("y"), col("g.nw").as("width"),
          col("g.nh").as("height"), col("g.page_number").as("pageNumber")).as("gbox"),
        col("c.id").as("candidate_id"),
        struct(col("c.nx").as("x"), col("c.ny").as("y"), col("c.nw").as("width"),
          col("c.nh").as("height"), col("c.page_number").as("pageNumber")).as("cbox"))

    pairs.as[(Long, String, Box, String, Box)]
      .groupByKey(_._1)
      .flatMapGroups { (docId, it) =>
        val rows = it.toSeq
        val gs = rows.groupBy(_._2).map { case (gid, rs) =>
          (gid, rs.map(_._3).distinct)
        }.toSeq.sortBy(_._1)
        val cs = rows.groupBy(_._4).map { case (cid, rs) =>
          (cid, rs.map(_._5).distinct)
        }.toSeq.sortBy(_._1)
        greedyAssign(gs, cs, maxDistance).iterator
          .map { case (gid, cid) => (docId, gid, cid) }
      }
      .toDF("doc_id", "graphic_id", "candidate_id")
  }
}
