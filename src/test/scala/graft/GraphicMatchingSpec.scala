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
}
