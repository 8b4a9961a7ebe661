package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Processor.{CandidateRow, GraphicIn}

/** The pipeline's in-fold F3 matcher ([[Processor.matchGraphicsLocal]]):
  * type exclusions the distributed form's schema cannot carry. */
class GraphicsLocalSpec extends AnyFunSuite {

  test("svg graphics never enter the bbox matcher " +
      "(graphic_matching.py:461-466 ignored_graphic_types)") {
    def gin(id: String, tpe: String) = GraphicIn(0L, id, tpe,
      20, 150, 60, 20, 1, 100, 200)
    val cand = CandidateRow(0L, "fig_0", 20, 120, 60, 20, 1, 100, 200)
    // the svg sits exactly on the candidate; the png is further away
    val ms = Processor.matchGraphicsLocal(
      Seq(gin("whole-page.svg", "svg"), gin("img.png", "png")),
      Seq(cand))
    assert(ms == Seq("img.png" -> "fig_0"))
  }
}
