package graft

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import org.apache.spark.sql.functions._

import graft.sinks.Assets

/** A8 asset ZIP sink: per-document zip of the XML + graphic assets
  * (reference app/parser.py:102-127), verified by reading the zip back.
  */
class AssetsSpec extends SparkSuite {
  import spark.implicits._

  private def entriesOf(zip: Array[Byte]): Seq[(String, String)] = {
    val in = new ZipInputStream(new ByteArrayInputStream(zip))
    val out = Seq.newBuilder[(String, String)]
    var e = in.getNextEntry
    while (e != null) {
      out += ((e.getName, new String(in.readAllBytes(), "UTF-8")))
      e = in.getNextEntry
    }
    in.close()
    out.result()
  }

  test("zipAssets: xml + graphics round-trip through the zip") {
    val docs = Seq(
      (0L, "<TEI>a</TEI>", Seq(Assets.AssetFile("figures/fig0.png", Array[Byte](1, 2, 3)))),
      (1L, "<TEI>b</TEI>", Seq.empty[Assets.AssetFile]))
      .toDF("doc_id", "tei", "assets")
    val zipped = Assets.zipAssets(docs).collect()
      .map(r => r.getLong(0) -> (r.getAs[Array[Byte]](1), r.getLong(2))).toMap
    assert(zipped(0L)._2 == 2L && zipped(1L)._2 == 1L)
    val e0 = entriesOf(zipped(0L)._1)
    assert(e0.map(_._1) == Seq("tei.xml", "figures/fig0.png"))
    assert(e0.head._2 == "<TEI>a</TEI>")
    assert(entriesOf(zipped(1L)._1).map(_._1) == Seq("tei.xml"))
  }

  test("zipAssets: deterministic bytes across runs") {
    val docs = Seq((0L, "<TEI/>",
      Seq(Assets.AssetFile("g.png", "img".getBytes))))
      .toDF("doc_id", "tei", "assets")
    val a = Assets.zipAssets(docs).select("zip").collect().head.getAs[Array[Byte]](0)
    val b = Assets.zipAssets(docs).select("zip").collect().head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b))
  }

  test("p09/p10 pipeline queries return stable non-empty results at sf0.001") {
    // other operators (TextAnalysis.tokenPairs, bm25) keep deliberate
    // session-lifetime caches; clear them so the leak assertion below
    // measures p09's OWN behavior, not the shared test session's state
    spark.catalog.clearCache()
    val p09 = SparkEntry.queries("p09_page_pruning")(spark, sf("0.001"))
    val rows = p09.collect()
    assert(rows.nonEmpty)
    // candidate docs: doc_id % 3 == 0 minus mostly-bitmap doc_id % 6 == 0
    val ids = rows.map(_.getLong(0))
    assert(ids.forall(id => id % 3 == 0 && id % 6 != 0))
    // the render stage must not leave persisted data behind (the r2
    // formulation leaked a cached dataset per invocation)
    assert(spark.sharedState.cacheManager.isEmpty,
      "p09 left cached data behind")
    val p10 = SparkEntry.queries("p10_asset_zip")(spark, sf("0.001"))
    val first = p10.collect().head
    assert(first.getLong(1) == 2 && first.getLong(2) > 0)
  }

  test("p11 CRF query labels the synthesized title block") {
    val rows = SparkEntry.queries("p11_crf_header")(spark, sf("0.001")).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) == 1)) // exactly one title span per doc
  }
}
