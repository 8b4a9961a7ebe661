package graft

import org.apache.spark.sql.functions._

/** Empty-document robustness: a 100 TB crawl routinely contains empty
  * documents, and Spark 4's default ANSI mode turns a ratio over their
  * 0-char/0-token denominators into a job-aborting DIVIDE_BY_ZERO.
  * Every per-document text operator must survive the empty doc —
  * scoring it null / zero, never killing the pass. */
class EmptyDocSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again", "s0"),
    (1L, "", "s1"),
    (2L, "another perfectly normal document with plenty of words inside", "s0")
  ).toDF("doc_id", "text", "source")

  test("per-document text operators survive a corpus containing an " +
      "empty document under ANSI") {
    import graft.operators.TextAnalysis
    // every call must complete; the empty doc must appear in per-doc
    // outputs (it is data, not an error)
    assert(TextAnalysis.langId(docs).count() == 3)
    assert(TextAnalysis.repetitionFeatures(docs).count() == 3)
    assert(TextAnalysis.repetitionProfile(docs).count() == 3)
    assert(TextAnalysis.spanContamination(docs).count() >= 2)
    assert(TextAnalysis.dsirSelect(docs,
      targetPred = col("source") === "s0", topN = 3).count() >= 2)
    assert(TextAnalysis.tokenBudgetShards(docs).count() == 3)
    assert(TextAnalysis.keywordScores(docs).count() >= 1)
    assert(TextAnalysis.bm25Rank(docs, Seq("quick")).count() == 3)
    assert(TextAnalysis.unigramSurprisal(docs).count() == 3)
    assert(TextAnalysis.bigramSurprisal(docs).count() == 3)
  }

  test("qualityFeatures scores the empty document with null ratios " +
      "instead of aborting the job") {
    import graft.operators.TextAnalysis
    val got = TextAnalysis.qualityFeatures(docs).orderBy("doc_id").collect()
    assert(got.length == 3)
    val empty = got(1)
    assert(empty.getAs[Long]("n_tokens") == 0L)
    assert(empty.isNullAt(empty.fieldIndex("punct_ratio")))
    assert(empty.isNullAt(empty.fieldIndex("stopword_ratio")))
    // non-empty docs score real ratios
    assert(!got(0).isNullAt(got(0).fieldIndex("stopword_ratio")))
  }

  test("curationDecisions classifies the empty document (too_short) " +
      "instead of aborting on its zero token count") {
    import graft.operators.TextAnalysis
    val withLen = docs.withColumn("n_chars", length(col("text")))
    val got = TextAnalysis.curationDecisions(withLen)
      .orderBy("doc_id").collect()
    assert(got.length == 3)
    assert(got(1).getAs[String]("reason") != null)
    assert(!got(1).getAs[Boolean]("keep"))
  }
}
