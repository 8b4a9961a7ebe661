package graft

import org.apache.spark.sql.functions._

import graft.pipeline.RefMatching

/** F1 content-id matching: the reference's own unit cases
  * (`tests/processors/ref_matching_test.py`) ported against the join
  * formulation — normalized keys, token-prefix keys, the simple
  * (exact/prefix) matcher, the partial vote matcher with tie
  * rejection, and the chain's stage precedence.
  */
class RefMatchingSpec extends SparkSuite {
  import spark.implicits._

  private def key(s: String): String =
    Seq(s).toDF("t").select(RefMatching.normalizedKey(col("t")))
      .head.getString(0)

  private def prefixKey(s: String, n: Int = 1): String =
    Seq(s).toDF("t").select(RefMatching.tokenPrefixKey(col("t"), n))
      .head.getString(0)

  test("get_normalized_key_text cases") {
    // ref_matching_test.py TestGetNormalizedKeyText
    assert(key("TeXt") == "text")          // lower case
    assert(key("text.,;:") == "text")      // punctuation removed
    assert(key("text\n\r\t ") == "text")   // whitespace removed
    assert(key("text 123") == "text123")   // digits kept
  }

  test("get_token_prefix_normalized_key_text cases") {
    // ref_matching_test.py TestGetTokenPrefixNormalizedKeyText
    assert(prefixKey("figure 1") == "f1")            // initial letters
    assert(prefixKey("figure 1", 3) == "fig1")       // prefix length
    assert(prefixKey("figure 123") == "f123")        // digits kept whole
    assert(prefixKey("figure x123a") == "fx123a")    // digit tokens unshortened
  }

  private def matched(citText: String,
      candidates: Seq[(String, String)]): Option[String] = {
    val cit = Seq((1L, 10L, citText)).toDF("doc_id", "item_id", "text")
    val cand = candidates.map { case (id, t) => (1L, id, t) }
      .toDF("doc_id", "content_id", "label_text")
    RefMatching.matchContentIds(cit, cand)
      .collect().headOption.map(_.getString(2))
  }

  test("SimpleContentIdMatcher cases: exact, case, punctuation, whitespace") {
    val other = "id2" -> "Other 1"
    assert(matched("Text 1", Seq("id1" -> "Text 1", other)) == Some("id1"))
    assert(matched("tExt 1", Seq("id1" -> "TeXt 1", other)) == Some("id1"))
    assert(matched("Text 1:", Seq("id1" -> "Text 1.", other)) == Some("id1"))
    assert(matched("\nText 1\n", Seq("id1" -> " Text\n1 ", other)) == Some("id1"))
  }

  test("SimpleContentIdMatcher: prefix-and-number matching") {
    // 'Fig 1' finds 'Figure 1' through the shared token-prefix key
    assert(matched("Fig 1", Seq("id1" -> "Figure 1", "id2" -> "Other 1"))
      == Some("id1"))
    // prefix keys respect the configured length: at 4 the keys diverge
    assert(prefixKey("Fig 1", 4) == "fig1")
    assert(prefixKey("Figure 1", 4) == "figu1")
    assert(prefixKey("Fig 1", 3) == prefixKey("Figure 1", 3))
  }

  test("PartialContentIdMatcher cases: votes, partial, tie and no-overlap rejection") {
    // exact single-token corpus
    assert(matched("1", Seq("id1" -> "1", "id2" -> "2")) == Some("id1"))
    // partial: 'Smith 1999' votes 2 for id1, 1 for id2
    assert(matched("Smith 1999",
      Seq("id1" -> "The title, Smith, 1999", "id2" -> "Other title, 1999"))
      == Some("id1"))
    // equal votes on both sides → tie is rejected, no match
    assert(matched("Smith 1999",
      Seq("id1" -> "The title, Smith, 1999", "id2" -> "Other title, Smith, 1999"))
      == None)
    // shared initial characters are not a token match
    assert(matched("Smith",
      Seq("id1" -> "The title, Smooth", "id2" -> "Other title, X")) == None)
  }

  test("chain precedence: exact beats prefix beats partial; no stage → no row") {
    // citation text whose exact key hits A while its prefix key hits B
    // (B's label shares the prefix key 't1' but not the exact key)
    val got = matched("Title 1",
      Seq("idA" -> "Title 1", "idB" -> "T 1"))
    assert(got == Some("idA"))
    // exact misses, prefix key carries it
    assert(matched("Fig 2", Seq("idA" -> "Figure 2", "idB" -> "Other 9"))
      == Some("idA"))
    // nothing shared at all → the citation row is absent, not null
    assert(matched("zzz", Seq("idA" -> "Other 1", "idB" -> "Other 2")) == None)
  }
}
