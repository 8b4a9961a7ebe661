package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The SQL surface: GraftExtensions registers every native kernel as a
  * SQL function (production use: `spark.sql.extensions=graft.GraftExtensions`;
  * here the extension's public `registerFunctions` applies the same
  * injection to the shared test session's registry).
  */
class GraftExtensionsSpec extends SparkSuite {

  private lazy val registered: Unit = {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.graftbridge.ExtensionsBridge.registerFunctions(
      ext, spark.sessionState.functionRegistry)
  }

  test("scalar kernels callable from SQL") {
    registered
    val r = spark.sql(
      """SELECT word_shape('Hello-42') AS ws,
                normalized_key('Hello, World! 42') AS nk,
                vocab_key('b a b') AS vk,
                text_stats('a bb')[0] AS n_chars,
                round(dot_product(array(1.0F, 2.0F), array(3.0F, 4.0F)), 4) AS dp
      """).collect().head
    assert(r.getString(0) == WordShapeGolden.of("Hello-42"))
    assert(r.getString(1) == "helloworld42")
    assert(r.getString(2) == "a b")
    assert(r.getLong(3) == 4L)
    assert(r.getDouble(4) == 11.0)
  }

  test("array sketch kernels callable from SQL with literal params") {
    registered
    val r = spark.sql(
      """SELECT ngrams(array('a','b','c'), 2) AS g,
                ngrams_all(array('a','b','a','b'), 2) AS ga,
                size(min_hash(array(1L, 2L, 3L), 8)) AS mh,
                sim_hash(array(5L)) AS sh,
                size(winnow(array(1L, 9L, 3L, 7L, 2L), 2)) AS wn
      """).collect().head
    assert(r.getSeq[String](0) == Seq("a b", "b c"))
    assert(r.getSeq[String](1) == Seq("a b", "b a", "a b"))
    assert(r.getInt(2) == 8)
    // single-element simhash: every set bit wins its majority vote
    assert(r.getLong(3) == 5L)
    assert(r.getInt(4) >= 1)
  }

  test("token_tf callable from SQL") {
    registered
    val r = spark.sql(
      "SELECT token_tf(array('b','a','b')) AS tf").collect().head
    val pairs = r.getSeq[org.apache.spark.sql.Row](0)
      .map(p => (p.getString(0), p.getLong(1)))
    assert(pairs == Seq(("b", 2L), ("a", 1L))) // first-seen order
  }

  test("pii_scan callable from SQL") {
    registered
    val r = spark.sql(
      """SELECT pii_scan('mail a@b.co or +12 345 678 90 now') AS p""")
      .select("p.n_emails", "p.n_phones", "p.redacted").collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L)
    assert(r.getString(2) == "mail [EMAIL] or [PHONE] now")
    // null propagates (UnaryExpression null-safety), no NPE
    val n = spark.sql("SELECT pii_scan(CAST(NULL AS STRING)) AS p").collect().head
    assert(n.isNullAt(0))
  }

  test("non-literal size argument fails loudly") {
    registered
    val ex = intercept[Exception] {
      spark.sql("SELECT min_hash(array(1L), CAST(rand()*4 AS INT))").collect()
    }
    assert(ex.getMessage.contains("literal") || ex.getCause != null)
  }

  test("gram position kernels callable from SQL") {
    registered
    val r = spark.sql(
      """SELECT size(gram_hash_positions(array('a','b','c'), 2)) AS n,
                remove_covered(array('a','b','c','d'), array(1), 2) AS kept
      """).collect().head
    assert(r.getInt(0) == 2) // starts 0 and 1
    assert(r.getSeq[String](1) == Seq("a", "d")) // positions 1-2 covered
  }

  test("collect_min_k_by pair aggregate callable from SQL") {
    registered
    val r = spark.sql(
      """SELECT g, collect_min_k_by(s, id, 2) AS tk
         FROM VALUES (0, 0.5D, 10L), (0, 0.1D, 20L), (0, 0.1D, 5L),
                     (0, 0.9D, 1L), (1, 2.0D, 7L)
           AS t(g, s, id)
         GROUP BY g ORDER BY g
      """).collect()
    val g0 = r(0).getSeq[org.apache.spark.sql.Row](1)
    // (0.1, 5) then (0.1, 20): score asc, id tiebreak asc
    assert(g0.map(x => (x.getDouble(0), x.getLong(1))) ==
      Seq((0.1, 5L), (0.1, 20L)))
    assert(r(1).getSeq[org.apache.spark.sql.Row](1)
      .map(x => (x.getDouble(0), x.getLong(1))) == Seq((2.0, 7L)))
    // int/float children cast at analysis time like collect_min_k
    val ri = spark.sql(
      """SELECT collect_min_k_by(s, id, 1) AS tk
         FROM VALUES (3, 5), (1, 9) AS t(s, id)
      """).collect()
    assert(ri(0).getSeq[org.apache.spark.sql.Row](0)
      .map(x => (x.getDouble(0), x.getLong(1))) == Seq((1.0, 9L)))
  }

  test("curation kernels callable from SQL") {
    registered
    val r = spark.sql(
      """SELECT multi_match('the vector join path', 'vector join', 'nope') AS m,
                deflate_ratio('aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa') AS lo,
                deflate_ratio('') AS empty
      """).collect().head
    assert(r.getSeq[Int](0) == Seq(0))
    assert(r.getDouble(1) < 0.5 && r.getDouble(2) == 1.0)
  }

  test("collect_min_k_by_str string-payload aggregate callable from SQL") {
    registered
    // heavy-hitters shape: score = -count, payload = the token; equal
    // scores break ties by payload bytes ascending
    val out = spark.sql(
      """SELECT collect_min_k_by_str(CAST(-c AS DOUBLE), t, 2) AS top
         FROM (SELECT t, COUNT(*) AS c
               FROM VALUES ('a'),('b'),('b'),('c'),('b'),('c') AS v(t)
               GROUP BY t)
      """).selectExpr("transform(top, p -> p.value) AS vs")
      .head().getSeq[String](0)
    assert(out == Seq("b", "c"))
    // int score child casts at analysis time like the long-id variant
    val ri = spark.sql(
      """SELECT collect_min_k_by_str(s, t, 1) AS top
         FROM VALUES (3, 'x'), (1, 'y') AS v(s, t)
      """).selectExpr("top[0].value").head().getString(0)
    assert(ri == "y")
  }

  test("collect_min_k aggregate callable from SQL") {
    registered
    val r = spark.sql(
      """SELECT g, collect_min_k(v, 2) AS mins
         FROM VALUES (0, 5L), (0, 1L), (0, 3L), (0, 1L), (1, 9L)
           AS t(g, v)
         GROUP BY g ORDER BY g
      """).collect()
    assert(r(0).getSeq[Long](1) == Seq(1L, 3L)) // distinct smallest 2
    assert(r(1).getSeq[Long](1) == Seq(9L))
    // int children are implicitly cast at analysis time (previously a
    // runtime ClassCastException inside the aggregate buffer)
    val ri = spark.sql(
      """SELECT collect_min_k(v, 2) AS mins
         FROM VALUES (5), (1), (3) AS t(v)
      """).collect()
    assert(ri(0).getSeq[Long](0) == Seq(1L, 3L))
  }
}

/** Reference golden for the SQL test without duplicating the shape
  * algorithm: call the same expression through the Scala surface.
  */
private object WordShapeGolden {
  def of(s: String): String = {
    val spark = SparkSuite.session
    import spark.implicits._
    Seq(s).toDF("t")
      .select(graft.functions.WordShape.word_shape(org.apache.spark.sql.functions.col("t")))
      .collect().head.getString(0)
  }
}
