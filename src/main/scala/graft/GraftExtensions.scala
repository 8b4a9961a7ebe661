package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/** Library entry point for
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`):
  * registers every graft native kernel as a SQL function, so the full
  * scalar surface works from `spark.sql(...)`, Spark Connect and
  * JDBC/Thrift clients without the Scala DSL — the same codegen'd
  * Catalyst expressions the DataFrame API uses, no UDF layer.
  *
  * {{{
  * SELECT word_shape(token),                  -- C7 (models/data.py:370-382)
  *        text_stats(text),                   -- fused q39-q42 stat vector
  *        vocab_key(text),                    -- q41 vocabulary fingerprint
  *        normalized_key(text),               -- F1/q32 match key
  *        dot_product(va, vb),                -- vector inner product
  *        ngrams(tokens, 2),                  -- shingling
  *        min_hash(hashes, 64),               -- MinHash signature
  *        sim_hash(hashes),                   -- 64-bit SimHash
  *        winnow(hashes, 4)                   -- winnowing fingerprints
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

    def intArg(e: Expression, fn: String): Int = e match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$fn expects a literal integer argument, got: $other")
    }

    def unary(name: String, usage: String, build: Expression => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), {
        args: Seq[Expression] =>
          require(args.size == 1, s"$name expects 1 argument, got ${args.size}")
          build(args.head)
      }))

    def binaryIntRight(name: String, usage: String,
        build: (Expression, Int) => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), {
        args: Seq[Expression] =>
          require(args.size == 2, s"$name expects 2 arguments, got ${args.size}")
          build(args.head, intArg(args(1), name))
      }))

    unary("word_shape",
      "word_shape(str) - GROBID word-shape feature (Xx, d, punct classes)",
      WordShapeExpr)
    unary("text_stats",
      "text_stats(str) - fused per-document stat vector (chars, tokens, punct, stopwords, ...)",
      e => TextStatsExpr(e))
    unary("vocab_key",
      "vocab_key(str) - sorted-distinct-token vocabulary fingerprint key",
      VocabKeyExpr)
    unary("normalized_key",
      "normalized_key(str) - lowercase [a-z0-9]-only match key",
      NormalizedKeyExpr)
    unary("sim_hash",
      "sim_hash(array<long>) - 64-bit SimHash over feature hashes",
      SimHashExpr)
    unary("token_tf",
      "token_tf(array<string>) - per-row term frequencies as array<struct<tok,tf>>",
      TokenTfExpr)
    unary("pii_scan",
      "pii_scan(str) - struct<n_emails,n_phones,redacted>: email/phone counts + [EMAIL]/[PHONE] redaction",
      PiiScanExpr)
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(array<float>, array<float>) - inner product"), {
        args: Seq[Expression] =>
          require(args.size == 2, s"dot_product expects 2 arguments, got ${args.size}")
          DotProductExpr(args.head, args(1))
      }))
    binaryIntRight("ngrams",
      "ngrams(array<string>, n) - distinct token n-grams joined by a single space",
      (c, n) => NgramsExpr(c, n))
    binaryIntRight("ngrams_all",
      "ngrams_all(array<string>, n) - one n-gram per start position (no dedup)",
      (c, n) => NgramsExpr(c, n, distinct = false))
    binaryIntRight("min_hash",
      "min_hash(array<long>, k) - k-permutation MinHash signature",
      MinHashExpr)
    binaryIntRight("winnow",
      "winnow(array<long>, w) - winnowing fingerprint selection, window w",
      WinnowExpr)
    binaryIntRight("gram_hash_positions",
      "gram_hash_positions(array<string>, n) - per-start 64-bit n-gram hashes",
      GramHashPositionsExpr)
    binaryIntRight("collect_min_k",
      "collect_min_k(bigint, k) - aggregate: the k smallest distinct values, " +
        "sorted ascending (bounded buffers, no per-group sort)",
      (c, k) => CollectMinK(c, k).toAggregateExpression())
    ext.injectFunction((FunctionIdentifier("collect_min_k_by"),
      info("collect_min_k_by",
        "collect_min_k_by(score double, id bigint, k) - aggregate: the k " +
          "smallest (score, id) pairs as array<struct<score,id>> ascending " +
          "(the bounded top-k-by-score form; no window sort)"), {
        args: Seq[Expression] =>
          require(args.size == 3,
            s"collect_min_k_by expects 3 arguments, got ${args.size}")
          CollectMinKByScore(args.head, args(1),
            intArg(args(2), "collect_min_k_by")).toAggregateExpression()
      }))
    ext.injectFunction((FunctionIdentifier("collect_min_k_by_str"),
      info("collect_min_k_by_str",
        "collect_min_k_by_str(score double, value string, k) - aggregate: " +
          "the k smallest (score, value) pairs as array<struct<score,value>> " +
          "ascending (bounded top-k with a string payload; no window sort)"), {
        args: Seq[Expression] =>
          require(args.size == 3,
            s"collect_min_k_by_str expects 3 arguments, got ${args.size}")
          CollectMinKByScoreStr(args.head, args(1),
            intArg(args(2), "collect_min_k_by_str")).toAggregateExpression()
      }))
    unary("deflate_ratio",
      "deflate_ratio(str) - DEFLATE compressed/raw byte ratio (redundancy signal)",
      DeflateRatioExpr)
    ext.injectFunction((FunctionIdentifier("multi_match"),
      info("multi_match",
        "multi_match(text, 'p1', 'p2', ...) - distinct indexes of the literal " +
          "patterns found in text (one Aho-Corasick pass), ascending"), {
        args: Seq[Expression] =>
          require(args.size >= 2,
            s"multi_match expects text + at least 1 pattern, got ${args.size}")
          val pats = args.tail.map {
            case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
            case other => throw new IllegalArgumentException(
              s"multi_match patterns must be literal strings, got: $other")
          }
          MultiMatchExpr(args.head, new AhoCorasick(pats))
      }))
    ext.injectFunction((FunctionIdentifier("remove_covered"),
      info("remove_covered",
        "remove_covered(array<string>, array<int>, n) - drop tokens covered " +
          "by n-token spans at the sorted start positions"), {
        args: Seq[Expression] =>
          require(args.size == 3, s"remove_covered expects 3 arguments, got ${args.size}")
          RemoveCoveredExpr(args.head, args(1), intArg(args(2), "remove_covered"))
      }))
  }
}
