package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Bounded per-group selection (q90/q91): parity with the window-rank
  * formulation they replace, plus the plan properties that make them
  * scale (no Window node, map-side partial buffers).
  */
class SamplingSpec extends SparkSuite {

  private lazy val docs = Tables(spark, sf("0.001")).documents

  test("groupSample equals the window-rank formulation") {
    val got = Sampling.groupSample(docs, "source", "doc_id", 10)
      .orderBy("source", "rn")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val w = Window.partitionBy("source")
      .orderBy(Sampling.hashScore(col("doc_id")), col("doc_id"))
    val want = docs
      .select(col("source"), col("doc_id"),
        row_number().over(w).cast("long").as("rn"))
      .filter(col("rn") <= 10)
      .orderBy("source", "rn")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(1))).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("groupCap equals the per-group row_number window; keeps the best, " +
      "drops the over-represented tail") {
    val docs = Tables(spark, sf("0.001")).documents
    val got = Sampling.groupCap(docs, "source", cap = 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    val want = docs.withColumn("rank",
        row_number().over(Window.partitionBy("source")
          .orderBy(col("n_chars").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= 7)
      .select("source", "doc_id", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(got == want && got.nonEmpty)
    // the cap binds: every source with > 7 docs surrenders its tail
    val perSource = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptPerSource = got.groupBy(_._1).view.mapValues(_.size).toMap
    perSource.foreach { case (s, n) =>
      assert(keptPerSource(s) == math.min(n, 7L).toInt, s"$s: $n")
    }
  }

  test("groupCap ranks null scores last (NULLS LAST), never drops them") {
    import spark.implicits._
    val probe = Seq(
      ("a", 1L, Some(50L)), ("a", 2L, None), ("a", 3L, Some(90L)),
      ("a", 4L, None), ("b", 5L, None)).map {
        case (g, id, sc) => (g, id, sc.map(Long.box).orNull)
      }.toDF("grp", "id", "score")
      .withColumn("score", col("score").cast("long"))
    val got = Sampling.groupCap(probe, "grp", cap = 3,
        scoreCol = "score", idCol = "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    // a: 90 → rank 1, 50 → rank 2, then the smaller-id null (id 2);
    // b's only doc keeps rank 1 despite its null score
    assert(got == Seq(("a", 1L, 2L), ("a", 2L, 3L), ("a", 3L, 1L),
      ("b", 5L, 1L)), got)
    // parity with the window formulation's NULLS LAST semantics
    val want = probe.withColumn("rank",
        row_number().over(Window.partitionBy("grp")
          .orderBy(col("score").desc_nulls_last, col("id"))).cast("long"))
      .filter(col("rank") <= 3).select("grp", "id", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(got == want)
    // float edges: -Infinity and -Double.MaxValue scores still rank
    // ABOVE nulls under cap pressure (the NaN sentinel sorts after
    // +Inf; a finite sentinel would collide with -MaxValue and lose
    // to the negated -Infinity)
    val edges = Seq(
      ("a", 1L, Some(Double.NegativeInfinity)),
      ("a", 2L, Some(-Double.MaxValue)),
      ("a", 3L, None), ("a", 4L, Some(1.0))).map {
        case (g, id, sc) => (g, id, sc.map(Double.box).orNull)
      }.toDF("grp", "id", "score")
      .withColumn("score", col("score").cast("double"))
    val gotE = Sampling.groupCap(edges, "grp", cap = 3,
        scoreCol = "score", idCol = "id")
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted.toSeq
    // 1.0 -> rank 1, -MaxValue -> 2, -Inf -> 3; the null-score doc 3
    // falls outside the cap
    assert(gotE == Seq((1L, 3L), (2L, 2L), (4L, 1L)), gotE)
  }

  test("heavyHitters equals the count + window-rank formulation") {
    val got = Sampling.heavyHitters(docs, "source", "text", 5)
      .orderBy("source", "rn")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSeq
    val counts = docs
      .select(col("source"),
        explode(filter(split(col("text"), " "), t => t =!= "")).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("source")
      .orderBy(col("cnt").desc, col("tok"))
    val want = counts
      .select(col("source"), col("tok"), col("cnt"),
        row_number().over(w).cast("long").as("rn"))
      .filter(col("rn") <= 5)
      .orderBy("source", "rn")
      .collect()
      .map(r => (r.getString(0), r.getLong(3), r.getString(1), r.getLong(2)))
      .toSeq
    assert(got == want && got.nonEmpty)
  }

  test("collect_min_k_by_str survives partial/merge across many partitions") {
    // 64 input partitions force serialize/deserialize + merge of partial
    // buffers; the payload must be cloned (not a pointer into a reused
    // row buffer), so distinct tokens must come back distinct
    import spark.implicits._
    val df = (0 until 1000)
      .map(i => (i % 7, s"tok${i % 13}"))
      .toDF("g", "tok").repartition(64)
    val got = df.groupBy("g")
      .agg(graft.functions.BoundedAgg.collect_min_k_by_str(
        lit(1.0), col("tok"), 5).as("top"))
      .select(col("g"), explode(col("top.value")).as("v"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq.sorted
    // equal scores → binary order on the payload: tok0, tok1, tok10, ...
    val expectTop5 = (0 until 13).map(i => s"tok$i").sorted.take(5)
    val want = (0 until 7).flatMap(g => expectTop5.map(v => (g, v))).sorted
    assert(got == want)
  }

  test("approxHeavyHitters equals the exact form while vocab fits the sketch") {
    val got = Sampling.approxHeavyHitters(docs, "source", "text", 5)
      .orderBy("source", "rn")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSeq
    val want = Sampling.heavyHitters(docs, "source", "text", 5)
      .orderBy("source", "rn")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == want && got.nonEmpty)
  }

  test("heavy-hitters sketch lifecycle: accumulate + combine + estimate; " +
      "state survives parquet") {
    // two "deliveries" (doc_id parity) summarized independently, folded,
    // then served from state alone — must equal the one-shot sketch
    val a = Sampling.heavyHittersAccumulate(
      docs.filter(col("doc_id") % 2 === 0), "source", "text")
    val b = Sampling.heavyHittersAccumulate(
      docs.filter(col("doc_id") % 2 === 1), "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-hh").toFile
    try {
      // the stored-index half: state persists and reloads as plain rows
      a.write.mode("overwrite").parquet(new java.io.File(dir, "idx").toString)
      val stored = spark.read.parquet(new java.io.File(dir, "idx").toString)
      val combined = Sampling.heavyHittersCombine(
        stored.unionByName(b), "source")
      val got = Sampling.heavyHittersEstimate(combined, "source", 5)
        .orderBy("source", "rn")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .toSeq
      val want = Sampling.approxHeavyHitters(docs, "source", "text", 5)
        .orderBy("source", "rn")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .toSeq
      assert(got == want && got.nonEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  test("weightedSample: parity with the full-sort form, bias, determinism") {
    val base = Tables(spark, sf("0.01")).documents
      .select("doc_id", "source", "n_chars")
    val got = Sampling.weightedSample(base, "n_chars", "doc_id", 50)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    // independent formulation: full sort over explicitly-computed keys
    val u = (Sampling.hashScore(col("doc_id")).cast("double") + lit(0.5)) /
      lit(1000003.0)
    val want = base
      .withColumn("key_m",
        round(-log(u) / greatest(col("n_chars").cast("double"), lit(1.0))
          * lit(1e6)).cast("long"))
      .orderBy("key_m", "doc_id").limit(50)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(got == want && got.size == 50)
    // heavier documents are overrepresented: the length-weighted draw's
    // mean length must exceed the corpus mean
    val sampleMean = base.join(
        Sampling.weightedSample(base, "n_chars", "doc_id", 50)
          .select("doc_id"), Seq("doc_id"))
      .agg(avg("n_chars")).head.getDouble(0)
    val corpusMean = base.agg(avg("n_chars")).head.getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted draw not length-biased: $sampleMean <= $corpusMean")
    // layout-independent: a different partitioning draws the same set
    val re = Sampling.weightedSample(base.repartition(17), "n_chars",
      "doc_id", 50).collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(re == got)
  }

  test("weightedSample plans TakeOrdered, never a global sort") {
    val p = SparkEntry.queries("q106_weighted_sample")(spark, sf("0.001"))
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"q106 expected TakeOrderedAndProject in:\n$p")
    assert(!p.contains("Sort ["), s"q106 must not plan a global sort:\n$p")
  }

  test("q91b plan: sketches merge map-side; no corpus-wide window") {
    val p = SparkEntry.queries("q91b_heavy_hitters_approx")(spark, sf("0.001"))
      .queryExecution.executedPlan.toString
    assert(p.contains("approx_top_k"), s"q91b expected the sketch agg in:\n$p")
    assert(p.contains("partial_"),
      s"q91b expected map-side partial sketches in:\n$p")
    assert(!p.contains("windowspecdefinition"),
      s"q91b must not plan a window rank pass:\n$p")
  }

  test("q90/q91 plans use the bounded aggregate, never a window sort") {
    for (name <- Seq("q90_group_sample", "q91_heavy_hitters")) {
      val p = SparkEntry.queries(name)(spark, sf("0.001"))
        .queryExecution.executedPlan.toString
      assert(p.contains("collect_min_k"), s"$name expected bounded agg in:\n$p")
      assert(!p.contains("windowspecdefinition"),
        s"$name must not plan a window rank pass:\n$p")
      assert(p.contains("partial_"),
        s"$name expected map-side partial buffers in:\n$p")
    }
  }
}
