package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{AhoCorasick, CurationFunctions}

/** Corpus-curation operators beyond the q62 rule pipeline: blocklist
  * phrase matching, Bloom-approximate decontamination, and the
  * compression-ratio redundancy signal.
  */
object Curation {

  /** Per-document blocklist report: the distinct matched pattern
    * indexes (ascending) for every document that contains at least one
    * blocklist phrase. ONE Aho–Corasick pass over each document finds
    * all P phrases at once (broadcast automaton, row-local scan — the
    * per-phrase `LIKE` chain reads the corpus P times); the corpus
    * never shuffles — the only exchange is the final report sort.
    */
  def blocklistMatches(docs: DataFrame, patterns: Seq[String],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val ac = new AhoCorasick(patterns)
    docs.select(col(idCol),
        CurationFunctions.multi_match(col(textCol), ac).as("matched"))
      .filter(size(col("matched")) > 0)
  }

  /** Blocklist REDACTION — the repair counterpart of
    * [[blocklistMatches]]'s report: every non-overlapping blocklist
    * occurrence is replaced in ONE automaton pass (leftmost match,
    * longest pattern on a shared start). Output keeps every document
    * with its redaction count; same broadcast-automaton, row-local,
    * shuffle-free shape.
    */
  def blocklistRedact(docs: DataFrame, patterns: Seq[String],
      replacement: String = "[BLOCKED]", textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val ac = new AhoCorasick(patterns)
    docs.select(col(idCol),
        CurationFunctions.multi_redact(col(textCol), ac, replacement).as("r"))
      .select(col(idCol), col("r.redacted").as("redacted"),
        col("r.n_redacted").as("n_redacted"))
  }

  /** Bloom-filter decontamination — the [[Dedup.decontaminate]] scale
    * path for when the benchmark's exact digest set outgrows a
    * broadcast hash join (1B benchmark digests = 16+ GB exact vs
    * ~1.2 GB of Bloom bits at 1% fpp). The filter is built in one pass
    * over the benchmark side (driver holds only the bit array), rides
    * the plan as a reference object, and the corpus filters in place —
    * row-local probe, no join, no shuffle. No false negatives: every
    * truly contaminated document is dropped; an fpp-fraction of clean
    * documents is over-dropped (the conservative direction for a
    * leakage guard).
    */
  def bloomDecontaminate(corpus: DataFrame, benchmark: DataFrame,
      fpp: Double = 0.01, textCol: String = "text"): DataFrame = {
    val digests = benchmark.select(xxhash64(col(textCol)).as("h"))
    val expected = math.max(digests.count(), 1L)
    val bloom = digests.stat.bloomFilter("h", expected, fpp)
    corpus.filter(
      !CurationFunctions.bloom_might_contain(xxhash64(col(textCol)), bloom))
  }

  /** The end-to-end curation funnel — the composition a training-data
    * team actually ships, each stage applied to the SURVIVORS of the
    * previous one (so quality percentile bounds and dedup pair
    * generation see the stage's real input, exactly like a production
    * run): blocklist → quality rules → exact dedup → near dedup →
    * benchmark decontamination. Returns the funnel report
    * (stage, docs_in, docs_out, dropped) — six counts total; each
    * intermediate survivor set is persisted so no stage recomputes its
    * predecessors, and [[finalSurvivors]] exposes the surviving corpus
    * for export.
    */
  def curationFunnel(docs: DataFrame, benchmark: DataFrame,
      patterns: Seq[String], textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val stages = curationStages(docs, benchmark, patterns, textCol, idCol)
    val counts = stages.map { case (_, df) => df.count() }
    // the report is six local longs — release the stage caches rather
    // than leaking four persisted frames per invocation (the returned
    // frame has no lineage into them). Skip stage 0: it is the caller's
    // own frame, and unpersisting it would drop a cache the caller owns.
    stages.drop(1).foreach { case (_, df) => df.unpersist(); () }
    val spark = docs.sparkSession
    import spark.implicits._
    stages.map(_._1).zip(counts).sliding(2).map {
      case Seq((_, in), (stage, out)) => (stage, in, out, in - out)
    }.toSeq.toDF("stage", "docs_in", "docs_out", "dropped")
  }

  /** The funnel's surviving corpus (the last stage's frame). */
  def finalSurvivors(docs: DataFrame, benchmark: DataFrame,
      patterns: Seq[String], textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    curationStages(docs, benchmark, patterns, textCol, idCol).last._2

  private def curationStages(docs: DataFrame, benchmark: DataFrame,
      patterns: Seq[String], textCol: String,
      idCol: String): Seq[(String, DataFrame)] = {
    val s0 = docs
    val s1 = s0.join(
      blocklistMatches(s0, patterns, textCol, idCol).select(col(idCol)),
      Seq(idCol), "left_anti").transform(graft.CacheRegistry.persist(_))
    val s2 = s1.join(
      graft.operators.TextAnalysis.curationDecisions(s1, textCol, idCol)
        .filter(col("keep")).select(col(idCol)),
      Seq(idCol), "left_semi").transform(graft.CacheRegistry.persist(_))
    val s3 = Dedup.deduplicate(s2, textCol, idCol).transform(graft.CacheRegistry.persist(_))
    val s4 = Dedup.nearDeduplicate(s3, textCol = textCol, idCol = idCol)
      .transform(graft.CacheRegistry.persist(_))
    val s5 = Dedup.decontaminate(s4, benchmark, textCol)
    Seq("input" -> s0, "blocklist" -> s1, "quality" -> s2,
      "exact_dedup" -> s3, "near_dedup" -> s4, "decontaminate" -> s5)
  }

  /** Compression-ratio quality signal (deflate bytes / raw bytes) plus
    * the band verdict quality pipelines cut on: `repetitive` below
    * `lo` (templated/looped text), `junk` above `hi` (incompressible
    * noise), `ok` between. Row-local kernel, one corpus scan.
    */
  def compressionRatios(docs: DataFrame, lo: Double = 0.25,
      hi: Double = 0.8, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol),
        CurationFunctions.deflate_ratio(col(textCol)).as("ratio"))
      .withColumn("verdict",
        when(col("ratio") < lo, lit("repetitive"))
          .when(col("ratio") > hi, lit("junk"))
          .otherwise(lit("ok")))
}
