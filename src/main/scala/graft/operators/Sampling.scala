package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BoundedAgg

/** Bounded per-group selection operators — the "k rows per key" family
  * a training-data pipeline runs constantly (per-source QA samples,
  * per-source vocabulary dashboards). Both operators refuse the
  * window-rank formulation: `row_number() OVER (PARTITION BY g ORDER BY
  * s)` shuffles and SORTS every row of the corpus to keep k per group,
  * while the bounded aggregates here truncate to k map-side and plan
  * one hash-agg exchange of ≤ k·groups rows — the difference between a
  * corpus-wide sort and a dashboard-sized shuffle at 100 TB.
  */
object Sampling {

  /** Deterministic multiplicative hash score in [0, 1000003): a
    * reproducible "uniform" draw both engines compute exactly with
    * 64-bit integer arithmetic (no float, no engine-specific hash).
    * Knuth's 2654435761 multiplier; exact while id < 2^31.5 (the
    * product must stay inside the oracle's checked BIGINT), which a
    * per-table sequential id satisfies far past 10^9 documents.
    */
  def hashScore(id: Column): Column = (id * lit(2654435761L)) % lit(1000003L)

  /** k documents per group, selected by the deterministic [[hashScore]]
    * order (score asc, id asc) — a reproducible per-group random sample
    * (QA/eyeball sets, per-source eval carve-outs). One bounded
    * hash aggregate; no window, no sort of the corpus.
    *
    * Output: (group, rank 1-based, id) rows.
    */
  def groupSample(df: DataFrame, groupCol: String, idCol: String,
      k: Int): DataFrame = {
    // fail fast on a non-numeric id: a silent cast-to-null would make
    // the bounded aggregate drop every row and return an empty sample
    val idType = df.schema(idCol).dataType
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(idType),
      s"groupSample needs an integral id column; $idCol is $idType")
    val scored = df.select(col(groupCol), col(idCol).cast("long").as("__id"),
      hashScore(col(idCol).cast("long")).cast("double").as("__s"))
    scored.groupBy(col(groupCol))
      .agg(BoundedAgg.collect_min_k_by(col("__s"), col("__id"), k).as("top"))
      .select(col(groupCol), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col(groupCol), (col("pos") + 1).cast("long").as("rn"),
        col("p.id").as(idCol))
  }

  /** Top-k most frequent tokens per group (the per-source vocabulary
    * dashboard / domain-signature report). Stage 1: one map-side
    * combined count per (group, token). Stage 2: bounded string-payload
    * top-k per group — score = -count so smallest-k = most frequent,
    * ties broken by token bytes ascending, matching `ORDER BY cnt DESC,
    * tok` exactly. Counts < 2^53 stay exact in the double score.
    *
    * Output: (group, rank 1-based, tok, cnt) rows.
    */
  def heavyHitters(df: DataFrame, groupCol: String, textCol: String,
      k: Int): DataFrame = {
    // row-local tf first (native token_tf kernel): the exploded stream
    // carries one row per DISTINCT token per document, not one per
    // occurrence — in-document repetition collapses before any shuffle
    val toks = df.select(col(groupCol),
      explode(graft.functions.Sketch.token_tf(
        graft.operators.TextAnalysis.tokens(col(textCol)))).as("p"))
    val counts = toks.groupBy(col(groupCol), col("p.tok").as("tok"))
      .agg(sum(col("p.tf")).as("cnt"))
    counts.groupBy(col(groupCol))
      .agg(BoundedAgg.collect_min_k_by_str(
        -col("cnt").cast("double"), col("tok"), k).as("top"))
      .select(col(groupCol), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col(groupCol), (col("pos") + 1).cast("long").as("rn"),
        col("p.value").as("tok"), (-col("p.score")).cast("long").as("cnt"))
  }
}
