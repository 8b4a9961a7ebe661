package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lexicon loading (SURVEY.md A4; reference `lookup/loader.py` loads
  * country/first-name/last-name word lists and probes membership per
  * token, feature C14).
  *
  * Two scale regimes:
  * - small lexica (countries): literal `isin` — folded into codegen,
  *   zero distribution cost (`Features.lexiconFlag`);
  * - large lexica (name lists, millions of rows): a broadcast left-semi
  *   join flag — the lexicon ships once per executor, the token table
  *   never shuffles.
  */
object Lexicon {

  /** Load a one-word-per-line text file (blank lines and `#` comments
    * skipped, lowercased) — the reference's word-list format. */
  def fromTextFile(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(lower(trim(col("value"))).as("word"))
      .filter(col("word") =!= "" && !col("word").startsWith("#"))
      .distinct()

  /** Add a '1'/'0' membership flag column via broadcast semi-join
    * (left join + presence flag keeps all token rows). */
  def membershipFlag(tokens: DataFrame, lexicon: DataFrame,
      tokenCol: String = "text", flagCol: String = "in_lexicon"): DataFrame =
    tokens
      .join(broadcast(lexicon.withColumn("_present", lit(1))),
        lower(col(tokenCol)) === col("word"), "left")
      .withColumn(flagCol, when(col("_present").isNotNull, "1").otherwise("0"))
      .drop("word", "_present")
}
