package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Optimization-round probe: q112 stupid-backoff stage costs. */
object ProbeQ112 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = Tables(spark, sfDir).documents
    import graft.operators.TextAnalysis
    (0 until 3).foreach { rep =>
      System.err.println(s"[probe] === rep $rep ===")
      t("TOTAL") {
        val toked = docs.select(col("doc_id"),
          (col("source") === "src0").as("is_ref"),
          TextAnalysis.tokens(col("text")).as("toks"))
        t("tokenize noop") { noop(toked) }
        val cands = toked.filter(size(col("toks")) > 0)
          .select(col("doc_id"), explode(flatten(expr(
            """transform(sequence(0, size(toks) - 1), pos ->
                 transform(sequence(1, least(5, pos + 1)), n ->
                   struct(pos as pos, least(5, pos + 1) as k, n as n,
                     array_join(slice(toks, pos - n + 2, n), ' ') as gram)))"""
          ))).as("g"))
        t("cands explode noop") { noop(cands) }
        t("full q112 noop") {
          noop(TextAnalysis.stupidBackoffSurprisal(docs,
            refPred = col("source") === "src0"))
        }
      }
      Graft.releaseCaches(spark)
    }
    spark.stop()
  }
}
