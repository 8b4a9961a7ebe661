package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off giant-document skew probe for the sequence labelers: one
  * doc holding `pages` pages of `tokensPerPage` rows next to a fleet
  * of single-page docs, decoded doc-scoped (the whole giant is ONE
  * Viterbi task) vs page-scoped (`perPage = true`,
  * [[graft.pipeline.SequenceScope]]) — the wall-clock gap is the skew
  * evidence behind VERDICT r13 #5. args: [pages] [tokensPerPage]
  * [smallDocs] [master].
  */
object LabelerSkewProbe {
  def main(args: Array[String]): Unit = {
    val pages = args.headOption.map(_.toInt).getOrElse(2000)
    val perPage = if (args.length > 1) args(1).toInt else 100
    val smallDocs = if (args.length > 2) args(2).toInt else 310
    val master = if (args.length > 3) args(3) else "local[32]"
    val spark = SparkSession.builder().master(master)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // a wapiti-shaped model big enough that decode cost is realistic:
    // 3 labels, token + prev-token templates, transition weights
    val model =
      """[labels]
        |O
        |B-<t>
        |I-<t>
        |[patterns]
        |U00:%x[0,0]
        |U01:%x[-1,0]
        |B
        |[weights]
        |U00:T	B-<t>	4.0
        |U00:x	I-<t>	1.0
        |U00:o	O	4.0
        |U01:T	I-<t>	2.5
        |U01:o	O	2.5
        |B:	B-<t>	I-<t>	1.0
        |B:	O	B-<t>	0.5
        |""".stripMargin

    def rows(d: Long, p: Int, n: Int) = (0 until n).map { i =>
      val tok = if (i % 5 == 0) "T" else if (i % 5 < 3) "x" else "o"
      (d, p, 0, 0, i, tok, " ", s"$tok f${i % 7}")
    }
    val giant = (0 until pages).flatMap(p => rows(0L, p, perPage))
    val small = (1 to smallDocs).flatMap(d => rows(d.toLong, 0, perPage))
    val corpus = (giant ++ small).toDF("doc_id", "page_idx", "block_idx",
      "line_idx", "token_idx", "text", "whitespace", "features")
      .repartition(32).persist()
    println(s"corpus: ${corpus.count()} rows; giant doc = $pages pages x " +
      s"$perPage tokens, $smallDocs small docs")

    def time(tag: String, byPage: Boolean): Unit = {
      // warm + 2 timed reps, min reported
      val lab = new graft.pipeline.CrfLabeler(model, perPage = byPage)
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        lab.label(corpus).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag: min ${ts.drop(1).min}%.2f s (reps ${ts.map(t => f"$t%.2f").mkString(",")})")
    }
    time("doc-scoped ", byPage = false)
    time("page-scoped", byPage = true)
    spark.stop()
  }
}
