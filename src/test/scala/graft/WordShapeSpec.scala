package graft

import graft.functions.WordShape

/** Golden cases for the word-shape feature, values computed with the
  * reference algorithm (`sciencebeam_parser/models/data.py:360-382`).
  */
class WordShapeSpec extends SparkSuite {

  val golden = Seq(
    "Quick123" -> "Xxddd",
    "Title" -> "Xxxx",
    "a" -> "x",
    "AB" -> "XX",
    "abc" -> "xxx",
    "ABC-12x" -> "XX-ddx",
    "x" -> "x",
    "" -> "",
    "Strasse" -> "Xxxx",
    "3.14" -> "d.dd",
    "McDonald" -> "XxXxxx",
  )

  test("shape() matches reference goldens") {
    golden.foreach { case (in, want) =>
      assert(WordShape.shape(in) == want, s"shape($in)")
    }
  }

  test("expression evaluates inside a DataFrame (codegen path)") {
    import spark.implicits._
    val df = golden.map(_._1).toDF("t")
      .select(WordShape.word_shape($"t").as("s"))
    assert(df.collect().map(_.getString(0)).toSeq == golden.map(_._2))
  }
}
