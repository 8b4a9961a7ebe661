package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{BioSpans, NeuralLabeler}

/** D2 neural-labeler contract: batching, encoding, argmax decode —
  * with a deterministic linear stand-in for the ONNX session.
  */
class NeuralLabelerSpec extends SparkSuite {
  import spark.implicits._

  test("hashingEncoder: deterministic, dimension-bounded, column counts") {
    val enc = NeuralLabeler.hashingEncoder(16)
    val a = enc("tok A B")
    assert(a.sameElements(enc("tok A B")))
    assert(a.length == 16 && a.sum == 3.0f)
    assert(enc("").sum == 0.0f)
  }

  test("label: batched inference over doc-contiguous sequences") {
    // inference stand-in: score label 1 when the feature vector has
    // mass in any bucket hit by the token "TITLE" marker column
    val enc = NeuralLabeler.hashingEncoder(32)
    val titleMask = enc("TITLE")
    val labels = IndexedSeq("O", "I-<title>")
    val infer: Seq[Seq[Array[Float]]] => Seq[Seq[Array[Float]]] = { batch =>
      batch.map(_.map { v =>
        val hit = v.zip(titleMask).exists { case (x, m) => m > 0 && x >= m }
        Array(if (hit) 0f else 1f, if (hit) 1f else 0f)
      })
    }
    val rows = (0 until 5).flatMap { doc =>
      (0 until 3).map { i =>
        val feat = if (doc % 2 == 0 && i == 0) s"t$i TITLE" else s"t$i BODY"
        (doc.toLong, 0, 0, 0, i, s"t$i", " ", feat)
      }
    }
    val df = rows.toDF("doc_id", "page_idx", "block_idx", "line_idx",
      "token_idx", "text", "whitespace", "features")
    val labeled = new NeuralLabeler(labels, enc, infer, batchSize = 2).label(df)
    val out = labeled.select("doc_id", "token_idx", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    assert(out((0L, 0)) == "I-<title>" && out((0L, 1)) == "O")
    assert(out((1L, 0)) == "O")
    assert(out((4L, 0)) == "I-<title>")
    // labels flow into span grouping like every other backend
    assert(BioSpans.spans(labeled).filter(col("tag") === "<title>").count() == 3)
  }

  test("label: inference returning wrong shape fails loudly") {
    val enc = NeuralLabeler.hashingEncoder(8)
    val bad: Seq[Seq[Array[Float]]] => Seq[Seq[Array[Float]]] =
      batch => batch.map(_.drop(1).map(_ => Array(1f, 0f)))
    val df = Seq((0L, 0, 0, 0, 0, "a", " ", "a"), (0L, 0, 0, 0, 1, "b", " ", "b"))
      .toDF("doc_id", "page_idx", "block_idx", "line_idx", "token_idx",
        "text", "whitespace", "features")
    val ex = intercept[org.apache.spark.SparkException] {
      new NeuralLabeler(IndexedSeq("O", "X"), enc, bad).label(df).count()
    }
    assert(ex.getMessage.contains("labels") || ex.getCause != null)
  }
}
