package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `BINARY` columns with
  * typed metadata (SURVEY.md training-data ops; reference analog: page
  * images + graphics assets, `processors/document_page_image.py` /
  * `graphic_matching.py:565-593`).
  *
  * The Spark-side plumbing is real — schema, per-partition batched
  * processing, deterministic outputs; the codec layer is STUBBED
  * (`decodeImageStub`) because no image/audio libraries ship in this
  * container. A real deployment swaps the stub for JavaCV/TwelveMonkeys
  * (or hands the batch to an ONNX vision encoder) without touching the
  * dataflow: `mapPartitions` already amortizes per-model/per-codec init
  * across the partition, which is the pattern the reference uses for
  * its external binaries.
  */
object Multimodal {

  final case class MediaRow(
      doc_id: Long,
      media_type: String, // "image/png" | "audio/wav" | "video/mp4" | ...
      content: Array[Byte],
      meta: Map[String, String])

  final case class ImageFeatures(
      doc_id: Long,
      media_type: String,
      width: Int,
      height: Int,
      channels: Int,
      n_bytes: Long,
      embedding: Array[Float])

  /** STUB decode: deterministic pseudo-metadata + embedding derived from
    * the content bytes (a real build decodes pixels here). Marked
    * clearly as fake; downstream plumbing (schema, batching,
    * partitioning) is the tested artifact.
    */
  private[operators] def decodeImageStub(content: Array[Byte], dim: Int): (Int, Int, Int, Array[Float]) = {
    var h = 1125899906842597L // deterministic FNV-ish fold over bytes
    content.foreach(b => h = h * 31 + b)
    val width = 64 + math.floorMod(h, 1024).toInt
    val height = 64 + math.floorMod(h >> 10, 1024).toInt
    val channels = 1 + math.floorMod(h >> 20, 4).toInt
    val emb = new Array[Float](dim)
    var s = h
    var i = 0
    while (i < dim) {
      s = graft.functions.Sketch.mix(s)
      emb(i) = (s.toDouble / Long.MaxValue).toFloat
      i += 1
    }
    (width, height, channels, emb)
  }

  /** Batched per-partition image featurization. `batchSize` is the
    * decode/inference batch: at scale, partitions hold many media rows
    * and the expensive step (a vision model) wants fixed-size batches —
    * the iterator grouping below is exactly the shape an ONNX session
    * call needs, with no driver involvement.
    */
  def imageFeatures(media: Dataset[MediaRow], dim: Int = 16,
      batchSize: Int = 32): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init happens HERE once (codec/model session)
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val (w, h, c, emb) = decodeImageStub(m.content, dim)
          ImageFeatures(m.doc_id, m.media_type, w, h, c,
            m.content.length.toLong, emb)
        }
      }
    }
  }

  /** Deterministic frame sampling stub for video binary columns: one
    * "frame" digest per `frameBytes` chunk, every `everyN`-th kept.
    * Row-local (explode), no shuffle. */
  def sampleFrames(video: DataFrame, contentCol: String = "content",
      everyN: Int = 2, frameBytes: Int = 1024): DataFrame = {
    val nFrames = ceil(length(col(contentCol)) / frameBytes)
    video.withColumn("frame_idx",
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(everyN))))
      .withColumn("frame_digest",
        xxhash64(col(contentCol), col("frame_idx")))
  }

  /** Wrap a text corpus as fake media rows (lets the pipeline run on the
    * driver's synthetic tables at any scale). */
  def mediaFromDocuments(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text, source) =>
        MediaRow(id, "image/stub",
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          Map("source" -> source))
      }
  }
}
