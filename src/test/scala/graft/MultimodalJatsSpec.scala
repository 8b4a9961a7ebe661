package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sinks.Jats
import graft.sources.Lexicon

class MultimodalJatsSpec extends SparkSuite {
  import spark.implicits._

  test("multimodal: real PNG media rows → batched ImageIO decode, deterministic") {
    val docs = Tables(spark, sf("0.001")).documents.limit(50)
    val media = Multimodal.mediaFromDocuments(docs)
    val feats = Multimodal.imageFeatures(media, batchSize = 16)
    val rows = feats.collect()
    assert(rows.length == 50)
    // real decode: 16px-wide grayscale rasters, 4x4 luma-grid embedding
    assert(rows.forall(r => r.width == 16 && r.height >= 1 &&
      r.channels == 1 && r.embedding.length == 16 &&
      r.embedding.forall(v => v >= 0f && v <= 1f)))
    // determinism across runs and batch sizes
    val again = Multimodal.imageFeatures(media, batchSize = 7).collect()
    assert(rows.sortBy(_.doc_id).map(_.embedding.toSeq).toSeq ==
      again.sortBy(_.doc_id).map(_.embedding.toSeq).toSeq)
  }

  test("multimodal: ImageIO round-trip recovers exact block means") {
    // 4x4 image, one gray level per quadrant-of-one: embedding = pixel/255
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 4; x <- 0 until 4)
      img.getRaster.setSample(x, y, 0, (y * 4 + x) * 16)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val Some((w, h, c, emb)) = Multimodal.decodeImage(out.toByteArray, grid = 4)
    assert(w == 4 && h == 4 && c == 1)
    for (i <- 0 until 16) assert(math.abs(emb(i) - i * 16 / 255f) < 1e-6)
  }

  test("multimodal: undecodable bytes fall back to the stub path") {
    val junk = Seq(Multimodal.MediaRow(7L, "video/mp4",
      Array.fill[Byte](100)(42), Map.empty)).toDS()
    val r = Multimodal.imageFeatures(junk, dim = 8).collect().head
    assert(r.width >= 64 && r.embedding.length == 8) // stub semantics
  }

  test("multimodal: dHash is invariant to re-encode, uniform brightness " +
      "and exact upscale; flips on a genuinely different image") {
    // 72x64 (multiples of the 9x8 grid, so blocks align exactly):
    // horizontal gradient + a dark box, luma <= 200 so +10 never clips
    def render(shift: Int, invert: Boolean, scale: Int,
        format: String): Array[Byte] = {
      val (w, h) = (72 * scale, 64 * scale)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w) {
        val gx = x / scale
        val gy = y / scale
        val base = (gx * 200 / 71) min 200
        val boxed = if (gx >= 18 && gx < 36 && gy >= 16 && gy < 48) 20 else base
        val v = (if (invert) 200 - boxed else boxed) + shift
        img.getRaster.setSample(x, y, 0, v)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, format, out)
      out.toByteArray
    }
    val base = Multimodal.dHash64(render(0, invert = false, 1, "png")).get
    assert(Multimodal.dHash64(render(0, invert = false, 1, "bmp")).get == base,
      "re-encoding must not move the hash")
    assert(Multimodal.dHash64(render(10, invert = false, 1, "png")).get == base,
      "uniform brightness must not move the hash (difference hash)")
    assert(Multimodal.dHash64(render(0, invert = false, 2, "png")).get == base,
      "exact 2x upscale must not move the hash (block means stable)")
    val inv = Multimodal.dHash64(render(0, invert = true, 1, "png")).get
    assert(java.lang.Long.bitCount(base ^ inv) > 3,
      s"inverted gradient must flip bits, got ${java.lang.Long.bitCount(base ^ inv)}")
  }

  test("multimodal: imageNearDupPairs pairs identical renders, skips " +
      "different images, and still exact-pairs undecodable byte dups") {
    val same = Multimodal.textToPng("identical content here")
    val junk = Array.fill[Byte](64)(13)
    val media = Seq(
      Multimodal.MediaRow(0L, "image/png", same, Map.empty),
      Multimodal.MediaRow(1L, "image/png", same, Map.empty),
      Multimodal.MediaRow(2L, "image/png",
        Multimodal.textToPng("completely different other words"), Map.empty),
      Multimodal.MediaRow(3L, "application/octet-stream", junk, Map.empty),
      Multimodal.MediaRow(4L, "application/octet-stream", junk, Map.empty)
    ).toDS()
    val hashes = Multimodal.imageHashes(media).collect()
    assert(hashes.filter(_.doc_id <= 2).forall(_.decoded))
    assert(hashes.filter(_.doc_id >= 3).forall(!_.decoded))
    val pairs = Multimodal.imageNearDupPairs(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs.contains((0L, 1L, 0L)), pairs)    // identical renders
    assert(pairs.contains((3L, 4L, 0L)), pairs)    // byte-dup fallback
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L), pairs)
  }

  test("multimodal: ACROSS-delivery dedup over a persisted signature " +
      "index — re-renders and re-gained audio pair their stored " +
      "originals at Hamming 0 without re-pairing the corpus") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-msig")
    try {
      // ---- images: corpus signed once, delivery decoded alone
      val same = Multimodal.textToPng("identical content here")
      val junk = Array.fill[Byte](64)(13)
      val corpus = Seq(
        Multimodal.MediaRow(0L, "image/png", same, Map.empty),
        Multimodal.MediaRow(1L, "image/png",
          Multimodal.textToPng("completely different other words"), Map.empty),
        Multimodal.MediaRow(2L, "application/octet-stream", junk, Map.empty)
      ).toDS()
      Multimodal.imageHashes(corpus).toDF()
        .write.mode("overwrite").parquet(s"$tmp/imgsig")
      val delivery = Seq(
        // re-render of doc 0 (byte-identical PNG → identical dHash)
        Multimodal.MediaRow(100L, "image/png",
          Multimodal.textToPng("identical content here"), Map.empty),
        // byte-dup of the undecodable blob (fallback FNV fold)
        Multimodal.MediaRow(101L, "application/octet-stream",
          junk.clone(), Map.empty),
        Multimodal.MediaRow(102L, "image/png",
          Multimodal.textToPng("novel words never seen before"), Map.empty)
      ).toDS()
      val got = Multimodal.imageNearDupPairsAcross(
          spark.read.parquet(s"$tmp/imgsig"), delivery)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got.contains((0L, 100L, 0L)), got)  // re-render → stored
      assert(got.contains((2L, 101L, 0L)), got)  // fallback byte dup
      assert(!got.exists(_._2 == 102L), got)     // novel: no pair
      // flag partition holds across too: no decoded↔fallback pair
      assert(!got.exists(p => p._1 == 2L && p._2 != 101L), got)
      // parity with the in-batch self-form restricted to cross pairs
      val self = Multimodal.imageNearDupPairs(corpus.union(delivery))
        .filter(col("doc_id_a") < 100L && col("doc_id_b") >= 100L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == self, s"across $got vs self $self")
      // ---- audio: gain-invariant fingerprint pairs the half-gain
      // re-delivery with its stored original (p18b's scenario)
      val wav = Multimodal.textToWav("identical speech content")
      val corpusA = Seq(
        Multimodal.MediaRow(0L, "audio/wav", wav, Map.empty),
        Multimodal.MediaRow(1L, "audio/wav",
          Multimodal.textToWav("completely different speech"), Map.empty)
      ).toDS()
      Multimodal.audioHashes(corpusA).toDF()
        .write.mode("overwrite").parquet(s"$tmp/wavsig")
      val deliveryA = Seq(Multimodal.MediaRow(100L, "audio/wav",
        Multimodal.scaleWavGain(wav, 1, 2), Map.empty)).toDS()
      val gotA = Multimodal.audioNearDupPairsAcross(
          spark.read.parquet(s"$tmp/wavsig"), deliveryA)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(gotA == Set((0L, 100L, 0L)), gotA)
      // SERVED cap bookkeeping (the p17b/p18b production shape): the
      // sign-time over-cap chunk list + flag-aware keepers must give
      // byte-identical output, and the per-delivery plan may SCAN the
      // index but never aggregate it pre-join or broadcast it
      val imgSigned = spark.read.parquet(s"$tmp/imgsig")
      Multimodal.flaggedOverCapChunks(imgSigned)
        .write.mode("overwrite").parquet(s"$tmp/imgchunks")
      Multimodal.flaggedSignatureKeepers(imgSigned)
        .write.mode("overwrite").parquet(s"$tmp/imgkeepers")
      val out = Multimodal.imageNearDupPairsAcross(imgSigned, delivery,
        overCapChunks = Some(spark.read.parquet(s"$tmp/imgchunks")),
        starKeepers = Some(spark.read.parquet(s"$tmp/imgkeepers")))
      assert(out.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet == got)
      import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BROADCAST, Join, LogicalPlan}
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      def indexIn(p: LogicalPlan): Boolean = p.exists {
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation =>
            fs.location.rootPaths.exists(r => r.toString.contains("imgsig") ||
              r.toString.contains("imgkeepers"))
          case _ => false
        }
        case _ => false
      }
      val plan = out.queryExecution.optimizedPlan
      val offenders = plan
        .collect { case j: Join => j }
        .filter { j =>
          (j.hint.leftHint.exists(_.strategy.contains(BROADCAST)) &&
            indexIn(j.left)) ||
          (j.hint.rightHint.exists(_.strategy.contains(BROADCAST)) &&
            indexIn(j.right))
        }
      assert(offenders.isEmpty, offenders.mkString("\n"))
      val aggOffenders = plan.collect {
        case a: Aggregate
            if indexIn(a.child) && !a.child.exists(_.isInstanceOf[Join]) => a
      }
      assert(aggOffenders.isEmpty, aggOffenders.mkString("\n"))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }

  test("multimodal: video ACROSS-delivery dedup over a persisted frame " +
      "index — re-muxes pair stored originals, the background-frame " +
      "prune applies at the UNION doc frequency, byte-dup fallbacks " +
      "pair via full overlap") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-vsig")
    try {
      // three corpus videos share their FIRST frame (a common 64-byte
      // prefix chunk → identical JPEG → identical dHash); each has a
      // unique tail. With maxDocFreq = 3 the shared frame sits AT the
      // threshold in the corpus — the delivery re-mux pushes its union
      // df to 4, so BOTH forms must prune it and pair on tails only
      val common = "x" * 64
      def vid(tail: String) = Multimodal.textToAvi(common + tail)
      val junk = Array.fill[Byte](48)(7) // undecodable container
      val corpus = Seq(
        Multimodal.MediaRow(0L, "video/avi", vid("alpha tail one!" * 5), Map.empty),
        Multimodal.MediaRow(1L, "video/avi", vid("beta tail two!!" * 5), Map.empty),
        Multimodal.MediaRow(2L, "video/avi", vid("gamma tail thr!" * 5), Map.empty),
        Multimodal.MediaRow(3L, "application/octet-stream", junk, Map.empty)
      ).toDS()
      Multimodal.videoFrameIndex(corpus)
        .write.mode("overwrite").parquet(s"$tmp/frames")
      val signed = spark.read.parquet(s"$tmp/frames")
      Multimodal.videoFrameSizes(signed)
        .write.mode("overwrite").parquet(s"$tmp/sizes")
      Multimodal.videoFrameDfs(signed)
        .write.mode("overwrite").parquet(s"$tmp/dfs")
      val delivery = Seq(
        // re-mux of doc 0: same frames, different container bytes
        Multimodal.MediaRow(100L, "video/avi",
          Multimodal.remuxAvi(vid("alpha tail one!" * 5), fps = 8), Map.empty),
        // byte-dup of the undecodable blob: one fallback row IS its
        // whole signature — pairs via the full-overlap exemption
        Multimodal.MediaRow(103L, "application/octet-stream",
          junk.clone(), Map.empty)
      ).toDS()
      def across = Multimodal.videoNearDupPairsAcross(
        signed, spark.read.parquet(s"$tmp/sizes"),
        spark.read.parquet(s"$tmp/dfs"), delivery,
        minShared = 2, maxDocFreq = 3L)
      val got = across.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // parity: the batch operator over the union, restricted to
      // (corpus, delivery) pairs — same union-df prune by construction
      val self = Multimodal.videoNearDupPairs(corpus.union(delivery),
          minShared = 2, maxDocFreq = 3L)
        .filter(col("doc_id_a") < 100L && col("doc_id_b") >= 100L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == self, s"across $got vs self $self")
      // the re-mux pairs doc 0 on its tail frames ONLY (the shared
      // first frame crossed maxDocFreq at union time and was pruned)
      val nf0 = Multimodal.videoFrameIndex(corpus)
        .filter(col("id") === 0L).count()
      val p0 = got.find(p => p._1 == 0L && p._2 == 100L)
      assert(p0.exists(_._3 == nf0 - 1), s"$got (nf0=$nf0)")
      assert(!got.exists(p => p._1 == 1L || p._1 == 2L), got)
      // byte-dup fallback: 1 shared fallback row = full overlap
      assert(got.contains((3L, 103L, 1L)), got)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }

  test("multimodal: fallback FNV folds pair ONLY exact byte duplicates — " +
      "a Hamming-1 fold collision emits no near-dup pair") {
    // two undecodable blobs whose FNV folds provably differ in exactly
    // bit 0: the fold seed is odd and each of the 64 constant bytes
    // flips parity (31x keeps parity, +13 flips), so fold(junk1) is odd
    // and fold(junk2) = fold(junk1) - 1 is its even neighbour — under
    // the old shared-namespace join they paired at Hamming 1
    val junk1 = Array.fill[Byte](64)(13)
    val junk2 = junk1.clone(); junk2(63) = 12
    val media = Seq(
      Multimodal.MediaRow(0L, "application/octet-stream", junk1, Map.empty),
      Multimodal.MediaRow(1L, "application/octet-stream", junk2, Map.empty),
      Multimodal.MediaRow(2L, "application/octet-stream", junk1.clone(), Map.empty)
    ).toDS()
    val hs = Multimodal.imageHashes(media).collect().sortBy(_.doc_id)
    assert(hs.forall(!_.decoded))
    assert(java.lang.Long.bitCount(hs(0).dhash ^ hs(1).dhash) == 1,
      "fixture invariant: folds must differ in exactly one bit")
    val pairs = Multimodal.imageNearDupPairs(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((0L, 2L, 0L)), pairs)
  }

  test("multimodal: wavEnergyHash64 is gain-invariant and content-" +
      "sensitive; audioNearDupPairs pairs identical renders only") {
    // minimal 16-bit mono PCM WAV around an explicit sample array
    def wav(samples: Array[Short]): Array[Byte] = {
      val data = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        data(i * 2) = (s & 0xFF).toByte
        data(i * 2 + 1) = ((s >> 8) & 0xFF).toByte
      }
      val out = new java.io.ByteArrayOutputStream()
      def le32(v: Int) = (0 until 4).foreach(i => out.write((v >> (8 * i)) & 0xFF))
      def le16(v: Int) = (0 until 2).foreach(i => out.write((v >> (8 * i)) & 0xFF))
      out.write("RIFF".getBytes); le32(36 + data.length)
      out.write("WAVE".getBytes); out.write("fmt ".getBytes); le32(16)
      le16(1); le16(1); le32(8000); le32(16000); le16(2); le16(16)
      out.write("data".getBytes); le32(data.length); out.write(data)
      out.toByteArray
    }
    // a varying envelope, |sample| <= 1000 so x2 gain never clips
    val base = Array.tabulate[Short](4000)(i =>
      ((math.sin(i / 40.0) * (300 + (i % 700))).toInt).toShort)
    val h = Multimodal.wavEnergyHash64(wav(base)).get
    val doubled = base.map(s => (s * 2).toShort)
    assert(Multimodal.wavEnergyHash64(wav(doubled)).get == h,
      "uniform gain must not move the fingerprint")
    val other = Array.tabulate[Short](4000)(i =>
      ((math.cos(i / 17.0) * (900 - (i % 800))).toInt).toShort)
    val hOther = Multimodal.wavEnergyHash64(wav(other)).get
    assert(java.lang.Long.bitCount(h ^ hOther) > 3,
      s"different audio must flip bits, got ${java.lang.Long.bitCount(h ^ hOther)}")
    // pair fixture: identical renders and a half-gain re-render pair at
    // hamming 0 (textToWav samples are multiples of 256, so halving is
    // exact); a different signal stays unpaired
    val sameWav = Multimodal.textToWav("identical speech content")
    val media = Seq(
      Multimodal.MediaRow(0L, "audio/wav", sameWav, Map.empty),
      Multimodal.MediaRow(1L, "audio/wav", sameWav, Map.empty),
      Multimodal.MediaRow(2L, "audio/wav", wav(other), Map.empty),
      Multimodal.MediaRow(3L, "audio/wav",
        Multimodal.scaleWavGain(sameWav, 1, 2), Map.empty)
    ).toDS()
    val pairs = Multimodal.audioNearDupPairs(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs.contains((0L, 1L, 0L)), pairs)
    assert(pairs.contains((0L, 3L, 0L)), pairs)
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L), pairs)
  }

  test("multimodal: videoNearDupPairs pairs a re-muxed copy on shared " +
      "frame hashes, skips unrelated videos, prunes background frames") {
    val a = Multimodal.textToAvi(
      "the first video's text content, long enough for several frames " +
        "of distinct pixel payloads rendered into the mjpeg stream here")
    val b = Multimodal.textToAvi(
      "a completely different second video body with other frame bytes " +
        "that never coincide with the first one's jpeg frame payloads!!")
    val aRemux = Multimodal.remuxAvi(a, fps = 8)
    assert(!java.util.Arrays.equals(a, aRemux),
      "remux must change the container bytes")
    val media = Seq(
      Multimodal.MediaRow(0L, "video/avi", a, Map.empty),
      Multimodal.MediaRow(1L, "video/avi", aRemux, Map.empty),
      Multimodal.MediaRow(2L, "video/avi", b, Map.empty)
    ).toDS()
    val pairs = Multimodal.videoNearDupPairs(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 >= 2L), pairs)
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L), pairs)
    // undecodable byte-dups: each contributes ONE fallback row, below
    // minShared — the full-overlap rule must still pair them
    val junk = Array.fill[Byte](80)(7)
    val fallback = Seq(
      Multimodal.MediaRow(20L, "video/mp4", junk, Map.empty),
      Multimodal.MediaRow(21L, "video/mp4", junk.clone(), Map.empty),
      Multimodal.MediaRow(22L, "video/mp4", Array.fill[Byte](80)(9), Map.empty)
    ).toDS()
    val fbPairs = Multimodal.videoNearDupPairs(fallback)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fbPairs == Set((20L, 21L, 1L)), fbPairs)
    // df pruning: a frame hash present in MORE than maxDocFreq videos
    // generates no candidates at all
    val many = (0L until 5L).map(i =>
      Multimodal.MediaRow(10L + i, "video/avi",
        Multimodal.textToAvi("identical background"), Map.empty)).toDS()
    assert(Multimodal.videoNearDupPairs(many, minShared = 1,
      maxDocFreq = 4L).isEmpty)
    assert(Multimodal.videoNearDupPairs(many, minShared = 1,
      maxDocFreq = 5L).count() == 10L) // all C(5,2) pairs once allowed
  }

  test("multimodal: WAV encode→decode round-trip (PCM chunk walk)") {
    val text = "hello wav world"
    val wav = Multimodal.textToWav(text)
    val Some((ch, rate, bits, n, rms)) = Multimodal.decodeWav(wav)
    assert(ch == 1 && rate == 8000 && bits == 16 && n == text.length.toLong)
    assert(rms > 0.0)
    // malformed bytes are rejected, and audioFeatures drops them
    assert(Multimodal.decodeWav("RIFFnope".getBytes).isEmpty)
    // adversarial chunk lengths must terminate, not stall or crash:
    // a length whose word-aligned advance is zero (0xFFFFFFF8 = -8 as
    // a signed int) previously looped forever; a huge one overflowed
    // the offset negative and threw
    def evil(len: Long): Array[Byte] = {
      val bytes = wav.clone()
      // overwrite the first chunk header after "WAVE" with a bad length
      bytes(16) = (len & 0xFF).toByte
      bytes(17) = ((len >> 8) & 0xFF).toByte
      bytes(18) = ((len >> 16) & 0xFF).toByte
      bytes(19) = ((len >> 24) & 0xFF).toByte
      bytes
    }
    assert(Multimodal.decodeWav(evil(0xFFFFFFF8L)).isEmpty)
    assert(Multimodal.decodeWav(evil(0x7FFFFFFFL)).isEmpty)
    val mixed = Seq(
      Multimodal.MediaRow(0L, "audio/wav", wav, Map.empty),
      Multimodal.MediaRow(1L, "audio/wav", Array.fill[Byte](10)(1), Map.empty)).toDS()
    val feats = Multimodal.audioFeatures(mixed).collect()
    assert(feats.length == 1 && feats.head.doc_id == 0L &&
      feats.head.duration_ms == text.length * 1000L / 8000)
  }

  test("multimodal: frame sampling explodes deterministic digests") {
    val video = Seq((0L, Array.fill[Byte](5000)(7))).toDF("doc_id", "content")
    val frames = Multimodal.sampleFrames(video).select("doc_id", "frame_idx", "frame_digest")
    assert(frames.count() == 3) // ceil(5000/1024)=5 frames, every 2nd: 0,2,4
  }

  test("multimodal: AVI encode→decode round-trip (RIFF container walk)") {
    val text = "x" * 200 // 200 bytes / 64 per frame = 4 frames
    val avi = Multimodal.textToAvi(text)
    val Some((w, h, usPerFrame, frames)) = Multimodal.decodeAvi(avi)
    assert(w == 8 && h == 8 && usPerFrame == 250000 && frames.length == 4)
    // every frame payload is a real JPEG the ImageIO codec accepts
    frames.foreach { f =>
      val Some((fw, fh, _, emb)) = Multimodal.decodeImage(f)
      assert(fw == 8 && fh == 8 && emb.length == 16)
    }
    // empty text still produces one (black) frame
    val Some((_, _, _, one)) = Multimodal.decodeAvi(Multimodal.textToAvi(""))
    assert(one.length == 1)
    // non-AVI RIFF (a WAV) and junk are rejected
    assert(Multimodal.decodeAvi(Multimodal.textToWav("hi")).isEmpty)
    assert(Multimodal.decodeAvi(Array.fill[Byte](100)(3)).isEmpty)
  }

  test("multimodal: decodeAvi terminates on corrupted chunk lengths") {
    // negative le32 chunk length (-8) used to stall the RIFF walk — the
    // advance `dataOff + len + (len & 1)` lands back on `off` forever
    val avi = Multimodal.textToAvi("corrupt me")
    def le32(buf: Array[Byte], off: Int, v: Int): Unit = {
      buf(off) = (v & 0xFF).toByte; buf(off + 1) = ((v >> 8) & 0xFF).toByte
      buf(off + 2) = ((v >> 16) & 0xFF).toByte; buf(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    // find the first 00dc chunk and poison its length field
    val idx = avi.sliding(4).indexWhere(_.sameElements("00dc".getBytes))
    assert(idx > 0)
    val negLen = avi.clone(); le32(negLen, idx + 4, -8)
    Multimodal.decodeAvi(negLen) // must return (any value), not hang
    val hugeLen = avi.clone(); le32(hugeLen, idx + 4, Int.MaxValue)
    Multimodal.decodeAvi(hugeLen) // Int-overflow advance must saturate
    // truncated header chunk length inside LIST hdrl
    val negHdr = avi.clone(); le32(negHdr, 12 + 4, -2)
    Multimodal.decodeAvi(negHdr)
  }

  test("multimodal: videoFeatures decodes real frames with stride, deterministic") {
    val docs = Tables(spark, sf("0.001")).documents.limit(20)
    val media = Multimodal.aviFromDocuments(docs)
    val rows = Multimodal.videoFeatures(media, everyN = 2, batchSize = 8).collect()
    assert(rows.nonEmpty)
    // stride: only even frame indices survive, per-doc count matches n_frames
    assert(rows.forall(r => r.frame_idx % 2 == 0))
    val perDoc = rows.groupBy(_.doc_id)
    assert(perDoc.size == 20)
    perDoc.values.foreach { fs =>
      val n = fs.head.n_frames
      assert(fs.map(_.frame_idx).sorted.toSeq == Range(0, n, 2).toSeq)
      assert(fs.forall(r => r.width == 8 && r.height == 8 &&
        r.duration_ms == n * 250L &&
        r.embedding.length == 16 &&
        r.embedding.forall(v => v >= 0f && v <= 1f)))
    }
    // bright text bytes → nonzero luma on a populated frame
    assert(rows.filter(_.frame_idx == 0).forall(_.embedding.sum > 0f))
    // determinism across runs and batch sizes
    val again = Multimodal.videoFeatures(media, everyN = 2, batchSize = 3).collect()
    assert(rows.sortBy(r => (r.doc_id, r.frame_idx)).map(_.embedding.toSeq).toSeq ==
      again.sortBy(r => (r.doc_id, r.frame_idx)).map(_.embedding.toSeq).toSeq)
  }

  test("JATS: XSLT maps TEI title/authors/abstract") {
    val tei = """<TEI xmlns="http://www.tei-c.org/ns/1.0"><teiHeader><fileDesc>""" +
      """<titleStmt><title level="a" type="main">A Title</title></titleStmt>""" +
      """<sourceDesc><biblStruct><analytic><author><persName>""" +
      """<forename type="first">Jane</forename><surname>Doe</surname>""" +
      """</persName></author></analytic></biblStruct></sourceDesc></fileDesc>""" +
      """<profileDesc><abstract><p>An abstract.</p></abstract></profileDesc>""" +
      """</teiHeader><text><body/><back/></text></TEI>"""
    val jats = Jats.transform(tei)
    assert(jats.contains("<article-title>A Title</article-title>"))
    assert(jats.contains("<surname>Doe</surname>"))
    assert(jats.contains("<given-names>Jane</given-names>"))
    assert(jats.contains("<abstract><p>An abstract.</p></abstract>"))

    val df = Jats.serialize(Seq((0L, tei)).toDF("doc_id", "tei"))
    assert(df.collect().head.getString(1).contains("<article-title>A Title</article-title>"))
  }

  test("JATS: hi-rend unwraps by default, opt-in <b>/<i> via parameters") {
    // tei_to_jats_xslt_test.py:530-579
    val tei = """<TEI xmlns="http://www.tei-c.org/ns/1.0"><teiHeader>""" +
      """<fileDesc><titleStmt><title level="a" type="main">T</title>""" +
      """</titleStmt></fileDesc></teiHeader><text><body><div>""" +
      """<head><hi rend="italic">Introduction</hi></head>""" +
      """<p>plain <hi rend="bold">bold text</hi> and """ +
      """<hi rend="italic">italic text</hi> end</p>""" +
      """</div></body><back/></text></TEI>"""
    val off = Jats.transform(tei)
    assert(off.contains("<title>Introduction</title>"), off)
    assert(off.contains("<p>plain bold text and italic text end</p>"), off)
    val on = Jats.transform(tei,
      Map("output_bold" -> "true", "output_italic" -> "true"))
    assert(on.contains("<title><i>Introduction</i></title>"), on)
    assert(on.contains("<p>plain <b>bold text</b> and <i>italic text</i> end</p>"), on)
    // raw-table cell keeps text around styled runs
    val rawTable = """<TEI xmlns="http://www.tei-c.org/ns/1.0"><teiHeader>""" +
      """<fileDesc><titleStmt><title level="a" type="main">T</title>""" +
      """</titleStmt></fileDesc></teiHeader><text><body><div>""" +
      """<figure type="table">before <hi rend="bold">mid</hi> after</figure>""" +
      """</div></body><back/></text></TEI>"""
    assert(Jats.transform(rawTable).contains("<td>before mid after</td>"))
  }

  test("JATS: body divs become secs with xrefs, figures and ack map to JATS shapes") {
    val tei = """<TEI xmlns="http://www.tei-c.org/ns/1.0"><teiHeader><fileDesc>""" +
      """<titleStmt><title level="a" type="main">A Title</title></titleStmt>""" +
      """</fileDesc></teiHeader><text><body>""" +
      """<div><head n="1.">Methods</head>""" +
      """<p>See <ref type="bibr" target="#b0">[1]</ref> and """ +
      """<ref type="figure" target="#fig_0">Figure 1</ref>.</p>""" +
      """<figure xml:id="fig_0"><head>Figure 1</head><label>Figure 1</label>""" +
      """<figDesc>A diagram</figDesc></figure>""" +
      """<figure type="table" xml:id="tab_0"><head>Table 1</head>""" +
      """<figDesc>Results</figDesc></figure></div></body>""" +
      """<back><div type="acknowledgement"><head>Acknowledgements</head>""" +
      """<p>we thank everyone</p></div></back></text></TEI>"""
    val jats = Jats.transform(tei)
    assert(jats.contains("<sec><title>Methods</title>"), jats)
    assert(jats.contains("""<xref ref-type="bibr" rid="b0">[1]</xref>"""), jats)
    assert(jats.contains("""<xref ref-type="fig" rid="fig_0">Figure 1</xref>"""), jats)
    assert(jats.contains("""<fig id="fig_0"><object-id>fig_0</object-id>""" +
      "<label>Figure 1</label>"), jats)
    assert(jats.contains("""<table-wrap id="tab_0">"""), jats)
    assert(jats.contains("<ack><sec><title>Acknowledgements</title>" +
      "<p>we thank everyone</p></sec></ack>"), jats)
  }

  test("JATS: listBibl maps to ref-list; bibliography authors stay out of contribs") {
    val tei = """<TEI xmlns="http://www.tei-c.org/ns/1.0"><teiHeader><fileDesc>""" +
      """<titleStmt><title level="a" type="main">A Title</title></titleStmt>""" +
      """<sourceDesc><biblStruct><analytic><author><persName>""" +
      """<forename type="first">Jane</forename><surname>Doe</surname>""" +
      """</persName></author></analytic></biblStruct></sourceDesc></fileDesc>""" +
      """</teiHeader><text><body/><back><div type="references"><listBibl>""" +
      """<biblStruct xml:id="b0"><analytic>""" +
      """<title level="a" type="main">Measuring Things</title>""" +
      """<author><persName><forename type="first">Alice</forename>""" +
      """<surname>Smith</surname></persName></author></analytic>""" +
      """<monogr><title level="j">J. Results</title><imprint>""" +
      """<date type="published" when="2020"/>""" +
      """<biblScope unit="volume">12</biblScope>""" +
      """<biblScope unit="page" from="123" to="127"/>""" +
      """</imprint></monogr></biblStruct>""" +
      """</listBibl></div></back></text></TEI>"""
    val jats = Jats.transform(tei)
    assert(jats.contains(
      """<ref id="b0"><element-citation publication-type="journal">"""), jats)
    assert(jats.contains("""<person-group person-group-type="author"><name>""" +
      "<surname>Smith</surname><given-names>Alice</given-names></name></person-group>"), jats)
    assert(jats.contains("<article-title>Measuring Things</article-title>"), jats)
    assert(jats.contains("<source>J. Results</source>"), jats)
    assert(jats.contains("<year>2020</year>") && jats.contains("<volume>12</volume>"), jats)
    assert(jats.contains("<fpage>123</fpage><lpage>127</lpage>"), jats)
    // the article contrib-group contains ONLY the header author
    val contribs = jats.substring(
      jats.indexOf("""<contrib-group content-type="author">"""),
      jats.indexOf("</contrib-group>"))
    assert(contribs.contains("Doe") && !contribs.contains("Smith"), contribs)
  }

  test("lexicon membership via broadcast join flag") {
    val toks = Seq((0L, "France"), (1L, "banana"), (2L, "GERMANY"))
      .toDF("id", "text")
    val lex = Seq("france", "germany").toDF("word")
    val flagged = Lexicon.membershipFlag(toks, lex)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("in_lexicon")).toMap
    assert(flagged == Map(0L -> "1", 1L -> "0", 2L -> "1"))
  }

  test("TEI-XML lexicon: every cell text becomes a case-insensitive entry") {
    // lookup/xml_lookup_test.py — the GROBID country-table format
    val dir = java.nio.file.Files.createTempDirectory("lex").toFile
    try {
      val xml = """<TEI xmlns="http://www.tei-c.org/ns/1.0"><text><body>""" +
        """<div><table><row>""" +
        """<cell role="a2code">GB</cell><cell role="a3code">GBR</cell>""" +
        """<cell role="name">UNITED KINGDOM</cell><cell role="name">UK</cell>""" +
        """</row></table></div></body></text></TEI>"""
      java.nio.file.Files.write(
        new java.io.File(dir, "country.xml").toPath,
        xml.getBytes("UTF-8"))
      val lex = Lexicon.fromTeiXmlFile(spark, dir.getAbsolutePath)
      val words = lex.collect().map(_.getString(0)).toSet
      assert(words == Set("gb", "gbr", "united kingdom", "uk"))
      // nested cells: outer keeps its full subtree text, inner is its
      // own entry (lxml //tei:cell semantics)
      val nestedXml = """<TEI xmlns="http://www.tei-c.org/ns/1.0">""" +
        """<text><body><table><row>""" +
        """<cell>United <cell>Kingdom</cell></cell>""" +
        """</row></table></body></text></TEI>"""
      java.nio.file.Files.write(
        new java.io.File(dir, "nested.xml").toPath,
        nestedXml.getBytes("UTF-8"))
      val nested = Lexicon.fromTeiXmlFile(
          spark, new java.io.File(dir, "nested.xml").getAbsolutePath)
        .collect().map(_.getString(0)).toSet
      assert(nested == Set("united kingdom", "kingdom"), nested)
      // contains() is lower-cased membership; merged() is any-of
      val toks = Seq((0L, "uk"), (1L, "GB"), (2L, "OTHER"), (3L, "france"))
        .toDF("id", "text")
      val merged = Lexicon.merged(Seq(lex, Seq("france").toDF("word")))
      val flagged = Lexicon.membershipFlag(toks, merged)
        .collect().map(r => r.getLong(0) -> r.getAs[String]("in_lexicon")).toMap
      assert(flagged == Map(0L -> "1", 1L -> "1", 2L -> "0", 3L -> "1"))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }
}
