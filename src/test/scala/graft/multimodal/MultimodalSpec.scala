package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** 16-byte header (magic GRFT | width | height | channels) + payload. */
  private def fakeAsset(width: Int, height: Int, channels: Int, payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + payload.length)
    bb.put("GRFT".getBytes("UTF-8")).putInt(width).putInt(height).putInt(channels).put(payload)
    bb.array()
  }

  private val payload = (0 until 100).map(_.toByte).toArray
  private lazy val assets = MultimodalOps.toAssets(
    Seq((1L, fakeAsset(640, 480, 3, payload))).toDF("id", "bin"),
    "id", "bin", "image")

  test("toAssets parses the stub header into typed metadata") {
    val m = assets.select("meta.width", "meta.height", "meta.channels", "meta.n_bytes").head
    assert(m.getInt(0) == 640 && m.getInt(1) == 480 && m.getInt(2) == 3)
    assert(m.getLong(3) == 116L)
  }

  test("extractFeatures produces a normalized 16-bucket byte histogram + stable checksum") {
    val r = MultimodalOps.extractFeatures(assets).head
    val hist = r.getSeq[Float](1)
    assert(hist.length == 16)
    assert(math.abs(hist.sum - 1.0f) < 1e-5)
    // bytes 0..99: buckets 0-5 get 16 each, bucket 6 gets 4
    assert(math.abs(hist(0) - 0.16f) < 1e-6 && math.abs(hist(6) - 0.04f) < 1e-6)
    val again = MultimodalOps.extractFeatures(assets).head.getLong(2)
    assert(r.getLong(2) == again)
  }

  /** Encode a real image with the JDK codec: every pixel set to (r,g,b). */
  private def realPng(w: Int, h: Int, rgb: (Int, Int, Int), format: String = "png"): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val packed = (rgb._1 << 16) | (rgb._2 << 8) | rgb._3
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, packed)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, baos)
    baos.toByteArray
  }

  test("decodeImageIO decodes REAL PNG/BMP payloads through the batch plumbing") {
    // rgb (16,32,64): luma = (299*16 + 587*32 + 114*64)/1000 = 30 → bucket 1
    val df = Seq(
      (1L, realPng(4, 3, (16, 32, 64))),
      (2L, realPng(2, 2, (255, 255, 255), format = "bmp")),
      (3L, Array[Byte](1, 2, 3, 4, 5)) // not an image → decoded=false, not a crash
    ).toDF("id", "bin")
    val out = MultimodalOps.decodeImageIO(df, "id", "bin").collect().sortBy(_.getLong(0))
    val png = out(0)
    assert(png.getBoolean(1), "png must decode")
    assert(png.getInt(2) == 4 && png.getInt(3) == 3 && png.getInt(4) == 3)
    val hist = png.getSeq[Float](5)
    assert(hist.length == 16 && math.abs(hist.sum - 1.0f) < 1e-5)
    assert(math.abs(hist(1) - 1.0f) < 1e-6, s"all 12 pixels land in luma bucket 1, got $hist")
    val rgb = png.getSeq[Float](6)
    assert(rgb == Seq(16f, 32f, 64f), s"uniform fill ⇒ exact channel means, got $rgb")
    val bmp = out(1)
    assert(bmp.getBoolean(1) && bmp.getInt(2) == 2 && bmp.getInt(3) == 2)
    assert(math.abs(bmp.getSeq[Float](5).apply(15) - 1.0f) < 1e-6, "white pixels land in bucket 15")
    assert(bmp.getSeq[Float](6) == Seq(255f, 255f, 255f))
    val bad = out(2)
    assert(!bad.getBoolean(1) && bad.isNullAt(2) && bad.isNullAt(5))
  }

  test("encodeUniformImages -> decodeImageIO round-trips real compressed payloads") {
    val spec = Seq((5L, 3, 2, 10, 20, 30)).toDF("asset_id", "width", "height", "r", "g", "b")
    val png = MultimodalOps.encodeUniformImages(spec)
    val bytes = png.head.getAs[Array[Byte]]("content")
    // a real PNG container, not raw pixels: magic bytes \x89PNG
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
    val d = MultimodalOps.decodeImageIO(png, "asset_id", "content").head
    assert(d.getBoolean(1) && d.getInt(2) == 3 && d.getInt(3) == 2)
    assert(d.getSeq[Float](6) == Seq(10f, 20f, 30f))
  }

  test("encodePcmWav -> decodeWavAudio round-trips REAL RIFF/PCM16 through javax.sound") {
    val spec = Seq((7L, 100, 8000, 7L), (8L, 3, 16000, 8L)).toDF("asset_id", "n_samples", "sample_rate", "seed")
    val wav = MultimodalOps.encodePcmWav(spec)
    val bytes = wav.orderBy("asset_id").head.getAs[Array[Byte]]("content")
    assert(new String(bytes.slice(0, 4), "US-ASCII") == "RIFF" &&
      new String(bytes.slice(8, 12), "US-ASCII") == "WAVE", "genuine RIFF container")
    assert(bytes.length == 44 + 2 * 100)
    val out = MultimodalOps.decodeWavAudio(wav, "asset_id", "content")
      .collect().sortBy(_.getLong(0))
    def expected(seed: Long, n: Int): (Int, Int, Long) = {
      val xs = (0 until n).map(i => (((seed * 31 + i * 7919L) % 65536L) - 32768L).toInt)
      (xs.min, xs.max, xs.map(_.toLong).sum)
    }
    val a = out(0)
    assert(a.getBoolean(1) && a.getInt(2) == 8000 && a.getInt(3) == 1 && a.getInt(4) == 100)
    val (mn, mx, sm) = expected(7L, 100)
    assert(a.getInt(5) == mn && a.getInt(6) == mx && a.getLong(7) == sm)
    val b = out(1)
    val (mn2, mx2, sm2) = expected(8L, 3)
    assert(b.getInt(2) == 16000 && b.getInt(4) == 3 && b.getInt(5) == mn2 && b.getInt(6) == mx2 && b.getLong(7) == sm2)
    // garbage bytes must yield decoded=false, not a crash
    val bad = MultimodalOps.decodeWavAudio(
      Seq((9L, Array[Byte](1, 2, 3, 4))).toDF("id", "bin"), "id", "bin").head
    assert(!bad.getBoolean(1) && bad.isNullAt(2))
  }

  test("audioFrameFeatures: per-frame energy/ZCR match the sample formula; partial tail frame; garbage skipped") {
    val spec = Seq((7L, 100, 8000, 7L)).toDF("asset_id", "n_samples", "sample_rate", "seed")
    val wav = MultimodalOps.encodePcmWav(spec)
    val out = MultimodalOps.audioFrameFeatures(wav, "asset_id", "content", frameLen = 32)
      .collect().sortBy(_.getInt(1))
    val xs = (0 until 100).map(i => (((7L * 31 + i * 7919L) % 65536L) - 32768L).toInt)
    assert(out.length == 4) // 32+32+32+4
    out.foreach { r =>
      val f = r.getInt(1)
      val frame = xs.slice(f * 32, math.min(100, f * 32 + 32))
      assert(r.getInt(2) == frame.length)
      assert(r.getLong(3) == frame.map(s => s.toLong * s.toLong).sum)
      val zc = frame.sliding(2).count(p => p.length == 2 && ((p(1) < 0) != (p(0) < 0)))
      assert(r.getInt(4) == zc, s"frame $f zcr")
    }
    // undecodable bytes emit no frames rather than crashing
    val bad = MultimodalOps.audioFrameFeatures(
      Seq((9L, Array[Byte](1, 2, 3))).toDF("id", "bin"), "id", "bin", frameLen = 32)
    assert(bad.count() == 0)
  }

  test("audioStats computes RMS and zero-crossings over 16-bit PCM payload") {
    // payload: alternating +256/-256 samples → every step crosses zero
    val pcm = Array.tabulate(8)(i => if (i % 2 == 0) Array[Byte](1, 0) else Array[Byte](-1, 0)).flatten
    val a = MultimodalOps.toAssets(
      Seq((7L, fakeAsset(4, 1, 1, pcm))).toDF("id", "bin"), "id", "bin", "audio")
    val r = MultimodalOps.audioStats(a).head
    assert(r.getInt(1) == 8)
    assert(math.abs(r.getDouble(2) - 256.0) < 1e-9)
    assert(r.getInt(3) == 7)
  }

  test("resizeStub subsamples the payload and rewrites the width header") {
    val resized = MultimodalOps.resizeStub(assets, targetBytes = 10)
    val r = resized.head
    val bin = r.getAs[Array[Byte]]("content")
    assert(bin.length == 26) // 16 header + 10 pseudo-pixels
    // re-parse through toAssets: width must equal the resized byte count
    import spark.implicits._
    val reparsed = MultimodalOps.toAssets(
      Seq((r.getLong(0), bin)).toDF("id", "bin"), "id", "bin", "image")
    assert(reparsed.select("meta.width").head.getInt(0) == 10)
    // nearest-neighbor: first sampled byte is payload(0)
    assert(bin(16) == payload(0))
  }

  test("resizeStub tolerates truncated (<16-byte) binaries without crashing") {
    val tiny = Seq((9L, Array[Byte](1, 2, 3))).toDF("id", "bin")
    val assets = MultimodalOps.toAssets(tiny, "id", "bin", "image")
    val r = MultimodalOps.resizeStub(assets, targetBytes = 4).head
    assert(r.getAs[Array[Byte]]("content").length == 16) // padded header, empty payload
  }

  test("sampleFrames cuts the payload into strided fixed-size frames") {
    val frames = MultimodalOps.sampleFrames(assets, frameSize = 10, stride = 2).collect()
    // 100-byte payload / 10 = 10 frames, stride 2 -> indices 0,2,4,6,8 -> 5 kept
    assert(frames.length == 5)
    assert(frames.forall(_.getAs[Array[Byte]]("frame").length == 10))
    // frame_idx carries the ORIGINAL frame number, not the sampled rank
    assert(frames.map(_.getAs[Int]("frame_idx")).sorted.toSeq == Seq(0, 2, 4, 6, 8))
    val first = frames.minBy(_.getAs[Int]("frame_idx")).getAs[Array[Byte]]("frame")
    assert(first.toSeq == payload.take(10).toSeq)
    // the frame at original index 4 is payload bytes 40-49
    val third = frames.find(_.getAs[Int]("frame_idx") == 4).get.getAs[Array[Byte]]("frame")
    assert(third.toSeq == payload.slice(40, 50).toSeq)
  }

  test("dHash64 of pattern PNGs equals the analytic hash; banded pairs recover planted twins only") {
    import spark.implicits._
    // real codec in the loop: encode -> PNG bytes -> ImageIO decode ->
    // block-mean downscale -> dHash must equal the pure-arithmetic hash
    // computed from patternBlockValue directly (PNG is lossless and every
    // 8x8 block covers exactly one hash cell)
    val seeds = (0L until 12L)
    val specs = seeds.map(s => (s, s, 0)) ++ seeds.filter(_ % 4 == 0).map(s => (s + 500L, s, 1))
    val imgs = MultimodalOps.encodePatternImages(specs.toDF("asset_id", "seed", "jitter"))
    val got = MultimodalOps.dHash64(imgs, "asset_id", "content")
      .as[(Long, Long)].collect().toMap

    def analytic(seed: Long, jitter: Int): Long = {
      var h = 0L
      for (y <- 0 until 8; x <- 0 until 8)
        if (MultimodalOps.patternBlockValue(seed, x + 1, y, jitter) >
            MultimodalOps.patternBlockValue(seed, x, y, jitter))
          h |= 1L << (y * 8 + x)
      h
    }
    specs.foreach { case (id, seed, j) =>
      assert(got(id) == analytic(seed, j), s"decoded hash of asset $id drifted from analytic")
    }

    val pairs = graft.text.Dedup
      .dhashPairs(MultimodalOps.dHash64(imgs, "asset_id", "content"), maxHamming = 7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = seeds.filter(_ % 4 == 0).map(s => (s, s + 500L)).toSet
    assert(pairs == want, s"expected exactly the planted twin pairs, got $pairs")
  }
}
