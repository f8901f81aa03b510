package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The round-12 real-codec additions: multi-frame GIF (LZW video stand-in)
  * and G.711 µ-law audio round-trips. */
class GifUlawSpec extends SparkSpec {
  import spark.implicits._

  test("animated GIF round-trip: every frame decodes to its exact fill color") {
    val spec = Seq(
      (1L, 7, 5, Seq(13, 255, 1), Seq(200, 0, 2), Seq(77, 128, 3)),
      (2L, 3, 9, Seq(0, 250), Seq(255, 250), Seq(9, 250)))
      .toDF("asset_id", "width", "height", "fr_r", "fr_g", "fr_b")
    val gif = MultimodalOps.encodeAnimatedGif(spec)
    val frames = MultimodalOps.decodeGifFrames(gif, "asset_id", "content")
      .filter(col("decoded"))
      .orderBy("asset_id", "frame")
      .select("asset_id", "frame", "width", "height", "sum_r", "sum_g", "sum_b", "n_px")
      .as[(Long, Int, Int, Int, Long, Long, Long, Int)]
      .collect()
    assert(frames.count(_._1 == 1L) == 3 && frames.count(_._1 == 2L) == 2)
    val expect = Map(
      1L -> (7, 5, Seq((13, 200, 77), (255, 0, 128), (1, 2, 3))),
      2L -> (3, 9, Seq((0, 255, 9), (250, 250, 250))))
    frames.foreach { case (id, k, w, h, sr, sg, sb, npx) =>
      val (ew, eh, colors) = expect(id)
      assert(w == ew && h == eh && npx == ew * eh)
      val (r, g, b) = colors(k)
      assert(sr == r.toLong * npx && sg == g.toLong * npx && sb == b.toLong * npx,
        s"frame ($id,$k): sums ($sr,$sg,$sb) != uniform fill ($r,$g,$b) * $npx")
    }
  }

  test("GIF payload is genuinely LZW-compressed vs raw RGB frames") {
    val spec = Seq((1L, 16, 12, Seq(10, 20, 30, 40), Seq(1, 2, 3, 4), Seq(5, 6, 7, 8)))
      .toDF("asset_id", "width", "height", "fr_r", "fr_g", "fr_b")
    val bytes = MultimodalOps.encodeAnimatedGif(spec)
      .select(length(col("content"))).as[Int].head()
    assert(bytes < 16 * 12 * 3 * 4, s"gif $bytes bytes should beat raw ${16 * 12 * 3 * 4}")
    assert(bytes > 0)
  }

  test("undecodable GIF payload yields a decoded=false row, not a failure") {
    val junk = Seq((9L, Array[Byte](71, 73, 70, 1, 2, 3))).toDF("asset_id", "content")
    val out = MultimodalOps.decodeGifFrames(junk, "asset_id", "content").collect()
    assert(out.length == 1 && !out.head.getBoolean(1))
  }

  test("ulaw round-trip: 2:1 bytes, error <= 512, no sign flips, deterministic") {
    val spec = Seq((1L, 500, 8000, 3L), (2L, 801, 16000, 7L))
      .toDF("asset_id", "n_samples", "sample_rate", "seed")
    val run = () => MultimodalOps.ulawRoundtrip(spec)
      .orderBy("asset_id")
      .select("asset_id", "n_samples", "sample_rate", "ulaw_bytes", "max_abs_err", "sign_viol")
      .as[(Long, Int, Int, Int, Int, Int)]
      .collect()
      .toSeq
    val out = run()
    out.foreach { case (id, n, _, ub, err, sv) =>
      assert(ub == n, s"asset $id: ulaw must be 1 byte/sample (2:1), got $ub for $n")
      assert(err <= 512 && err > 0, s"asset $id: round-trip err $err outside (0, 512]")
      assert(sv == 0, s"asset $id: $sv sign violations")
    }
    assert(run() == out, "codec round-trip must be deterministic")
  }
}
