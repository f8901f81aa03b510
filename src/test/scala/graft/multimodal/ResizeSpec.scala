package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ResizeSpec extends SparkSpec {
  import spark.implicits._

  test("block-mean resize of uniform-block patterns recovers the exact block values") {
    val spec = Seq((1L, 5L, 0), (2L, 9L, 0)).toDF("asset_id", "seed", "jitter")
    val imgs = MultimodalOps.encodePatternImages(spec, blockPx = 8, cols = 9, rows = 8)
    val thumbs = MultimodalOps.resizeBlockMean(imgs, "asset_id", "content", factor = 8)
    val feats = MultimodalOps.decodeImageIO(thumbs, "asset_id", "content")
      .select("asset_id", "decoded", "width", "height", "mean_rgb")
      .as[(Long, Boolean, Int, Int, Seq[Float])].collect().map(r => r._1 -> r).toMap
    for ((id, seed) <- Seq(1L -> 5L, 2L -> 9L)) {
      val (_, decoded, w, h, rgb) = feats(id)
      assert(decoded && w == 9 && h == 8)
      val expected = (for (by <- 0 until 8; bx <- 0 until 9)
        yield MultimodalOps.patternBlockValue(seed, bx, by, 0)).sum / 72.0
      assert(math.abs(rgb.head - expected) < 1e-3, s"asset $id mean ${rgb.head} != $expected")
      assert(rgb(0) == rgb(1) && rgb(1) == rgb(2), "gray image must have equal channel means")
    }
  }

  test("non-multiple dimensions crop to the tile grid; sub-tile images drop") {
    // 9x8-block pattern at 3-px blocks = 27x24 px; factor 4 → 6x6 thumb (crop 3 px right, 0 bottom)
    val spec = Seq((1L, 7L, 0)).toDF("asset_id", "seed", "jitter")
    val imgs = MultimodalOps.encodePatternImages(spec, blockPx = 3, cols = 9, rows = 8)
    val dims = MultimodalOps.decodeImageIO(
      MultimodalOps.resizeBlockMean(imgs, "asset_id", "content", factor = 4), "asset_id", "content")
      .select("width", "height").as[(Int, Int)].head()
    assert(dims == ((6, 6)))

    // a 2x2 image cannot fill one 8x8 tile → dropped, and junk bytes drop too
    val tiny = MultimodalOps.encodeUniformImages(
      Seq((9L, 2, 2, 10, 20, 30)).toDF("asset_id", "width", "height", "r", "g", "b"))
    val junk = Seq((10L, Array[Byte](1, 2, 3))).toDF("asset_id", "content")
    assert(MultimodalOps.resizeBlockMean(tiny.unionByName(junk), "asset_id", "content", 8).count() == 0)
  }

  test("factor 1 is a lossless PNG re-encode (decode features unchanged)") {
    val spec = Seq((1L, 11, 9, 40, 80, 120)).toDF("asset_id", "width", "height", "r", "g", "b")
    val imgs = MultimodalOps.encodeUniformImages(spec)
    def feats(df: org.apache.spark.sql.DataFrame) =
      MultimodalOps.decodeImageIO(df, "asset_id", "content")
        .select("width", "height", "mean_rgb").as[(Int, Int, Seq[Float])].head()
    assert(feats(MultimodalOps.resizeBlockMean(imgs, "asset_id", "content", 1)) == feats(imgs))
  }
}
