package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AudioDecimateSpec extends SparkSpec {
  import spark.implicits._

  private def sample(seed: Long, i: Int): Long =
    java.lang.Math.floorMod(seed * 31L + i * 7919L, 65536L) - 32768L

  test("decimated samples are the exact floorDiv block means of the source formula") {
    val spec = Seq((1L, 100, 8000, 5L)).toDF("asset_id", "n_samples", "sample_rate", "seed")
    val enc = MultimodalOps.encodePcmWav(spec)
    val half = MultimodalOps.decimatePcmWav(enc, "asset_id", "content", factor = 2)
    val feats = MultimodalOps.audioFrameFeatures(half, "asset_id", "content", frameLen = 50)
      .select("frame_idx", "n", "sum_sq").as[(Int, Int, Long)].collect()
    assert(feats.length == 1 && feats.head._2 == 50) // 100 samples → 50 decimated, one frame
    val expectedSumSq = (0 until 50).map { j =>
      val v = java.lang.Math.floorDiv(sample(5L, 2 * j) + sample(5L, 2 * j + 1), 2L)
      v * v
    }.sum
    assert(feats.head._3 == expectedSumSq)
  }

  test("factor 1 is a lossless re-encode; odd trailing sample is cropped") {
    val spec = Seq((1L, 101, 8000, 9L)).toDF("asset_id", "n_samples", "sample_rate", "seed")
    val enc = MultimodalOps.encodePcmWav(spec)
    def stats(df: org.apache.spark.sql.DataFrame) =
      MultimodalOps.decodeWavAudio(df, "asset_id", "content")
        .select("n_samples", "s_sum").as[(Long, Long)].head()
    assert(stats(MultimodalOps.decimatePcmWav(enc, "asset_id", "content", 1)) == stats(enc))
    val (n2, _) = stats(MultimodalOps.decimatePcmWav(enc, "asset_id", "content", 2))
    assert(n2 == 50) // 101 → 50 blocks, trailing sample dropped
  }

  test("undecodable payloads drop instead of failing the partition") {
    val junk = Seq((9L, Array[Byte](1, 2, 3, 4))).toDF("asset_id", "content")
    assert(MultimodalOps.decimatePcmWav(junk, "asset_id", "content", 2).count() == 0)
  }
}
