package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("column interleave matches the reference bit loop on a deterministic sample") {
    val pairs = (0 until 2000).map { i =>
      // LCG-spread 16-bit values, covers high/low bit patterns
      val a = (i * 40503 + 13) & 0xFFFF
      val b = (i * 30013 + 7) & 0xFFFF
      (a, b)
    }
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        ZOrder.interleave(col("a").cast("long"), col("b").cast("long")).as("z"))
      .as[(Int, Int, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == ZOrder.interleaveRef(a, b), s"interleave($a, $b) = $z != ref")
    }
  }

  test("z-range buckets are 2-D locality boxes: each bucket's span is a dyadic tile") {
    // bucket = z >> 12 keeps bit-pairs 6.. of both dims → within a bucket,
    // each dim varies only in its low 6 bits (span < 64)
    val df = spark.range(20000).select(
      (col("id") * 7919 % 1024).as("a"), (col("id") * 104729 % 1024).as("b"))
    val spans = df
      .withColumn("bucket", shiftright(ZOrder.interleave(col("a"), col("b")), 12))
      .groupBy("bucket")
      .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
      .agg(max("sa"), max("sb")).as[(Long, Long)].head()
    assert(spans._1 < 64 && spans._2 < 64,
      s"bucket dimension spans must stay inside the 64×64 tile, got $spans")
  }

  test("zone-map pruning is complete: every box match lives in a candidate bucket") {
    val df = spark.range(20000).select(
      (col("id") * 7919 % 1024).as("a"), (col("id") * 104729 % 1024).as("b"))
      .withColumn("bucket", shiftright(ZOrder.interleave(col("a"), col("b")), 12))
    val (alo, ahi, blo, bhi) = (100L, 180L, 200L, 300L)
    val zones = df.groupBy("bucket").agg(
      min("a").as("amin"), max("a").as("amax"), min("b").as("bmin"), max("b").as("bmax"))
    val candidates = zones
      .filter(col("amin") <= ahi && col("amax") >= alo && col("bmin") <= bhi && col("bmax") >= blo)
      .select("bucket")
    val matches = df.filter(col("a").between(alo, ahi) && col("b").between(blo, bhi))
    val escaped = matches.join(candidates, Seq("bucket"), "left_anti").count()
    assert(escaped == 0, s"$escaped matching rows outside candidate buckets")
    // and the zone map must genuinely skip — pruning is the point
    val (total, kept) = (zones.count(), candidates.count())
    assert(kept < total / 2, s"no real pruning: $kept of $total buckets survive")
    assert(matches.count() > 0, "box must be non-empty or completeness is vacuous")
  }
}
