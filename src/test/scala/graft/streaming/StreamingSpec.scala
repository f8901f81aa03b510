package graft.streaming

import graft.SparkSpec
import graft.index.{IvfBuild, IvfModel}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select("vec_id", "embedding").cache()

  test("streaming ingest inserts micro-batches into the IVF index via foreachBatch") {
    implicit val sqlCtx = spark.sqlContext
    val initial: IvfModel = IvfBuild.build(emb, 64)
    val n0 = initial.totalVectors

    val source = MemoryStream[(Long, Seq[Float])]
    val stream = source.toDF().toDF("vec_id", "embedding")
    val seen = new java.util.concurrent.atomic.AtomicReference[IvfModel](initial)
    val ckpt = java.nio.file.Files.createTempDirectory("ingest").toString
    val query = StreamingOps.ingest(stream, initial, ckpt, seen.set)
    try {
      source.addData((90001L, Seq.fill(64)(0.5f)), (90002L, Seq.fill(64)(-0.5f)))
      query.processAllAvailable()
      assert(seen.get().totalVectors == n0 + 2)
      source.addData((90003L, Seq.fill(64)(0.1f)))
      query.processAllAvailable()
      assert(seen.get().totalVectors == n0 + 3)
      val ids = seen.get().vectors.select("vec_id").as[Long].collect().toSet
      assert(ids.contains(90001L) && ids.contains(90003L))
    } finally query.stop()
  }

  test("windowed event stats aggregate by event-time tumbling window with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = source.toDF().toDF("ts", "event_type", "value")
    val out = StreamingOps.windowedEventStats(events, watermarkDelay = "1 hour", windowLen = "1 hour")
    val query = out.writeStream.format("memory").queryName("winstats").outputMode("append").start()
    try {
      def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
      source.addData((ts(1, 10), "click", 1.0), (ts(1, 40), "click", 2.0), (ts(2, 5), "view", 5.0))
      query.processAllAvailable()
      // advance watermark far enough to close the 01:00 and 02:00 windows
      source.addData((ts(9, 0), "view", 0.0))
      query.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n_events, sum_value FROM winstats ORDER BY window_start, event_type")
        .as[(String, Long, Double)].collect().toSeq
      assert(rows.contains(("click", 2L, 3.0)))
      assert(rows.contains(("view", 1L, 5.0)))
    } finally query.stop()
  }
}
