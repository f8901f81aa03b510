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

  test("windowed event stats from a FILE source match the batch aggregation") {
    // same watermark+window plan fed by a parquet directory — the
    // production shape (no driver-collected MemoryStream feed); a sentinel
    // file lands later to advance the watermark so every window closes
    val dir = java.nio.file.Files.createTempDirectory("graft_filesrc").toString
    val ev = graft.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .select(col("ts"), col("event_type"), col("value").cast("double"))
    ev.write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(ev.schema).parquet(s"$dir/in")
    val out = StreamingOps.windowedEventStats(stream, watermarkDelay = "1 hour", windowLen = "1 day")
    val query = out.writeStream.format("memory").queryName("filewinstats").outputMode("append").start()
    try {
      query.processAllAvailable()
      val maxTs = ev.agg(max("ts")).head.getTimestamp(0)
      Seq((new java.sql.Timestamp(maxTs.getTime + 40L * 24 * 3600 * 1000), "__sentinel", 0.0))
        .toDF("ts", "event_type", "value").write.mode("append").parquet(s"$dir/in")
      query.processAllAvailable()
    } finally query.stop()
    def shaped(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("event_type") =!= "__sentinel")
      .select(
        col("window_start"),
        col("event_type"),
        col("n_events"),
        round(col("sum_value"), 2).as("sum_value"), // sums rounded: partial-agg order differs
        col("min_value"),
        col("max_value"))
      .collect().toSet
    val batch = ev
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum("value").as("sum_value"),
        min("value").as("min_value"),
        max("value").as("max_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"), col("min_value"), col("max_value"))
    val streamedSet = shaped(spark.table("filewinstats"))
    assert(streamedSet.nonEmpty)
    assert(streamedSet == shaped(batch))
    spark.catalog.dropTempView("filewinstats")
  }
}
