package graft.streaming

import graft.index.{IvfModel, IvfMutate}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** [engine-added, SURVEY.md §7.5 stretch] Structured Streaming surface.
  *
  * The reference has no streaming runtime — its "online" inserts are
  * synchronous method calls in a single-threaded loop (run_demo.py:57-84).
  * The Spark-native equivalent is micro-batch ingestion: a stream of
  * `(vec_id, embedding)` rows lands in the IVF index via `foreachBatch`
  * reusing the exact batch-mutation path ([[graft.index.IvfMutate]]), so
  * streaming and batch writes share one code path and one semantics.
  *
  * Event-time analytics use the standard watermark + window machinery;
  * at 100 TB/day these are the same shuffles as the batch queries, with
  * state bounded by the watermark horizon.
  */
object StreamingOps {

  /** Continuous ingestion: each micro-batch is routed/inserted with the
    * batch insert (quake_min.py:92-109 semantics at batch granularity).
    * The evolving model is handed to `onUpdate` after every batch —
    * callers persist/broadcast it as they see fit. */
  def ingest(
      stream: DataFrame,
      initial: IvfModel,
      checkpointDir: String,
      onUpdate: IvfModel => Unit): StreamingQuery = {
    val state = new java.util.concurrent.atomic.AtomicReference[IvfModel](initial)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val next = IvfMutate.insert(
          state.get(),
          batch.select(col("vec_id").cast("long").as("vec_id"), col("embedding")))
        // truncate lineage AND re-bound the RDD partition count every batch
        // (streaming runs unbounded epochs — without the coalesce inside
        // IvfMutate.checkpoint, each micro-batch's union appends sliver
        // partitions forever), then drop the superseded epoch's cache
        val old = next.vectors
        val checked = IvfMutate.checkpoint(next)
        old.unpersist()
        state.set(checked)
        onUpdate(checked)
      }
      .start()
  }

  /** Event-time tumbling-window stats with late-data handling: the
    * streaming form of the batch q15 (same agg, plus watermark bounds on
    * state). `events` must carry `ts timestamp, event_type string,
    * value double`. */
  def windowedEventStats(events: DataFrame, watermarkDelay: String, windowLen: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum("value").as("sum_value"),
        min("value").as("min_value"),
        max("value").as("max_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"),
        col("n_events"),
        col("sum_value"),
        col("min_value"),
        col("max_value"))
}
