package graft.vector

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k buffer: keeps at most 2k candidates between trims so the
  * amortized cost stays O(log k) per row without a heap encoder. */
case class TopKBuf(ds: Array[Double], ids: Array[Long])

/** Per-group top-k as a typed `Aggregator` with map-side partial
  * aggregation — the scale-correct alternative to `row_number` over a
  * window: the window form shuffles EVERY candidate row to its query's
  * reducer (O(total candidates)), while this aggregator ships at most k
  * rows per query per map partition (O(#queries · k · #partitions)). The
  * same partial-selection idea as the reference's `argpartition`
  * (quake_min.py:16-20), distributed.
  *
  * Ordering: ascending (value, id) — identical tie-breaking to the window
  * form (parity-tested).
  */
class TopKAgg(k: Int) extends Aggregator[(Long, Double, Long), TopKBuf, Seq[(Double, Long)]] {

  override def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)

  private def trim(b: TopKBuf): TopKBuf =
    if (b.ds.length <= k) b
    else {
      val idx = b.ds.indices.sortBy(i => (b.ds(i), b.ids(i))).take(k)
      TopKBuf(idx.map(b.ds).toArray, idx.map(b.ids).toArray)
    }

  override def reduce(b: TopKBuf, a: (Long, Double, Long)): TopKBuf = {
    val nb = TopKBuf(b.ds :+ a._2, b.ids :+ a._3)
    if (nb.ds.length >= 2 * k) trim(nb) else nb
  }

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf =
    trim(TopKBuf(x.ds ++ y.ds, x.ids ++ y.ids))

  override def finish(b: TopKBuf): Seq[(Double, Long)] = {
    val t = trim(b)
    t.ds.zip(t.ids).sortBy(identity).toSeq
  }

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TopK {
  /** Per-query top-k over candidate rows `(query_id, dist2, vec_id, ...)`
    * via [[TopKAgg]]. Output matches the window form bit-for-bit:
    * `(query_id, rank, vec_id, dist2)`. */
  def perQuery(cands: DataFrame, k: Int): DataFrame = {
    val spark = cands.sparkSession
    import spark.implicits._
    cands
      .select(col("query_id").cast("long"), col("dist2").cast("double"), col("vec_id").cast("long"))
      // null distances (corrupt rows) can't beat any real neighbor; the
      // window form ranks them last, the heap simply drops them
      .filter(col("dist2").isNotNull)
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .agg(new TopKAgg(k).toColumn.name("topk"))
      .flatMap { case (qid, top) =>
        top.iterator.zipWithIndex.map { case ((d, id), i) => (qid, i + 1, id, d) }
      }
      .toDF("query_id", "rank", "vec_id", "dist2")
  }
}
