package graft.vector

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.{Encoder, Encoders}

/** Mutable sum+count buffer for [[VectorMean]]. */
case class VecBuf(sum: Array[Double], n: Long)

/** Element-wise mean of a group of float vectors (the reference's centroid
  * computation: `np.mean(axis=0)` / `meanRows`, quake_min.py:85,108,122 ∥
  * adaptive_ivf.mjs:58-68) as a typed `Aggregator`.
  *
  * Why an Aggregator and not `posexplode` + `groupBy(pos).avg`: the explode
  * multiplies the shuffle volume by the vector dimension (64×); this
  * aggregator ships one partial `(sum[d], count)` buffer per map partition
  * per group — Catalyst runs it with map-side partial aggregation, so at
  * cluster scale the shuffle is O(#groups · d) doubles regardless of row
  * count. Accumulation is in double, matching the reference's float64 mean
  * before the float32 cast.
  */
object VectorMean extends Aggregator[Seq[Float], VecBuf, Seq[Float]] {
  override def zero: VecBuf = VecBuf(Array.empty[Double], 0L)

  override def reduce(b: VecBuf, a: Seq[Float]): VecBuf = {
    if (a == null) return b
    val s = if (b.sum.length == 0) new Array[Double](a.length) else b.sum
    var i = 0
    while (i < a.length) { s(i) += a(i); i += 1 }
    VecBuf(s, b.n + 1)
  }

  override def merge(x: VecBuf, y: VecBuf): VecBuf = {
    if (x.sum.length == 0) return y
    if (y.sum.length == 0) return x
    val s = x.sum.clone()
    var i = 0
    while (i < s.length) { s(i) += y.sum(i); i += 1 }
    VecBuf(s, x.n + y.n)
  }

  override def finish(r: VecBuf): Seq[Float] =
    if (r.n == 0L) Seq.empty[Float]
    else {
      val out = new Array[Float](r.sum.length)
      var i = 0
      while (i < out.length) { out(i) = (r.sum(i) / r.n).toFloat; i += 1 }
      out.toSeq
    }

  override def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
  override def outputEncoder: Encoder[Seq[Float]] = ExpressionEncoder()

  /** Untyped column form, usable in `df.groupBy(...).agg(VectorMean.fn(col))`. */
  lazy val fn: UserDefinedFunction = udaf(this, ExpressionEncoder[Seq[Float]]())
}
