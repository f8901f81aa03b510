package graft

import graft.vector.L2Squared
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Spark extension point: registers the engine's native expressions as SQL
  * functions so `spark.sql("SELECT l2_squared(a, b) …")` works next to the
  * DataFrame API. Wire it with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (new
  * sessions) or [[GraftExtensions.register]] (an existing session). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("l2_squared"),
        new ExpressionInfo(classOf[L2Squared].getName, "l2_squared"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
          require(exprs.length == 2, s"l2_squared requires exactly 2 arguments, got ${exprs.length}")
          L2Squared(exprs(0), exprs(1))
        }))
    ext.injectFunction(
      (
        FunctionIdentifier("simhash64"),
        new ExpressionInfo(classOf[graft.text.SimHash64].getName, "simhash64"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
          require(exprs.length == 1, s"simhash64 requires exactly 1 argument, got ${exprs.length}")
          graft.text.SimHash64(exprs(0))
        }))
    ext.injectFunction(
      (
        FunctionIdentifier("cosine_sim"),
        new ExpressionInfo(classOf[graft.vector.CosineSim].getName, "cosine_sim"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
          require(exprs.length == 2, s"cosine_sim requires exactly 2 arguments, got ${exprs.length}")
          graft.vector.CosineSim(exprs(0), exprs(1))
        }))
    ext.injectFunction(
      (
        FunctionIdentifier("hamming_dist"),
        new ExpressionInfo(classOf[graft.vector.HammingDist].getName, "hamming_dist"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
          require(exprs.length == 2, s"hamming_dist requires exactly 2 arguments, got ${exprs.length}")
          graft.vector.HammingDist(exprs(0), exprs(1))
        }))
  }
}

object GraftExtensions {
  /** Register into an already-running session's function registry. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.GraftSqlBridge.registerFunctions(spark)
}
