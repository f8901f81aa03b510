package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression converters (Spark 4 moved
  * Column onto ColumnNode; `classic.ExpressionUtils` is the supported
  * conversion point but is package-private). Compiling this one object
  * into the `org.apache.spark.sql` package is the standard third-party-
  * extension technique for registering native Catalyst expressions without
  * a full `SparkSessionExtensions` function registry. Nothing else in the
  * engine lives outside the `graft` namespace. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build a DataFrame from pre-encoded InternalRows (UnsafeRow payloads),
    * skipping the driver-side Row→Catalyst encoder entirely — the encoder
    * walk costs ~0.5 s for a 40k×64 float-array table, the UnsafeRow path
    * ~0.1 s. `internalCreateDataFrame` is `private[sql]`. */
  def internalCreateDataFrame(
      spark: SparkSession,
      rows: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rows, schema)

  /** Register the engine's native SQL functions on a LIVE session (the
    * extensions mechanism only applies at session construction; the
    * registry is package-private). Must cover the same function set as
    * `GraftExtensions` so both documented registration paths agree. */
  def registerFunctions(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2_squared",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"l2_squared requires exactly 2 arguments, got ${exprs.length}")
        graft.vector.L2Squared(exprs(0), exprs(1))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, s"simhash64 requires exactly 1 argument, got ${exprs.length}")
        graft.text.SimHash64(exprs(0))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"cosine_sim requires exactly 2 arguments, got ${exprs.length}")
        graft.vector.CosineSim(exprs(0), exprs(1))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hamming_dist",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"hamming_dist requires exactly 2 arguments, got ${exprs.length}")
        graft.vector.HammingDist(exprs(0), exprs(1))
      },
      "scala_udf")
  }
}
