package graft.vector

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity between two
  * `array<float>` columns with full whole-stage-codegen support: ONE
  * primitive float loop accumulates the dot product and both squared
  * norms — no lambda dispatch, no boxing, no intermediate arrays. The
  * HOF form ([[VectorOps.cosineHof]]) walks the pair THREE times
  * (`zip_with`+`aggregate` for dot, `aggregate` per norm) and
  * materializes a products array per row; on an all-pairs similarity
  * stage (d09 scans ~28M in-cluster pairs at sf0.1) that tripled walk
  * was the dominant query cost.
  *
  * Bit-compatibility contract: the result is EXACTLY
  * `dot / (sqrt(ssqA) * sqrt(ssqB))` with every accumulator summed in
  * ascending element order in double — the same value DAG as the HOF
  * form and the DuckDB oracles' `list_sum(list_transform(...))`
  * replays, so swapping this in changes NO hash-certified output
  * (parity-pinned ulp-exact in VectorOpsSpec).
  *
  * Zero-norm inputs yield NaN (0/0 in raw IEEE). This is the ONE
  * deliberate divergence from the HOF twin: Spark 4's ANSI mode makes
  * the HOF's `Divide` THROW on a zero divisor, and a single degenerate
  * zero vector must not kill a corpus-scale job — NaN compares false
  * against every similarity threshold, so the row simply never
  * surfaces. Length-mismatched inputs yield NULL (zip_with
  * padding-null semantics, same as [[L2Squared]]). Both pinned in
  * VectorOpsSpec.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> inputs, got ${left.dataType} and ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  /** NULL on length mismatch even for non-null inputs — see [[L2Squared]]
    * for why the override is load-bearing under codegen. */
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      while (i < n) {
        val xi = x.getFloat(i).toDouble
        val yi = y.getFloat(i).toDouble
        dot += xi * yi
        na += xi * xi
        nb += yi * yi
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  double $na = 0.0;
         |  double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $xi = (double) $a.getFloat($i);
         |    final double $yi = (double) $b.getFloat($i);
         |    $dot += $xi * $yi;
         |    $na += $xi * $xi;
         |    $nb += $yi * $yi;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}
