package graft.vector

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression for Hamming distance between two packed
  * bit-code columns (`array<long>`, one code word per element) — the inner
  * kernel of the binary-quantized scan ([[BinaryQuant]]). Whole-stage
  * codegen emits a primitive `Long.bitCount(x ^ y)` loop: no lambda
  * dispatch, no intermediate array — the HOF spelling
  * (`aggregate(zip_with(...))`) allocates a per-row diff list on what is,
  * at 100 TB, the single hottest loop of the scan (same motivation as
  * [[L2Squared]] / [[CosineSim]]).
  *
  * Length-mismatched inputs yield NULL (parity with the zip_with form).
  */
case class HammingDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs, got ${left.dataType} and ${right.dataType}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_dist"

  /** NULL on length mismatch even for non-null inputs — see the
    * [[L2Squared]] nullable note (codegen binds isNull to a literal
    * otherwise and falls back to interpretation). */
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0
      var i = 0
      while (i < n) {
        s += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $s = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): HammingDist =
    copy(left = newLeft, right = newRight)
}
