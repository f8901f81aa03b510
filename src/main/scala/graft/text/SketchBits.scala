package graft.text

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Kernel shared by the interpreted and codegen paths of [[SketchBits]]:
  * one primitive dot-product loop per hyperplane, no per-plane array
  * allocation. Bit-identical to the HOF form (`Dedup.sketchBitsHof`,
  * parity-tested): left-to-right double accumulation, and a
  * length-mismatched vector OR a vector with any null element yields
  * bit 0 (the HOF's zip_with null padding / null product nulls the sum,
  * and `when(null >= 0, …)` falls through to 0).
  */
object SketchBitsKernel {
  def compute(vec: ArrayData, planes: Array[Array[Double]]): ArrayData = {
    val n = planes.length
    val out = new Array[Int](n)
    val m = vec.numElements()
    // HOF parity: a null element nulls every plane's zip_with product sum,
    // and `when(null >= 0, 1).otherwise(0)` falls through to 0 — so one
    // null element zeroes ALL bits (out is zero-initialized).
    var hasNull = false
    var j = 0
    while (j < m && !hasNull) { if (vec.isNullAt(j)) hasNull = true; j += 1 }
    if (!hasNull) {
      var p = 0
      while (p < n) {
        val pl = planes(p)
        if (pl.length != m) {
          out(p) = 0
        } else {
          var s = 0.0
          var i = 0
          while (i < m) { s += vec.getFloat(i).toDouble * pl(i); i += 1 }
          out(p) = if (s >= 0) 1 else 0
        }
        p += 1
      }
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression for the random-hyperplane sign sketch of an
  * `array<float>` vector column: `bits(p) = 1 iff vec · planes(p) ≥ 0`.
  *
  * The HOF formulation (`transform(planesLit, pl -> aggregate(zip_with(
  * vec, pl, …), …))`) materializes a zip_with product array PER PLANE per
  * row — for 32 planes × 64 dims that is 32 transient 64-element arrays
  * per input row, the dominant cost of the cosine-LSH pipelines. This
  * expression runs the same math as primitive loops and participates in
  * whole-stage codegen; the plane matrix rides along as a codegen
  * reference object, not a literal expression tree.
  */
case class SketchBits(child: Expression, planes: Array[Array[Double]]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires an array<float> input, got $other")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "sketch_bits"

  override def nullSafeEval(a: Any): Any =
    SketchBitsKernel.compute(a.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.text.SketchBitsKernel.compute($c, $planesRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): SketchBits =
    copy(child = newChild)
}
