package graft.text

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Kernel shared by the interpreted and codegen paths of [[SimHash64]]:
  * one primitive long loop per token, one int[64] vote array per row.
  *
  * Bit-identical to the higher-order-function formulation in
  * `TextOps.simhash64Hof` (parity-tested): token hash is Spark's own
  * `XxHash64Function` at the default seed 42 — the exact interpreted path
  * of the `xxhash64(tok)` the HOF form evaluates.
  */
object SimHash64Kernel {
  final val Seed = 42L // xxhash64's default seed in Spark

  def compute(toks: ArrayData): Long = {
    val n = toks.numElements()
    val votes = new Array[Int](64)
    var t = 0
    while (t < n) {
      // a null token hashes to the seed — xxhash64's null pass-through
      val h =
        if (toks.isNullAt(t)) Seed
        else XxHash64Function.hash(toks.getUTF8String(t), StringType, Seed)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) != 0L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var res = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) res |= 1L << i
      i += 1
    }
    res
  }
}

/** Kernel for the PORTABLE SimHash ([[PortableSimHash64]]): the same vote
  * loop as [[SimHash64Kernel]] over [[TextOps.tokenHashPortable60]]'s
  * 60-bit token hash instead of xxhash64 — two Karp–Rabin character folds
  * mixed multiplicatively mod their primes and packed `m1 + m2·2^30`, all
  * in one primitive pass per token. Bit-identical to the HOF formulation
  * `simhash64FromHashes(transform(toks, tokenHashPortable60))`
  * (parity-tested): the fold reads UTF-16 code units exactly as the HOF's
  * `ascii(substr(i, 1))` does on BMP text — the documented portability
  * bound of the portable hash family. */
object PortableSimHash64Kernel {
  final val P1 = 1000000007L
  final val P2 = 998244353L

  def tokenHash(tok: org.apache.spark.unsafe.types.UTF8String): Long = {
    val s = tok.toString
    var a1 = 7L
    var a2 = 11L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i).toLong
      a1 = (a1 * 131L + c) % P1
      a2 = (a2 * 137L + c) % P2
      i += 1
    }
    (a1 * 2654435761L) % P1 + ((a2 * 2246822519L) % P2) * 1073741824L
  }

  def compute(toks: ArrayData): Long = {
    val n = toks.numElements()
    val votes = new Array[Int](64)
    var t = 0
    while (t < n) {
      val h = if (toks.isNullAt(t)) 0L else tokenHash(toks.getUTF8String(t))
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) != 0L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var res = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) res |= 1L << i
      i += 1
    }
    res
  }
}

/** Native Catalyst expression for the portable-hash SimHash — the bulk
  * path of the d04 pipeline (the HOF form measured 7.6 s at sf0.1; this
  * runs at the codegen [[SimHash64]]'s speed). */
case class PortableSimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires an array<string> input, got $other")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "portable_simhash64"

  override def nullSafeEval(a: Any): Any =
    PortableSimHash64Kernel.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.PortableSimHash64Kernel.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PortableSimHash64 =
    copy(child = newChild)
}

/** Native Catalyst expression for the 64-bit SimHash of an `array<string>`
  * token column (per bit: sum ±1 votes over token hashes; bit set iff the
  * vote is positive).
  *
  * The HOF formulation builds a 64-wide `zip_with(transform(...))` tree
  * PER TOKEN — two 64-element array allocations per token per row, which
  * measured 40.9 s for one query at sf0.1. This expression does the same
  * math in a primitive loop with zero allocations beyond one int[64] per
  * row, and participates in whole-stage codegen so the surrounding
  * projection stays in one generated function.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires an array<string> input, got $other")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(a: Any): Any =
    SimHash64Kernel.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.SimHash64Kernel.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
