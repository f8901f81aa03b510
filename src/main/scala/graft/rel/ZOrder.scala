package graft.rel

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve utilities: interleave the bits of two dimension
  * columns so that sorting / range-partitioning by the single z-value
  * co-locates rows that are close in BOTH dimensions — the layout trick
  * behind multi-dimensional data skipping (Delta/Iceberg `OPTIMIZE
  * ZORDER`). A 2-D range predicate then prunes whole z-ranges (files, row
  * groups, buckets) via their min/max zone maps instead of scanning one
  * dimension's clustering and ignoring the other's.
  *
  * Everything here is a chain of codegen'd integer bitwise ops
  * (`&`, `|`, `<<`) — whole-stage-codegen friendly, and portable: any
  * engine with 64-bit integer bit ops reproduces the value exactly (the
  * q32 DuckDB oracle does, step for step).
  */
object ZOrder {

  /** Spread the low 16 bits of `x`: bit i → bit 2i (the classic
    * magic-mask doubling ladder). Input must be pre-masked to 16 bits. */
  def spread16(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit dimensions: a's bit i at bit 2i,
    * b's bit i at bit 2i+1. */
  def interleave(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Reference (slow, driver-side) Morton code for tests. */
  def interleaveRef(a: Int, b: Int): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((a.toLong >> i) & 1L) << (2 * i)
      z |= ((b.toLong >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}
