package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for 2-dimensional storage clustering —
  * the layout tool behind min/max data skipping at 100 TB (reference
  * analog: the partitioned warehouse layout its DAGs write; same idea
  * Delta/Iceberg expose as OPTIMIZE ZORDER BY).
  *
  * Why: a single-dim sort bounds file min/max ranges on ONE column —
  * predicates on a second column still scan every file. Interleaving
  * the bits of two quantized keys gives every z-contiguous file a small
  * bounding BOX in (a, b) space, so scans with predicates on either (or
  * both) dimensions can skip most files on footer stats alone.
  *
  * Everything here is static-shift bitwise arithmetic on longs — pure
  * builtin expressions, codegen'd, no UDF — and exact-integer, so the
  * whole construction replays bit-identically in an oracle.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` to even bit positions (classic
    * mask-shift doubling: 5 steps instead of a 16-term bit loop).
    */
  private[functions] def spread16(x: Column): Column = {
    val s0 = x.bitwiseAND(lit(0xFFFFL))
    val s1 = s0.bitwiseOR(shiftleft(s0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit z-value from two 16-bit quantized keys: bits of `a` land on
    * even positions, bits of `b` on odd.
    */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Quantize a non-negative value into [0, 2^16) given its inclusive
    * max: v * 65536 div (max + 1). Exact INTEGRAL division (`div`, not
    * `/` — Spark's `/` is double division and would cost bit-exactness
    * for large values); the multiply stays in Long range for v < 2^47.
    */
  def quantize16(v: Column, maxV: Column): Column =
    call_function("div",
      v.cast("long") * lit(65536L), maxV.cast("long") + lit(1L))
}
