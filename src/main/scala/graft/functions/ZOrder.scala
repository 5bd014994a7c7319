package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve encoding from built-in column ops.
  *
  * `zval(qa, qb)` interleaves the low 16 bits of two quantized dimensions
  * into one 32-bit curve position. Sorting a table by that position
  * clusters rows so that EVERY interleaved dimension has narrow per-file
  * min/max ranges — parquet footer stats then prune files for range
  * predicates on ANY of the dimensions, where a linear sort serves only
  * its leading column. This is the layout trick behind Delta/Iceberg
  * OPTIMIZE ZORDER, expressed here as pure codegen-friendly arithmetic
  * (shift/and/or — no UDF, no custom expression needed).
  *
  * The bit-spread is the classic magic-number doubling scheme: each step
  * doubles the gap between occupied bit groups, in long arithmetic
  * throughout (inputs are already masked to 16 bits, so no sign issues).
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to the even bit positions of a 32-bit
    * value: b15..b0 → 0b15 0b14 … 0b0. */
  private def spread16(c: Column): Column = {
    val m = (x: Column, sh: Int, mask: Long) =>
      x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(mask))
    var x = c.bitwiseAND(lit(0xFFFFL))
    x = m(x, 8, 0x00FF00FFL)
    x = m(x, 4, 0x0F0F0F0FL)
    x = m(x, 2, 0x33333333L)
    x = m(x, 1, 0x55555555L)
    x
  }

  /** Morton position of two 16-bit quantized coordinates. */
  def zval(qa: Column, qb: Column): Column =
    spread16(qa).bitwiseOR(shiftleft(spread16(qb), 1))

  /** Quantize `x` to a 16-bit rank of its [lo, hi] domain (long in,
    * long out, clamped). The +1 keeps hi itself inside bucket 65535. */
  def quant16(x: Column, lo: Column, hi: Column): Column =
    least(
      floor((x - lo).cast("double") / (hi - lo + lit(1)).cast("double")
        * lit(65536.0)).cast("long"),
      lit(65535L))
}
