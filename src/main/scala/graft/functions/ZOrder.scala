package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values from built-in codegen'd bit ops — no
  * custom Expression needed: the classic magic-number bit spread is five
  * shift/mask/or steps per dimension, all of which Catalyst folds into
  * whole-stage codegen.
  *
  * Sorting a layout by `zvalue2(a, b)` makes parquet row-group min/max
  * ranges tight in BOTH dimensions at once, so a 2-D box predicate
  * prunes row groups the way a 1-D sort only manages for its leading
  * column — the standard lakehouse data-skipping layout (reference has
  * no analog; its cache is layout-agnostic byte ranges). c07 writes the
  * layout through graft:// and ZOrderSpec counts surviving row groups
  * straight from the parquet footers.
  */
object ZOrder {

  /** Spread the low 32 bits of `x` so bit i lands at bit 2i (the other
    * positions zero). Magic masks are the textbook Morton constants. */
  private def spread(x: Column): Column = {
    var v = x.bitwiseAND(lit(0xFFFFFFFFL))
    v = (v.bitwiseOR(shiftleft(v, 16))).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    v = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    v = (v.bitwiseOR(shiftleft(v, 4))).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    v = (v.bitwiseOR(shiftleft(v, 2))).bitwiseAND(lit(0x3333333333333333L))
    (v.bitwiseOR(shiftleft(v, 1))).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Range guard: keys outside [0, 2^32) would silently FOLD the curve
    * (the mask drops high bits, aliasing distant keys onto the same
    * z-range and quietly destroying skipping selectivity), so they raise
    * instead — callers with wider domains must bucketize first, e.g.
    * `zvalue2(shiftrightunsigned(k, 16), other)`. */
  private def checked(x: Column, name: String): Column = {
    val v = x.cast("long")
    when(v >= 0 && v < lit(1L << 32), v)
      .otherwise(raise_error(concat(
        lit(s"zvalue2: $name key out of [0, 2^32): "), v.cast("string"))))
  }

  /** 64-bit Morton value interleaving the low 32 bits of `a` (even bit
    * positions) and `b` (odd positions). Inputs must be non-negative
    * and < 2^32 for a faithful curve (enforced — see `checked`). */
  def zvalue2(a: Column, b: Column): Column =
    spread(checked(a, "left")).bitwiseOR(shiftleft(spread(checked(b, "right")), 1))
}
