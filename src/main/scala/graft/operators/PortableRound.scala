package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Engine-portable fixed-point projection for RATIO columns.
  *
  * `round(x, p)` is NOT portable for quotients of integers: when the
  * exact rational lands on a decimal tie (e.g. 1011/16000 =
  * 0.0631875), Spark rounds the double's SHORTEST DECIMAL REPR
  * (BigDecimal HALF_UP over `Double.toString` — sees the tie, rounds
  * up) while DuckDB's C `round` rounds the BINARY value (sits a hair
  * below the tie, rounds down): 0.063188 vs 0.063187. The round-11
  * sf0.1 oracle sweep caught exactly this in the quality-classifier
  * score (qp05, doc 1248). Ties need a 5-factor denominator, so
  * integer ratios (scores, jaccards, rates) are the exposed class;
  * dyadic ties (sums/products of floats) agree half-away in both
  * engines, and transcendental outputs (log, sqrt, cosine) land on a
  * representable tie only with measure-zero luck.
  *
  * The portable projection is floor-scaling: floor(x·10^p)/10^p —
  * multiply, floor, divide are each exact IEEE operations with no tie
  * semantics, so ANY input projects bit-identically in any IEEE
  * engine. It is monotone (never reorders rankings beyond creating
  * projection-equal groups) and biased ≤ 10^-p toward −∞, irrelevant
  * for diagnostic ratios.
  */
object PortableRound {

  def floorTo(c: Column, places: Int): Column = {
    val s = math.pow(10, places)
    floor(c * lit(s)) / lit(s)
  }

  /** The identical DuckDB expression — keep literal-for-literal in
    * sync with [[floorTo]]. */
  def floorToSql(expr: String, places: Int): String = {
    val s = "1" + ("0" * places) + ".0"
    s"(floor(($expr) * $s) / $s)"
  }
}
