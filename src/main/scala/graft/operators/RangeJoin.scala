package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Band (interval/range) join: pairs (l, r) with equal `keys` and
  * `r.ord - l.ord` in [lower, upper]. Written naively
  * (`l.join(r, keyEq && rangePred)`) Spark plans the range predicate as
  * a post-join filter on the equi-join, which is correct but degrades
  * to O(|L|·|R|) work per key when keys are few or hot — and with NO
  * equality key at all it becomes a broadcast-nested-loop/cartesian.
  *
  * The scale path buckets the ordering value at width w = upper - lower:
  * any qualifying pair's right ordinate lands in one of TWO consecutive
  * buckets relative to the left's shifted ordinate, so the join becomes
  *
  *   explode(left, 2 candidate buckets) equi-join (keys :+ bucket) right
  *     -> exact range filter
  *
  * a pure hash equi-join with left-side replication factor 2,
  * partition-pruned by (key, bucket) — each task sees only the rows of
  * one band window, never a key's whole history. This is the standard
  * bucketed interval-join decomposition (cf. Flink's interval join and
  * Spark RAPIDS' range-join docs).
  *
  * Bucketing uses an exact integer floor division (truncating `div`
  * corrected for negative remainders), so ordinates and band bounds may
  * be negative — pre-epoch times, signed offsets, backward bands all
  * bucket correctly.
  */
object RangeJoin {

  /** Exact floor(e / w) for longs of either sign (w > 0): `div`
    * truncates toward zero; subtract 1 when the remainder is negative. */
  private def floorDiv(e: String, w: Long): String =
    s"((($e) div $w) - (CASE WHEN ($e) % $w < 0 THEN 1 ELSE 0 END))"

  /** Inner band join; right columns emitted with `rightPrefix`.
    *
    * @param leftOrd/rightOrd integral ordering columns (cast times with
    *   unix_micros first); match when
    *   leftOrd + lower <= rightOrd <= leftOrd + upper.
    */
  def bandJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftOrd: String,
      rightOrd: String,
      lower: Long,
      upper: Long,
      rightPrefix: String = "r_"): DataFrame = {
    require(upper >= lower, s"empty band: [$lower, $upper]")
    require(keys.nonEmpty,
      "bandJoin needs at least one equality key (keyless bands need a " +
        "global range partitioner, not a hash join)")
    if (upper == lower) {
      // point band (match at one exact offset): no bucketing needed —
      // the shifted ordinate IS an equality key, so this is a plain
      // hash equi-join on keys :+ ordinate with zero replication
      val rightCols = right.columns.filterNot(keys.contains)
      return left
        .withColumn("__ord_match", col(leftOrd) + lit(lower))
        .join(
          right.select(keys.map(col) ++
            Seq(col(rightOrd).as("__ord_match")) ++
            rightCols.map(c => right(c).as(s"$rightPrefix$c")): _*),
          keys :+ "__ord_match")
        .drop("__ord_match")
    }
    val w = upper - lower

    // candidate buckets of the SHIFTED left ordinate: an interval of
    // length w starting at l+lower spans at most two width-w buckets
    val lo = col(leftOrd) + lit(lower)
    val lb = expr(floorDiv(s"$leftOrd + $lower", w))
    val taggedLeft = left
      .withColumn("__bucket", explode(array(lb, lb + lit(1L))))
    val taggedRight = right
      .withColumn("__bucket", expr(floorDiv(rightOrd, w)))

    val rightCols = right.columns.filterNot(keys.contains)
    val joined = taggedLeft.join(
      taggedRight
        .select(keys.map(col) ++ Seq(col("__bucket")) ++
          rightCols.map(c => taggedRight(c).as(s"$rightPrefix$c")): _*),
      keys :+ "__bucket")
    joined
      .where(col(s"$rightPrefix$rightOrd").between(lo, col(leftOrd) + lit(upper)))
      .drop("__bucket")
  }
}
