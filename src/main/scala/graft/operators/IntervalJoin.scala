package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval OVERLAP join: all pairs of intervals (one from each side,
  * same key) that overlap — `lStart < rEnd && rStart < lEnd` — with the
  * overlap length. The third member of the temporal-join family beside
  * the as-of join ([[AsOfJoin]]: ONE nearest row) and the band join
  * ([[RangeJoin]]: point ordinates within a fixed offset band): here
  * BOTH sides are intervals and every concurrent pair qualifies —
  * concurrent-session detection, campaign-window attribution,
  * conflict/booking overlap.
  *
  * Decomposition (the bucketed interval-join standard, cf. Flink's
  * interval join): with bucket width `w` >= every interval's length,
  * an overlapping pair's START buckets differ by at most 1 — rs < le
  * <= ls + w bounds the right start one bucket above, ls < re <= rs +
  * w one below. So the plan is
  *
  *   explode(left, 3 candidate buckets) equi-join (keys :+ bucket)
  *     right(start bucket) -> exact overlap filter
  *
  * a pure hash equi-join with left replication 3 and NO pair dedup:
  * each right interval carries exactly one start bucket, so a
  * qualifying pair meets exactly once. Never a per-key cross product
  * or a nested-loop join (PlanShapeSpec pins this for qj06).
  *
  * 100 TB shape: the shuffle is keyed by (keys, bucket) — time-sliced,
  * so one key's whole history never lands on one task; a pathological
  * pile-up of intervals inside one (key, bucket) is the one skew risk,
  * and it arrives as JOIN-side skew, which AQE's skew-split handles
  * (a window/sort formulation could not split that hot partition).
  * Buckets are exact signed floor division — pre-epoch starts bucket
  * correctly.
  *
  * @param bucketWidth integral bucket width; caller guarantees every
  *   interval on both sides is no longer than this (derived windows
  *   with fixed lengths satisfy it by construction; clamp open-ended
  *   intervals first).
  */
object IntervalJoin {

  /** Exact floor(e / w) for longs of either sign (w > 0). */
  private def floorDiv(e: String, w: Long): String =
    s"((($e) div $w) - (CASE WHEN ($e) % $w < 0 THEN 1 ELSE 0 END))"

  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      bucketWidth: Long,
      rightPrefix: String = "r_"): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    require(keys.nonEmpty,
      "overlapJoin needs at least one equality key (keyless overlap " +
        "needs a global range partitioner, not a hash join)")
    val lb = expr(floorDiv(lStart, bucketWidth))
    val taggedLeft = left
      .withColumn("__bucket", explode(array(lb - lit(1L), lb, lb + lit(1L))))
    val taggedRight = right
      .withColumn("__bucket", expr(floorDiv(rStart, bucketWidth)))
    val rightCols = right.columns.filterNot(keys.contains)
    val rs = col(s"$rightPrefix$rStart")
    val re = col(s"$rightPrefix$rEnd")
    taggedLeft
      .join(
        taggedRight.select(keys.map(col) ++ Seq(col("__bucket")) ++
          rightCols.map(c => taggedRight(c).as(s"$rightPrefix$c")): _*),
        keys :+ "__bucket")
      .where(col(lStart) < re && rs < col(lEnd))
      .withColumn("overlap_us",
        least(col(lEnd), re) - greatest(col(lStart), rs))
      .drop("__bucket")
  }
}
