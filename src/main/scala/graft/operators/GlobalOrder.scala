package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global (whole-table) ranking without the whole table on one task.
  *
  * `row_number() OVER (ORDER BY k)` with no PARTITION BY makes Spark
  * move every row into a single window partition — the canonical
  * correct-but-scale-killer. This operator computes the identical
  * numbering in three scale-safe steps (the zipWithIndex construction,
  * expressed on DataFrames):
  *
  *   1. range-repartition by the sort key — each of N partitions holds
  *      a contiguous key range, ascending with partition id;
  *   2. per-partition `row_number` windowed on the partition id — N
  *      independent window groups instead of one;
  *   3. per-partition counts (N rows, collected) prefix-summed into
  *      offsets, added to the local rank via one broadcast map lookup.
  *
  * The only driver-side data is one (pid, count) row per partition.
  * A [[Barrier]] freezes the range partitioning so the count pass and
  * the rank pass see identical partition ids.
  *
  * `ntile` then needs no second window: bucket membership is integer
  * arithmetic on the global row number (SQL ntile semantics — the
  * first `total % n` buckets get the extra row).
  */
object GlobalOrder {

  /** Appends a global 1-based row number under `ORDER BY key` as
    * column `rnName`. Ties across partition boundaries are impossible
    * (equal keys land in one range partition); ties within a partition
    * follow the same arbitrary-but-deterministic resolution as the
    * single-task window would. Returns the frame plus its total count
    * (already computed — no extra job). */
  def withRowNumber(
      df: DataFrame,
      key: Column,
      rnName: String = "rn",
      numPartitions: Int = 0): DataFrame = {
    val (out, _) = withRowNumberCounted(df, key, rnName, numPartitions)
    out
  }

  def withRowNumberCounted(
      df: DataFrame,
      key: Column,
      rnName: String,
      numPartitions: Int = 0): (DataFrame, Long) = {
    val n =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = Barrier(
      df.repartitionByRange(n, key.asc)
        .withColumn("__pid", spark_partition_id()))
    val counts: Map[Int, Long] = ranged
      .groupBy("__pid").count()
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    // RangePartitioner assigns ascending key ranges to ascending
    // partition ids, so the offset of pid p is the count of rows in
    // partitions 0..p-1
    val offsets: Map[Int, Long] = {
      var acc = 0L
      (0 until n).map { p =>
        val entry = p -> acc
        acc += counts.getOrElse(p, 0L)
        entry
      }.toMap
    }
    val total = counts.values.sum
    val w = Window.partitionBy("__pid").orderBy(key.asc)
    val out = ranged
      .withColumn(
        rnName,
        row_number().over(w).cast("long") +
          element_at(typedLit(offsets), col("__pid")))
      .drop("__pid")
    (out, total)
  }

  /** SQL `ntile(buckets)` computed from a global row number and the
    * total count: rows 1..(q+1)*r fall in the first r := total mod
    * buckets buckets (size q+1 each, q := total / buckets); the rest
    * fall in size-q buckets. Integer arithmetic only — bit-identical
    * to the window function on any engine. */
  def ntileFromRowNumber(rn: Column, total: Long, buckets: Int): Column = {
    require(buckets > 0, "ntile needs a positive bucket count")
    val q = total / buckets
    val r = total % buckets
    val bigCut = (q + 1) * r
    if (q == 0)
      // fewer rows than buckets: row i is alone in bucket i
      rn.cast("int")
    else
      when(rn <= bigCut, intDiv(rn - 1, q + 1) + 1)
        .otherwise(lit(r) + intDiv(rn - 1 - bigCut, q) + 1)
        .cast("int")
  }

  /** Exact integer division for a non-negative column: Column./ is
    * IEEE double division, whose quotient can round up across an
    * integer boundary; subtracting the remainder first makes the
    * double division exact (both operands integral, exact result). */
  private def intDiv(a: Column, d: Long): Column =
    ((a - pmod(a, lit(d))) / lit(d)).cast("long")
}
