package graft.sync

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Range-clustered parquet layout: `repartitionByRange` on the cluster
  * key + `sortWithinPartitions` before the write, so every output file
  * covers a narrow, disjoint key interval and every row group inside it
  * is sorted. Parquet footers then carry tight min/max statistics, and
  * any scan with a range predicate on the key prunes whole row groups
  * (and, with footer-reading planners, whole files) instead of decoding
  * them — the single biggest read-path lever for a 100 TB table that is
  * habitually filtered on one dimension (time, tenant, key prefix).
  *
  * Compared to `Bucketing` (hash layout, removes the SHUFFLE from
  * recurring equi-joins) this removes the SCAN from range-filtered
  * reads; they compose (bucket by join key, range-cluster within
  * buckets via sortBy). The range exchange samples the key to build
  * balanced partitions, so skewed keys still yield even files.
  */
object Layout {

  def writeRangeSorted(
      df: DataFrame,
      key: String,
      numFiles: Int,
      path: String): Unit =
    df.repartitionByRange(numFiles, col(key))
      .sortWithinPartitions(key)
      .write.mode(SaveMode.Overwrite)
      .parquet(path)
}
