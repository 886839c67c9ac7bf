package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.internal.SQLConf

/** Parallelism guard for compute-heavy per-row stages (sketching,
  * hashing, decoding). A small table often arrives as ONE parquet split
  * — parquet can't be split below a row group — which would serialize
  * an expensive map stage onto a single task no matter how many cores
  * the cluster has. At real scale inputs already carry thousands of
  * splits and this is a no-op; the repartition only fires when the
  * source is narrower than the session's core count, where the shuffle
  * it introduces is by construction small (under one
  * `files.maxPartitionBytes` split per core).
  *
  * The decision uses driver-side plan statistics only — no
  * `df.rdd.getNumPartitions`, which would force an early plan-to-RDD
  * conversion and hide the query from AQE. A scan cannot produce more
  * splits than `ceil(sizeInBytes / maxPartitionBytes)`; when even that
  * upper bound is below the core count, the stage would
  * under-parallelize. Sources with unknown stats (default
  * `Long.MaxValue` size) never repartition.
  */
object Parallelism {

  def ensureMin(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val maxSplit = BigInt(SQLConf.get.filesMaxPartitionBytes)
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (size / maxSplit < target) df.repartition(target) else df
  }
}
