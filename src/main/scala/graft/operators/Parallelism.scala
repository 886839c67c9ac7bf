package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism guard for compute-heavy per-row stages (sketching,
  * hashing, decoding). A small table often arrives as ONE parquet split
  * — parquet can't be split below a row group — which would serialize
  * an expensive map stage onto a single task no matter how many cores
  * the cluster has. At real scale inputs already carry thousands of
  * splits and this is a no-op; the repartition only fires when the
  * source is narrower than the session's core count, where the shuffle
  * it introduces is by construction tiny.
  */
object Parallelism {

  def ensureMin(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
