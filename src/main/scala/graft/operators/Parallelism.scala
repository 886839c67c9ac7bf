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
  * The decision uses driver-side plan introspection only — no
  * `df.rdd.getNumPartitions`, which would force an early plan-to-RDD
  * conversion and hide the query from AQE:
  *
  *   - JDBC leaves expose their partition array on the relation
  *     itself (1 when no partitioning options were given — the classic
  *     single-threaded JDBC read, whose default `sizeInBytes` is
  *     Long.MaxValue and so would LOOK wide to a stats-only check);
  *   - file scans estimate from plan statistics: a scan cannot produce
  *     more splits than `ceil(sizeInBytes / maxPartitionBytes)`, so
  *     when even that upper bound is below the core count the stage
  *     would under-parallelize. Non-JDBC sources with unknown stats
  *     (default Long.MaxValue size) never repartition.
  */
object Parallelism {

  def ensureMin(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    org.apache.spark.sql.graftbridge.PlanBridge.jdbcLeafPartitions(df) match {
      case Some(n) =>
        if (n < target) df.repartition(target) else df
      case None =>
        val maxSplit = BigInt(SQLConf.get.filesMaxPartitionBytes)
        val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
        if (size / maxSplit < target) df.repartition(target) else df
    }
  }
}
