package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.jdbc.JDBCRelation

/** Plan-introspection shims (`private[sql]` types), sitting inside the
  * org.apache.spark.sql package like [[ColumnBridge]]. */
object PlanBridge {

  /** The exact number of scan partitions the plan's leaves will
    * produce, when statically knowable WITHOUT converting the plan to
    * an RDD: JDBC V1 relations carry their partition array (1 when no
    * partitioning options were given — the classic single-threaded
    * JDBC read). File scans return None (split-count is size-driven;
    * estimate from stats instead). */
  def jdbcLeafPartitions(df: DataFrame): Option[Int] = {
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
    val jdbc = leaves.collect {
      case l: LogicalRelation if l.relation.isInstanceOf[JDBCRelation] =>
        l.relation.asInstanceOf[JDBCRelation].parts.length
    }
    if (jdbc.nonEmpty && jdbc.length == leaves.length) Some(jdbc.sum) else None
  }

  /** Reliable-checkpoint file paths backing the frame's LogicalRDD
    * leaves — exactly the files `Dataset.checkpoint(eager = true)`
    * wrote for this frame. Empty for localCheckpoint frames (their
    * RDDs report no checkpoint file) and for any non-checkpoint leaf,
    * so a caller can delete the returned paths without mode checks. */
  def checkpointFiles(df: DataFrame): Seq[String] =
    df.queryExecution.analyzed.collectLeaves().collect {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.getCheckpointFile
    }.flatten
}
