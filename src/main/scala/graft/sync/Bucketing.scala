package graft.sync

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table layout for co-located joins: write both sides of a
  * recurring equi-join bucketed (and sorted) on the join key, and every
  * subsequent join on that key runs WITHOUT a shuffle — each task reads
  * matching buckets from both sides. At 100 TB this converts the
  * fact-to-fact join (the one shuffle AQE can't remove) into a local
  * merge per bucket; the price is paid once at write time. Bucket count
  * should divide evenly into the cluster's task slots and keep buckets
  * under a few hundred MB.
  */
object Bucketing {

  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
