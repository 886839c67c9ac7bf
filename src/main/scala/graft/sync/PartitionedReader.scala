package graft.sync

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.catalog.JdbcCatalog
import graft.config.Endpoint
import graft.partition.KeyRangeSlicer

/** Partitioned JDBC extract — the Spark-native replacement for the
  * reference's keyset pagination (SURVEY S7). Instead of one
  * `ORDER BY pk LIMIT off,n` deferred-join query per page, the table is
  * read as one `spark.read.jdbc(url, table, predicates, props)` call
  * whose predicates are quantile-derived half-open PK ranges:
  * one Spark task per slice, each an O(1) index range scan on the
  * source database, together an exact partition of the keyspace.
  *
  * Scale behavior: slice count = ceil(rows / pageSize) capped at
  * `maxSlices`, which doubles as the connection ceiling per table
  * (the reference's maxOpen=60 pool, cmd/app.go:53). Stats for the
  * quantile cuts come from one narrow scan of the PK column only.
  */
object PartitionedReader {

  def read(
      spark: SparkSession,
      endpoint: Endpoint,
      table: String,
      pageSize: Long = 100000L,
      maxSlices: Int = 60): DataFrame = {
    val props = new Properties()
    endpoint.props.foreach { case (k, v) => props.setProperty(k, v) }

    val catalog = new JdbcCatalog(endpoint)
    val pk = catalog.primaryKey(table)
    val probe = Normalize.lowercaseColumns(spark.read.jdbc(endpoint.url, table, props))
    if (pk.isEmpty)
      return probe // full-scan fallback (reference S6: no split key)

    val rowCount = probe.count()
    val n = KeyRangeSlicer.numSlices(rowCount, pageSize, maxSlices)
    if (n <= 1) return probe

    val keyStats = probe.select(pk.head) // narrow column scan for quantiles
    val predicates = KeyRangeSlicer.slicePredicates(keyStats, pk, n)
    Normalize.lowercaseColumns(
      spark.read.jdbc(endpoint.url, table, predicates, props))
  }
}
