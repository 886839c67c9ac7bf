package graft.sync

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.catalog.JdbcCatalog
import graft.config.Endpoint
import graft.partition.KeyRangeSlicer

/** Partitioned JDBC extract — the Spark-native replacement for the
  * reference's keyset pagination (SURVEY S7). Instead of one
  * `ORDER BY pk LIMIT off,n` deferred-join query per page, the table is
  * read as one `spark.read.jdbc(url, table, predicates, props)` call
  * whose predicates are half-open PK ranges: one Spark task per slice,
  * each an O(1) index range scan on the source database, together an
  * exact partition of the keyspace.
  *
  * All planning statistics are computed BY the source database and only
  * aggregates cross the wire — no Spark-side scan happens before the
  * parallel extract:
  *   1. one `COUNT(*), MIN(pk), MAX(pk)` round trip (index-only on the
  *      PK) sizes the slice count;
  *   2. one pushed-down equal-width bucket histogram
  *      (`FLOOR((pk-min)*B/span) GROUP BY`) turns the key distribution
  *      into equal-COUNT cut points, so skewed keys still yield balanced
  *      slices. SQL uses only FLOOR/arithmetic/GROUP BY — portable
  *      across MySQL-wire targets and Derby (the test sink).
  *
  * Scale behavior: slice count = ceil(rows / pageSize) capped at
  * `maxSlices`, which doubles as the connection ceiling per table
  * (the reference's maxOpen=60 pool, cmd/app.go:53).
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
    def fullScan =
      Normalize.lowercaseColumns(spark.read.jdbc(endpoint.url, table, props))

    val pk = new JdbcCatalog(endpoint).primaryKey(table)
    if (pk.isEmpty) return fullScan // reference S6: no split key
    val lead = pk.head

    // one planning connection for all pushed-down statistics (bounds +
    // histograms, including adaptive refinement rounds)
    val conn = DriverManager.getConnection(endpoint.url, props)
    try {
      queryRows(conn, s"SELECT COUNT(*), MIN($lead), MAX($lead) FROM $table")
        .headOption match {
        case Some(Seq(cnt: Number, mn: Number, mx: Number)) =>
          val rowCount = cnt.longValue()
          val n = KeyRangeSlicer.numSlices(rowCount, pageSize, maxSlices)
          val (mnL, mxL) = (mn.longValue(), mx.longValue())
          if (n <= 1 || mxL <= mnL) return fullScan

          val nBuckets = math.max(64, n * 8)
          val cuts = KeyRangeSlicer.adaptiveCuts(
            histFetcher(conn, lead, table), mnL, mxL, n, nBuckets)
          if (cuts.isEmpty) fullScan
          else
            Normalize.lowercaseColumns(
              spark.read.jdbc(
                endpoint.url, table, KeyRangeSlicer.predicatesFromCuts(lead, cuts), props))
        case _ => fullScan // empty table or non-numeric PK
      }
    } finally conn.close()
  }

  /** Pushed-down histogram of [lo, hi]; the adaptive planner calls
    * this again on any bucket too hot to split in one pass. */
  private def histFetcher(conn: java.sql.Connection, lead: String, table: String)
      : (Long, Long, Int) => Seq[(Int, Long)] = { (lo, hi, buckets) =>
    val span = BigInt(hi) - BigInt(lo) + 1
    // 1E0 forces DOUBLE arithmetic on every dialect (Derby incl.)
    val histSql =
      s"""SELECT b, COUNT(*) FROM (
         |  SELECT FLOOR(($lead - $lo) * 1E0 * $buckets / $span) AS b
         |  FROM $table
         |  WHERE $lead IS NOT NULL AND $lead >= $lo AND $lead <= $hi) x
         |GROUP BY b""".stripMargin
    queryRows(conn, histSql).collect {
      case Seq(b: Number, c: Number) => (b.intValue(), c.longValue())
    }
  }

  /** Equal-count cut values for a FIXED slice count, all statistics
    * pushed to the source database (bounds + adaptive histograms, no
    * row transfer) — the planning primitive DeltaSync uses so that its
    * slicing never costs a Spark-side scan. Empty when the table has
    * no numeric lead PK, is empty, or spans a single key. */
  def pushedCuts(endpoint: Endpoint, table: String, numSlices: Int): Seq[Long] = {
    if (numSlices <= 1) return Seq.empty
    val props = new Properties()
    endpoint.props.foreach { case (k, v) => props.setProperty(k, v) }
    val pk = new JdbcCatalog(endpoint).primaryKey(table)
    if (pk.isEmpty) return Seq.empty
    val lead = pk.head
    val conn = DriverManager.getConnection(endpoint.url, props)
    try {
      queryRows(conn, s"SELECT COUNT(*), MIN($lead), MAX($lead) FROM $table")
        .headOption match {
        case Some(Seq(cnt: Number, mn: Number, mx: Number)) =>
          val (mnL, mxL) = (mn.longValue(), mx.longValue())
          // row-count gate: a table smaller than a couple of rows per
          // slice gains nothing from slicing — skip the histogram scan
          if (mxL <= mnL || cnt.longValue() < 2L * numSlices) Seq.empty
          else KeyRangeSlicer.adaptiveCuts(
            histFetcher(conn, lead, table), mnL, mxL, numSlices,
            math.max(64, numSlices * 8))
        case _ => Seq.empty // empty table or non-numeric PK
      }
    } finally conn.close()
  }

  /** Partitioned read over PRE-COMPUTED cut values — lets a caller that
    * already derived cuts (DeltaSync) reuse them for read parallelism
    * instead of paying a second planning pass. */
  def readSliced(
      spark: SparkSession,
      endpoint: Endpoint,
      table: String,
      lead: String,
      cuts: Seq[Long]): DataFrame = {
    val props = new Properties()
    endpoint.props.foreach { case (k, v) => props.setProperty(k, v) }
    Normalize.lowercaseColumns(
      spark.read.jdbc(
        endpoint.url, table, KeyRangeSlicer.predicatesFromCuts(lead, cuts), props))
  }

  /** Pushed-down planning query on the shared connection: the database
    * computes, one result set of aggregates comes back. */
  private def queryRows(conn: java.sql.Connection, sql: String): Seq[Seq[Any]] = {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(Jobs.tagSql(sql))
      val width = rs.getMetaData.getColumnCount
      val buf = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
      while (rs.next()) buf += (1 to width).map(rs.getObject)
      rs.close()
      buf.toSeq
    } finally st.close()
  }
}
