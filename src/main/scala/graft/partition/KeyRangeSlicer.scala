package graft.partition

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PK-range partition planner — the Spark-native replacement for the
  * reference's keyset pagination (cmd/root.go:321-372). The reference
  * emits one `ORDER BY pk LIMIT off,n` deferred-join SQL per page; we
  * emit half-open key-range predicates instead, which (a) are O(1) per
  * slice on a PK index (no deep OFFSET walk), (b) feed straight into
  * `spark.read.jdbc(url, table, predicates, props)` so each slice is one
  * Spark task, and (c) form an exact partition of the keyspace — no
  * duplicate/lost rows, unlike the reference's deliberately-one-extra
  * empty page (`i <= totalPageNum`, cmd/root.go:367).
  *
  * Slice bounds come from approximate quantiles of the leading key
  * (a cheap stats pass), so skewed key distributions still give
  * near-equal slice sizes — equal-width min/max splitting would not.
  * Composite PKs (cmd/root.go:334-357) slice on the leading column;
  * rows sharing one leading-key value stay in one slice, preserving the
  * partition property without multi-column range logic in SQL.
  */
object KeyRangeSlicer {

  /** Half-open WHERE-clause predicates partitioning `df` by `pkCols`.
    *   - no PK       => single full-scan slice (reference S6 fallback)
    *   - empty table => single slice
    * First and last predicates are unbounded on the outside so rows
    * outside the sampled range (or NULL-free new inserts) are never
    * dropped.
    */
  def slicePredicates(df: DataFrame, pkCols: Seq[String], numSlices: Int): Array[String] = {
    if (pkCols.isEmpty || numSlices <= 1) return Array("1=1")
    val lead = pkCols.head
    val isNumeric = df.schema(lead).dataType match {
      case _: org.apache.spark.sql.types.NumericType => true
      case _                                         => false
    }
    if (!isNumeric) return Array("1=1")

    val probs = (1 until numSlices).map(_.toDouble / numSlices).toArray
    val cuts = df
      .select(col(lead).cast("double"))
      .na.drop()
      .stat
      .approxQuantile(lead, probs, 0.001)
      .map(math.floor(_).toLong)
      .distinct
      .sorted
    if (cuts.isEmpty) return Array("1=1")

    val bounds = cuts.toSeq
    val first = s"$lead < ${bounds.head} OR $lead IS NULL"
    val middle = bounds.sliding(2).collect { case Seq(a, b) if a != b =>
      s"$lead >= $a AND $lead < $b"
    }.toSeq
    val last = s"$lead >= ${bounds.last}"
    (first +: middle :+ last).toArray
  }

  /** Slice count for a table: ceil(rowCount / pageSize), mirroring the
    * reference's page count (cmd/root.go:358-364) but capped so tiny
    * tables don't fan out. */
  def numSlices(rowCount: Long, pageSize: Long, maxSlices: Int = 512): Int =
    math.min(maxSlices.toLong, math.max(1L, (rowCount + pageSize - 1) / pageSize)).toInt
}
