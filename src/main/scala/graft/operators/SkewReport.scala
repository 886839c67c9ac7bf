package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-key skew diagnostic — the "will this key shuffle, and does it
  * need salting" report every large-scale join plan starts from (the
  * planning-side complement of [[SkewJoin]], which executes the salted
  * join, and of AQE's runtime skew split, which only triggers once a
  * task is already oversized): per hot key, its row count, its share
  * of the table, its heat relative to the mean key, and the salt
  * fan-out that would bound a 2-sided shuffle task at
  * `targetPerTask` rows.
  *
  * Scale shape: ONE scan — a map-side-combined count per key (the
  * only full shuffle, keyed exactly like the join under diagnosis
  * would be), a one-row total broadcast back, and a TakeOrdered
  * top-k cut. The raw table is never touched twice and nothing
  * driver-side exceeds k rows.
  *
  * Portability: shares are integer divisions (`div`), heat is
  * (cnt · n_keys · 1000) div n_rows, salt is ceil-div — every output
  * column BIGINT, no float anywhere. Ties cut on key value.
  */
object SkewReport {

  /** Top-k hottest keys: (k, cnt, n_rows, n_keys, share_milli,
    * heat_milli, salt_factor). `heat_milli` = 1000 means the key is
    * exactly average; 50000 means 50× hotter than the (floored)
    * average rows-per-key — the heat denominator is
    * `n_rows div n_keys`, not the exact mean, so every operand stays
    * ≤ 1000·n_rows and nothing can overflow BIGINT on any table
    * under ~9·10¹⁵ rows (the naive cnt·n_keys·1000 form overflows at
    * ~10⁹ keys × 10⁹-row hot keys — review finding). `salt_factor`
    * is the sub-split count that caps one key's rows per task at
    * `targetPerTask` (1 = no salting needed). */
  def report(
      df: DataFrame,
      key: Column,
      topK: Int = 10,
      targetPerTask: Long = 1000000L): DataFrame = {
    require(topK >= 1, s"bad topK $topK")
    require(targetPerTask >= 1L, s"bad targetPerTask $targetPerTask")
    val counts = Parallelism.ensureMin(df)
      .groupBy(key.as("k")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      sum("cnt").as("n_rows"), count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(totals))
      .select(
        col("k"), col("cnt"), col("n_rows"), col("n_keys"),
        expr("cnt * 1000 div n_rows").as("share_milli"),
        expr("cnt * 1000 div (n_rows div n_keys)").as("heat_milli"),
        expr(s"(cnt + ${targetPerTask - 1}L) div ${targetPerTask}L")
          .as("salt_factor"))
      // NULL is a legal key (groupBy keeps it); pin it LAST on the
      // tiebreak to match the oracle's default NULLS LAST ordering
      .orderBy(col("cnt").desc, col("k").asc_nulls_last)
      .limit(topK)
  }

  /** DuckDB oracle twin of [[report]] over `table`.`keyCol`. */
  def oracleSql(
      table: String, keyCol: String, topK: Int, targetPerTask: Long): String =
    s"""WITH counts AS (
       |  SELECT $keyCol AS k, count(*)::BIGINT AS cnt
       |  FROM $table GROUP BY 1),
       |totals AS (
       |  SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
       |         count(*)::BIGINT AS n_keys FROM counts)
       |SELECT k, cnt, n_rows, n_keys,
       |       cnt * 1000 // n_rows AS share_milli,
       |       cnt * 1000 // (n_rows // n_keys) AS heat_milli,
       |       (cnt + ${targetPerTask - 1}) // $targetPerTask AS salt_factor
       |FROM counts, totals
       |ORDER BY cnt DESC, k
       |LIMIT $topK""".stripMargin
}
