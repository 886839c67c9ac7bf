package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Engine-portable mergeable quantile histogram — the decimal cousin
  * of HdrHistogram (Tene's high-dynamic-range histogram, public):
  * values scale to integer MILLI-UNITS (floor(v*1000)), and each
  * integer lands in the bucket that keeps its first `p` DECIMAL digits
  * and zeroes the rest (1234567, p=3 → 1230000). Bucket width is
  * 10^(d-p) for a d-digit value, so the bucket lower bound
  * under-estimates any member by strictly less than 10^(1-p) relative
  * (1% at p=3) — a guaranteed-error quantile sketch whose state is a
  * tiny (bucket_lo, count) table.
  *
  * Why this shape at 100 TB: the sketch is ADDITIVELY mergeable
  * (counts sum bucket-wise — shards/partitions/days combine losslessly
  * in one narrow aggregation), and its size is bounded by the VALUE
  * DOMAIN, not the corpus: at most 9·10^(p-1) buckets per decade.
  * Quantile lookup is a cumulative walk over that bounded table. The
  * exact-quantile companion column used by the error gate is also
  * domain-bounded (distinct milli values), so even the verification
  * leg never sorts corpus-sized data.
  *
  * Portability: bucketing is STRING arithmetic (substring + rpad on
  * the decimal rendering — no float log, no power()), ranks are pure
  * integers (per-mille quantiles: rank = ceil(n·q‰/1000) via integer
  * division), so every output column value-oracles in DuckDB.
  */
object PortableHistogram {

  /** milli-unit projection: floor(v*1000) as BIGINT (exact IEEE
    * multiply+floor — no tie semantics, same everywhere). The decimal
    * bucketing below is meaningful only for NON-NEGATIVE values (a
    * minus sign would count as a leading "digit" and push the bucket
    * bound ABOVE its members), so negative input fails loudly instead
    * of silently mis-bucketing. */
  def toMilli(value: Column): Column = {
    val m = floor(value * lit(1000.0)).cast("long")
    when(m < 0, raise_error(lit(
      "PortableHistogram requires non-negative values"))).otherwise(m)
  }

  /** The p-leading-digit bucket lower bound of a non-negative BIGINT:
    * keep the first p decimal digits, zero-pad back to the original
    * length. Pure string ops — exact in any engine. */
  def bucketLo(milli: Column, p: Int): Column = {
    require(p >= 1, s"bad precision $p")
    val s = milli.cast("string")
    rpad(substring(s, 1, p), length(s).cast("int"), lit("0")).cast("long")
  }

  /** The mergeable sketch: (bucket_lo, n) counts. */
  def histogram(df: DataFrame, value: Column, p: Int): DataFrame =
    Parallelism.ensureMin(df)
      .select(bucketLo(toMilli(value), p).as("bucket_lo"))
      .groupBy("bucket_lo").agg(count(lit(1)).as("n"))

  /** Quantile profile: one row per requested per-mille quantile with
    * the sketch estimate, the exact discrete quantile, and the
    * relative-error gate. Columns: (q_permille, n_rows, est_milli,
    * exact_milli, rel_err, in_bound). The bound is the structural
    * 10^(1-p) guarantee. */
  def quantileProfile(
      df: DataFrame,
      value: Column,
      p: Int,
      qsPerMille: Seq[Int]): DataFrame = {
    require(qsPerMille.nonEmpty && qsPerMille.forall(q => q >= 1 && q <= 1000),
      s"bad quantiles $qsPerMille")
    val milli = Parallelism.ensureMin(df)
      .select(toMilli(value).as("m"))

    // both cumulative walks run over DOMAIN-bounded tables (see
    // scaladoc); the unpartitioned window is deliberate and safe
    val byBucket = Window.orderBy("bucket_lo")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hist = milli.groupBy(bucketLo(col("m"), p).as("bucket_lo"))
      .agg(count(lit(1)).as("n"))
      .withColumn("cum", sum("n").over(byBucket))
    val byValue = Window.orderBy("m")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exact = milli.groupBy("m").agg(count(lit(1)).as("n"))
      .withColumn("cum", sum("n").over(byValue))

    val ss = df.sparkSession
    import ss.implicits._
    val qs = qsPerMille.map(_.toLong).toDF("q_permille")
    val tot = milli.agg(count(lit(1)).as("n_rows"))
    val ranks = qs.crossJoin(broadcast(tot))
      // exact integer ceil-division: `div` is integral in Spark SQL
      .withColumn("r", expr("(n_rows * q_permille + 999) div 1000"))
    val bound = math.pow(10.0, 1 - p)
    val est = ranks
      .join(hist, hist("cum") >= ranks("r"), "left")
      .groupBy("q_permille", "n_rows")
      .agg(min("bucket_lo").as("est_milli"))
    val exa = ranks.select("q_permille", "r")
      .join(exact, exact("cum") >= col("r"), "left")
      .groupBy("q_permille")
      .agg(min("m").as("exact_milli"))
    est.join(exa, Seq("q_permille"))
      .select(
        col("q_permille").cast("bigint").as("q_permille"),
        col("n_rows").cast("bigint").as("n_rows"),
        col("est_milli").cast("bigint").as("est_milli"),
        col("exact_milli").cast("bigint").as("exact_milli"),
        // est == exact covers the 0-bucket quantile (0/0 would NaN
        // and false-fail the gate on a perfectly exact estimate)
        when(col("est_milli") === col("exact_milli"), lit(0.0))
          .otherwise(PortableRound.floorTo(
            (col("exact_milli") - col("est_milli")).cast("double") /
              col("exact_milli").cast("double"), 4)).as("rel_err"))
      .withColumn("in_bound", col("rel_err") <= lit(bound))
  }

  /** GROUPED quantile estimates — one row per (group, quantile) with
    * the sketch estimate only (the serving shape; the exact
    * verification leg is [[quantileProfile]]'s job). Unlike the
    * global profile, every window here PARTITIONS BY GROUP, so
    * nothing in the plan is single-task at any group count: the
    * per-group cumulative walk runs over that group's domain-bounded
    * bucket set. Columns: (group..., q_permille, n_rows, est_milli). */
  def groupedQuantiles(
      df: DataFrame,
      value: Column,
      groups: Seq[Column],
      p: Int,
      qsPerMille: Seq[Int]): DataFrame = {
    require(groups.nonEmpty, "no group columns")
    require(qsPerMille.nonEmpty && qsPerMille.forall(q => q >= 1 && q <= 1000),
      s"bad quantiles $qsPerMille")
    val ss = df.sparkSession
    import ss.implicits._
    val gNames = groups.indices.map(i => s"g$i")
    val rows = Parallelism.ensureMin(df)
      .select(groups.zip(gNames).map { case (c, n) => c.as(n) } :+
        bucketLo(toMilli(value), p).as("bucket_lo"): _*)
    val hist = rows.groupBy(gNames.map(col) :+ col("bucket_lo"): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("cum", sum("n").over(
        Window.partitionBy(gNames.map(col): _*).orderBy("bucket_lo")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = rows.groupBy(gNames.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
    val qs = qsPerMille.map(_.toLong).toDF("q_permille")
    val ranks = tot.crossJoin(broadcast(qs))
      .withColumn("r", expr("(n_rows * q_permille + 999) div 1000"))
    // Null-safe group equality: a null group key (e.g. a null ts in
    // qe16's hour derivation) must join its own histogram rows, not
    // fall out to est_milli = null — same reason KAnonymity uses <=>.
    ranks
      .join(hist,
        gNames.map(n => ranks(n) <=> hist(n)).reduce(_ && _) &&
          hist("cum") >= ranks("r"), "left")
      .groupBy(gNames.map(ranks(_)) :+ ranks("q_permille") :+
        ranks("n_rows"): _*)
      .agg(min("bucket_lo").as("est_milli"))
      .select(gNames.map(n => ranks(n).as(n)) ++ Seq(
        col("q_permille").cast("bigint").as("q_permille"),
        col("n_rows").cast("bigint").as("n_rows"),
        col("est_milli").cast("bigint").as("est_milli")): _*)
  }

  /** Merge derivation (the property that makes the sketch a 100 TB
    * counter): split rows into two md5 half-streams, sketch each half
    * independently, merge by bucket-wise ADDITION, and compare the
    * merged sketch bucket-for-bucket against the whole-stream sketch.
    * One summary row: (n_buckets_whole, n_buckets_merged, n_mismatch,
    * total_whole, total_merged). */
  def mergeProfile(
      df: DataFrame,
      value: Column,
      id: Column,
      p: Int): DataFrame = {
    val half = conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % 2
    val rows = Parallelism.ensureMin(df)
      .select(bucketLo(toMilli(value), p).as("bucket_lo"), half.as("h"))
    val merged = rows.groupBy("bucket_lo", "h").agg(count(lit(1)).as("n"))
      .groupBy("bucket_lo").agg(sum("n").as("n_merged"))
    val whole = rows.groupBy("bucket_lo").agg(count(lit(1)).as("n_whole"))
    whole.join(merged, Seq("bucket_lo"), "full_outer")
      .agg(
        count(when(col("n_whole").isNotNull, 1)).cast("bigint")
          .as("n_buckets_whole"),
        count(when(col("n_merged").isNotNull, 1)).cast("bigint")
          .as("n_buckets_merged"),
        sum(when(coalesce(col("n_whole"), lit(-1L)) =!=
          coalesce(col("n_merged"), lit(-2L)), 1L).otherwise(0L))
          .cast("bigint").as("n_mismatch"),
        sum(coalesce(col("n_whole"), lit(0L))).cast("bigint")
          .as("total_whole"),
        sum(coalesce(col("n_merged"), lit(0L))).cast("bigint")
          .as("total_merged"))
  }

  // ---- DuckDB oracles ----

  private def bucketSql(milli: String, p: Int): String =
    s"CAST(rpad(substring(CAST($milli AS VARCHAR), 1, $p), " +
      s"CAST(len(CAST($milli AS VARCHAR)) AS INTEGER), '0') AS BIGINT)"

  /** qe14 oracle — literal SQL twin of [[quantileProfile]] over
    * `events.value`. */
  def oracleQuantileSql(p: Int, qsPerMille: Seq[Int]): String =
    oracleQuantileSqlFrom("value", "events", p, qsPerMille)

  /** The same profile rooted on any FROM clause / value expression —
    * for oracles that compose the estimator onto a derived stream
    * (qe17 feeds it as-of conversion latencies). */
  def oracleQuantileSqlFrom(
      valueExpr: String, fromSql: String,
      p: Int, qsPerMille: Seq[Int]): String = {
    val qvals = qsPerMille.map(q => s"($q)").mkString(", ")
    val bound = math.pow(10.0, 1 - p)
    s"""WITH m AS (SELECT CAST(floor(($valueExpr) * 1000.0) AS BIGINT) AS m FROM $fromSql),
       |hist AS (SELECT ${bucketSql("m", p)} AS bucket_lo, count(*)::BIGINT AS n
       |         FROM m GROUP BY 1),
       |hc AS (SELECT bucket_lo, sum(n) OVER (ORDER BY bucket_lo) AS cum FROM hist),
       |ex AS (SELECT m, count(*)::BIGINT AS n FROM m GROUP BY m),
       |ec AS (SELECT m, sum(n) OVER (ORDER BY m) AS cum FROM ex),
       |qs(q_permille) AS (VALUES $qvals),
       |tot AS (SELECT count(*)::BIGINT AS n_rows FROM m),
       |rk AS (SELECT q_permille, n_rows,
       |              (n_rows * q_permille + 999) // 1000 AS r
       |       FROM qs, tot),
       |est AS (SELECT rk.q_permille, rk.n_rows, rk.r,
       |               min(hc.bucket_lo) AS est_milli
       |        FROM rk LEFT JOIN hc ON hc.cum >= rk.r
       |        GROUP BY 1, 2, 3),
       |full_rows AS (SELECT est.q_permille, est.n_rows, est.est_milli,
       |                     min(ec.m) AS exact_milli
       |              FROM est LEFT JOIN ec ON ec.cum >= est.r
       |              GROUP BY 1, 2, 3)
       |SELECT CAST(q_permille AS BIGINT) AS q_permille,
       |       CAST(n_rows AS BIGINT) AS n_rows,
       |       CAST(est_milli AS BIGINT) AS est_milli,
       |       CAST(exact_milli AS BIGINT) AS exact_milli,
       |       CASE WHEN est_milli = exact_milli THEN 0.0
       |            ELSE ${PortableRound.floorToSql(
          "CAST(exact_milli - est_milli AS DOUBLE) / CAST(exact_milli AS DOUBLE)", 4)} END AS rel_err,
       |       CASE WHEN est_milli = exact_milli THEN 0.0
       |            ELSE ${PortableRound.floorToSql(
          "CAST(exact_milli - est_milli AS DOUBLE) / CAST(exact_milli AS DOUBLE)", 4)} END <= $bound AS in_bound
       |FROM full_rows""".stripMargin
  }

  /** qe16 oracle — [[groupedQuantiles]] keyed by event hour. */
  def oracleHourlyQuantileSql(p: Int, qsPerMille: Seq[Int]): String =
    oracleGroupedQuantileSqlFrom(
      "CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT)", "hr",
      "value", "events", p, qsPerMille)

  /** [[groupedQuantiles]] twin rooted on any (group, value, FROM)
    * triple — the group equality is null-safe (IS NOT DISTINCT FROM)
    * to mirror the Spark side's `<=>`. qt59 roots it on the per-doc
    * quality score keyed by lang. */
  def oracleGroupedQuantileSqlFrom(
      groupExpr: String, groupAlias: String,
      valueExpr: String, fromSql: String,
      p: Int, qsPerMille: Seq[Int]): String = {
    val qvals = qsPerMille.map(q => s"($q)").mkString(", ")
    s"""WITH m AS (SELECT ($groupExpr) AS g,
       |                  CAST(floor(($valueExpr) * 1000.0) AS BIGINT) AS m
       |           FROM $fromSql),
       |hist AS (SELECT g, ${bucketSql("m", p)} AS bucket_lo, count(*)::BIGINT AS n
       |         FROM m GROUP BY 1, 2),
       |hc AS (SELECT g, bucket_lo,
       |              sum(n) OVER (PARTITION BY g ORDER BY bucket_lo) AS cum
       |       FROM hist),
       |tot AS (SELECT g, count(*)::BIGINT AS n_rows FROM m GROUP BY g),
       |qs(q_permille) AS (VALUES $qvals),
       |rk AS (SELECT g, n_rows, q_permille,
       |              (n_rows * q_permille + 999) // 1000 AS r
       |       FROM tot, qs)
       |SELECT rk.g AS $groupAlias, CAST(rk.q_permille AS BIGINT) AS q_permille,
       |       rk.n_rows, CAST(min(hc.bucket_lo) AS BIGINT) AS est_milli
       |FROM rk LEFT JOIN hc ON hc.g IS NOT DISTINCT FROM rk.g AND hc.cum >= rk.r
       |GROUP BY rk.g, rk.q_permille, rk.n_rows""".stripMargin
  }

  /** qe15 oracle — literal SQL twin of [[mergeProfile]] over
    * `events`. */
  def oracleMergeSql(p: Int): String =
    s"""WITH rows_h AS (
       |  SELECT ${bucketSql("CAST(floor(value * 1000.0) AS BIGINT)", p)} AS bucket_lo,
       |         CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS h
       |  FROM events),
       |merged AS (SELECT bucket_lo, CAST(sum(n) AS BIGINT) AS n_merged
       |           FROM (SELECT bucket_lo, h, count(*)::BIGINT AS n
       |                 FROM rows_h GROUP BY bucket_lo, h) z
       |           GROUP BY bucket_lo),
       |whole AS (SELECT bucket_lo, count(*)::BIGINT AS n_whole
       |          FROM rows_h GROUP BY bucket_lo)
       |SELECT count(CASE WHEN n_whole IS NOT NULL THEN 1 END)::BIGINT AS n_buckets_whole,
       |       count(CASE WHEN n_merged IS NOT NULL THEN 1 END)::BIGINT AS n_buckets_merged,
       |       CAST(sum(CASE WHEN coalesce(n_whole, -1) <> coalesce(n_merged, -2)
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
       |       CAST(sum(coalesce(n_whole, 0)) AS BIGINT) AS total_whole,
       |       CAST(sum(coalesce(n_merged, 0)) AS BIGINT) AS total_merged
       |FROM whole FULL OUTER JOIN merged USING (bucket_lo)""".stripMargin
}
