package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity audit (Sweeney 2002) — the release gate for relational
  * data: rows whose QUASI-IDENTIFIER combination (the columns an
  * adversary can link externally — region, segment, birth year …) is
  * shared by fewer than k rows are re-identifiable. The audit reports
  * the equivalence-class size distribution; [[suppress]] drops the
  * violating rows (suppression, the baseline anonymization every
  * release pipeline needs before generalization hierarchies enter).
  *
  * Scale shape: one hash aggregation keyed by the quasi-identifier
  * tuple (map-side partials), then a size-histogram rollup whose
  * cardinality is bounded by distinct class SIZES — corpus size never
  * appears after the first shuffle. `suppress` is the same
  * aggregation re-joined as a semi-join on the passing classes.
  */
object KAnonymity {

  /** Class-size histogram: (class_size, n_classes, n_rows, violating)
    * — one row per distinct equivalence-class size, flagged when the
    * size is under k. Always non-empty on non-empty input. */
  def audit(df: DataFrame, quasi: Seq[Column], k: Long): DataFrame = {
    require(quasi.nonEmpty, "no quasi-identifier columns")
    require(k >= 2, s"bad k $k")
    Parallelism.ensureMin(df)
      .groupBy(quasi: _*).agg(count(lit(1)).as("class_size"))
      .groupBy("class_size")
      .agg(
        count(lit(1)).as("n_classes"),
        sum("class_size").as("n_rows"))
      .select(
        col("class_size").cast("bigint").as("class_size"),
        col("n_classes").cast("bigint").as("n_classes"),
        col("n_rows").cast("bigint").as("n_rows"))
      .withColumn("violating", col("class_size") < k)
  }

  /** The k-anonymous subset: rows whose class has ≥ k members. */
  def suppress(df: DataFrame, quasi: Seq[Column], k: Long): DataFrame = {
    require(quasi.nonEmpty, "no quasi-identifier columns")
    require(k >= 2, s"bad k $k")
    val names = quasi.indices.map(i => s"__q$i")
    val keyed = df.select(
      col("*") +: quasi.zip(names).map { case (c, n) => c.as(n) }: _*)
    val ok = keyed.groupBy(names.map(col): _*)
      .agg(count(lit(1)).as("n")).where(col("n") >= k)
      .select(names.map(col): _*)
    keyed.join(ok, names, "left_semi").drop(names: _*)
  }

  /** l-diversity audit (Machanavajjhala et al. 2006) — k-anonymity's
    * necessary companion: a class can be large yet leak the SENSITIVE
    * attribute when every member shares one value (homogeneity
    * attack). Reports the histogram of per-class DISTINCT-sensitive
    * counts: (l_distinct, n_classes, n_rows, violating < l). Same
    * scale shape as [[audit]] with one extra distinct aggregation. */
  def diversityAudit(
      df: DataFrame,
      quasi: Seq[Column],
      sensitive: Column,
      l: Long): DataFrame = {
    require(quasi.nonEmpty, "no quasi-identifier columns")
    require(l >= 2, s"bad l $l")
    Parallelism.ensureMin(df)
      .groupBy(quasi: _*)
      .agg(
        count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("l_distinct"))
      .groupBy("l_distinct")
      .agg(
        count(lit(1)).as("n_classes"),
        sum("class_size").as("n_rows"))
      .select(
        col("l_distinct").cast("bigint").as("l_distinct"),
        col("n_classes").cast("bigint").as("n_classes"),
        col("n_rows").cast("bigint").as("n_rows"))
      .withColumn("violating", col("l_distinct") < l)
  }

  /** qp25 oracle — [[diversityAudit]] over customer with quasi =
    * c_nationkey and sensitive = c_mktsegment. */
  def oracleDiversitySql(l: Long): String =
    s"""WITH cls AS (
       |  SELECT c_nationkey, count(*)::BIGINT AS class_size,
       |         count(DISTINCT c_mktsegment)::BIGINT AS l_distinct
       |  FROM customer GROUP BY c_nationkey)
       |SELECT l_distinct,
       |       count(*)::BIGINT AS n_classes,
       |       CAST(sum(class_size) AS BIGINT) AS n_rows,
       |       l_distinct < $l AS violating
       |FROM cls GROUP BY l_distinct""".stripMargin

  /** qp24 oracle — [[audit]] over customer with quasi =
    * (c_nationkey, c_mktsegment). */
  def oracleAuditSql(k: Long): String =
    s"""WITH cls AS (
       |  SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS class_size
       |  FROM customer GROUP BY c_nationkey, c_mktsegment)
       |SELECT class_size,
       |       count(*)::BIGINT AS n_classes,
       |       CAST(sum(class_size) AS BIGINT) AS n_rows,
       |       class_size < $k AS violating
       |FROM cls GROUP BY class_size""".stripMargin
}
