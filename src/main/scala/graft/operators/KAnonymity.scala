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
      .select(names.map(n => col(n).as(s"ok_$n")): _*)
    // null-SAFE semi join: groupBy keys NULL quasi values into their
    // own class, so the membership join must match them too — a
    // null-unsafe using-join would drop every null-quasi row even
    // when its class passes k
    keyed.join(ok,
        names.map(n => col(n) <=> col(s"ok_$n")).reduce(_ && _),
        "left_semi")
      .drop(names: _*)
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
        // NULL is a leakable sensitive value too: count(DISTINCT)
        // skips it, so add it back when present (oracle mirrors)
        (countDistinct(sensitive) +
          max(when(sensitive.isNull, 1L).otherwise(0L))).as("l_distinct"))
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

  /** qp26 oracle — [[closenessAudit]] over customer with quasi =
    * c_nationkey and sensitive = c_mktsegment. */
  def oracleClosenessSql(t: Double): String =
    s"""WITH cs AS (
       |  SELECT c_nationkey AS q0, c_mktsegment AS s, count(*)::BIGINT AS n_cs
       |  FROM customer GROUP BY 1, 2),
       |cls AS (SELECT q0, CAST(sum(n_cs) AS BIGINT) AS n_c FROM cs GROUP BY q0),
       |sv AS (SELECT s, CAST(sum(n_cs) AS BIGINT) AS n_s FROM cs GROUP BY s),
       |tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_tot FROM sv),
       |grid AS (
       |  SELECT cls.q0, cls.n_c, sv.s, sv.n_s, tot.n_tot,
       |         coalesce(cs.n_cs, 0) AS n_cs
       |  FROM cls CROSS JOIN sv CROSS JOIN tot
       |  LEFT JOIN cs ON cs.q0 = cls.q0 AND cs.s = sv.s),
       |agg AS (
       |  SELECT q0, n_c, n_tot,
       |         CAST(sum(abs(n_cs * n_tot - n_s * n_c)) AS BIGINT) AS num
       |  FROM grid GROUP BY q0, n_c, n_tot)
       |SELECT q0, n_c AS class_size,
       |       ${PortableRound.floorToSql(
          "CAST(num AS DOUBLE) / (2.0 * CAST(n_c AS DOUBLE) * CAST(n_tot AS DOUBLE))", 4)} AS tv,
       |       ${PortableRound.floorToSql(
          "CAST(num AS DOUBLE) / (2.0 * CAST(n_c AS DOUBLE) * CAST(n_tot AS DOUBLE))", 4)} > $t AS violating
       |FROM agg""".stripMargin

  /** qp25 oracle — [[diversityAudit]] over customer with quasi =
    * c_nationkey and sensitive = c_mktsegment. */
  def oracleDiversitySql(l: Long): String =
    s"""WITH cls AS (
       |  SELECT c_nationkey, count(*)::BIGINT AS class_size,
       |         count(DISTINCT c_mktsegment)::BIGINT +
       |           CAST(max(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_distinct
       |  FROM customer GROUP BY c_nationkey)
       |SELECT l_distinct,
       |       count(*)::BIGINT AS n_classes,
       |       CAST(sum(class_size) AS BIGINT) AS n_rows,
       |       l_distinct < $l AS violating
       |FROM cls GROUP BY l_distinct""".stripMargin

  /** t-closeness audit (Li et al. 2007) — the third classic release
    * gate: even a DIVERSE class leaks when its sensitive-value
    * DISTRIBUTION diverges from the global one (skewness attack).
    * Per class, the total-variation distance between the class's
    * sensitive distribution and the corpus's:
    *
    *   tv = ½ · Σ_s | n_cs/n_c − N_s/N |
    *
    * computed as the EXACT integer Σ_s |n_cs·N − N_s·n_c| over the
    * common denominator 2·n_c·N, so the sum is order-free and the one
    * float is a single exact division (floor-projected at 4 dp).
    * Output: (quasi…, class_size, tv, violating > t). */
  def closenessAudit(
      df: DataFrame,
      quasi: Seq[Column],
      sensitive: Column,
      t: Double): DataFrame = {
    require(quasi.nonEmpty, "no quasi-identifier columns")
    require(t > 0 && t < 1, s"bad t $t")
    val names = quasi.indices.map(i => s"__q$i")
    val base = Parallelism.ensureMin(df).select(
      quasi.zip(names).map { case (c, n) => c.as(n) } :+
        sensitive.as("__s"): _*)
    val cs = base.groupBy(names.map(col) :+ col("__s"): _*)
      .agg(count(lit(1)).as("n_cs"))
    val cls = cs.groupBy(names.map(col): _*).agg(sum("n_cs").as("n_c"))
    val sv = cs.groupBy("__s").agg(sum("n_cs").as("n_s"))
    val tot = sv.agg(sum("n_s").as("n_tot"))
    // every (class, sensitive-value) pair contributes, INCLUDING pairs
    // a class never saw (n_cs = 0) — the dense grid is classes ×
    // values, two domain-bounded tables, never the corpus
    // null-SAFE grid join: NULL is a legitimate quasi or sensitive
    // value (groupBy keyed it into its own class/value above); a
    // null-unsafe using-join would zero n_cs for every null-valued
    // cell and skew tv in both directions
    val csR = cs.select(
      (names.map(n => col(n).as(s"cs_$n")) :+
        col("__s").as("cs_s") :+ col("n_cs")): _*)
    val grid = cls.crossJoin(sv.crossJoin(broadcast(tot)))
      .join(csR,
        (names.map(n => col(n) <=> col(s"cs_$n")) :+
          (col("__s") <=> col("cs_s"))).reduce(_ && _),
        "left")
      .na.fill(0L, Seq("n_cs"))
    grid
      .groupBy(names.map(col) :+ col("n_c") :+ col("n_tot"): _*)
      .agg(sum(abs(col("n_cs") * col("n_tot") - col("n_s") * col("n_c")))
        .as("num"))
      .select(names.zip(quasi.indices).map { case (n, i) =>
        col(n).as(s"q$i")
      } ++ Seq(
        col("n_c").cast("bigint").as("class_size"),
        PortableRound.floorTo(
          col("num").cast("double") /
            (lit(2.0) * col("n_c").cast("double") *
              col("n_tot").cast("double")), 4).as("tv")): _*)
      .withColumn("violating", col("tv") > t)
  }

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
