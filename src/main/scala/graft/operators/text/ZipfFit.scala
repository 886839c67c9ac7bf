package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{PortableRound, TextOps}

/** Zipf-law fit — the classic corpus-naturalness diagnostic: natural
  * language term frequencies follow freq ∝ rank^s with s ≈ −1
  * (Zipf 1949); template soup, boilerplate floods and synthetic spam
  * bend the slope away from −1 or break the linearity. The fit is an
  * ordinary least-squares regression of ln(freq) on ln(rank) over the
  * top-N terms of each group (language here), the standard rank-size
  * estimation.
  *
  * Scale shape: term counting is the vocabulary-sized aggregation
  * every text operator here shares (map-side partials, shuffle keyed
  * by term); ranking is a per-group window over the top-N VOCABULARY
  * slice, never the corpus; the regression reduces to four integer
  * sums. Output is one row per group.
  *
  * Portability: ln(rank) and ln(freq) floor-scale to integer
  * MILLI-NATS, so all four OLS sums are order-free BIGINT sums
  * (products stay ≤ ~1e11 per term at N=10^3 — no overflow), and the
  * slope/intercept are single exact IEEE divisions of integers,
  * floor-projected at 4 dp. Value-oracled in DuckDB.
  */
object ZipfFit {

  /** Per-group Zipf fit over the top-N terms: (group, n_terms, slope,
    * intercept) — slope ≈ −1 for natural text. */
  def fit(
      df: DataFrame,
      text: Column,
      group: Column,
      topN: Int = 500): DataFrame = {
    require(topN >= 2, s"bad topN $topN")
    val toks = graft.operators.Parallelism.ensureMin(df)
      .select(group.as("g"), explode(TextOps.tokens(text)).as("term"))
      .where(col("term") =!= "")
    val cnt = toks.groupBy("g", "term").agg(count(lit(1)).as("n"))
    val ranked = cnt
      .withColumn("rnk", row_number().over(
        Window.partitionBy("g").orderBy(col("n").desc, col("term"))))
      .where(col("rnk") <= topN)
    val milliLn = (c: Column) =>
      floor(log(c.cast("double")) * lit(1000.0)).cast("long")
    val xy = ranked.select(
      col("g"),
      milliLn(col("rnk")).as("x"),
      milliLn(col("n")).as("y"))
    // Degenerate slice guard: a group whose ranked slice has a single
    // distinct (rank,term) point has m·sxx − sx² = 0, so the OLS slope
    // is 0/0. Spark's floor(NaN·10⁴) and DuckDB's floor(nan) render
    // differently, so such a corpus would break the value oracle; emit
    // NULL as the explicit "no fit" sentinel in BOTH engines instead.
    xy.groupBy("g")
      .agg(
        count(lit(1)).as("m"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("den",
        (col("m") * col("sxx") - col("sx") * col("sx")).cast("double"))
      .withColumn("slope_raw",
        when(col("den") === 0.0, lit(null).cast("double")).otherwise(
          (col("m") * col("sxy") - col("sx") * col("sy")).cast("double") /
            col("den")))
      .select(
        col("g").as("grp"),
        col("m").cast("bigint").as("n_terms"),
        PortableRound.floorTo(col("slope_raw"), 4).as("slope"),
        PortableRound.floorTo(
          (col("sy").cast("double") / lit(1000.0) / col("m").cast("double")) -
            col("slope_raw") *
            (col("sx").cast("double") / lit(1000.0) / col("m").cast("double")),
          4).as("intercept"))
  }

  /** qt54 oracle — literal SQL twin of [[fit]] with group = lang. */
  def oracleSql(topN: Int = 500): String =
    s"""WITH toks AS (
       |  SELECT lang AS g, unnest(string_split(
       |           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS term
       |  FROM documents),
       |cnt AS (SELECT g, term, count(*)::BIGINT AS n FROM toks
       |        WHERE term <> '' GROUP BY g, term),
       |ranked AS (SELECT g, n,
       |             row_number() OVER (PARTITION BY g ORDER BY n DESC, term) AS rnk
       |           FROM cnt QUALIFY rnk <= $topN),
       |xy AS (SELECT g,
       |         CAST(floor(ln(CAST(rnk AS DOUBLE)) * 1000.0) AS BIGINT) AS x,
       |         CAST(floor(ln(CAST(n AS DOUBLE)) * 1000.0) AS BIGINT) AS y
       |       FROM ranked),
       |s AS (SELECT g, count(*)::BIGINT AS m,
       |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |        CAST(sum(x * y) AS BIGINT) AS sxy,
       |        CAST(sum(x * x) AS BIGINT) AS sxx
       |      FROM xy GROUP BY g)
       |SELECT g AS grp, m AS n_terms,
       |       ${PortableRound.floorToSql(slopeSql, 4)} AS slope,
       |       ${PortableRound.floorToSql(
          "(CAST(sy AS DOUBLE) / 1000.0 / CAST(m AS DOUBLE)) - " +
            s"($slopeSql) * " +
            "(CAST(sx AS DOUBLE) / 1000.0 / CAST(m AS DOUBLE))", 4)} AS intercept
       |FROM s""".stripMargin

  /** NULL-guarded OLS slope — the SQL twin of the `slope_raw` guard
    * in [[fit]] (floor(NULL·10⁴) is NULL in both engines). */
  private def slopeSql: String =
    "CASE WHEN m * sxx - sx * sx = 0 THEN NULL " +
      "ELSE CAST(m * sxy - sx * sy AS DOUBLE) / " +
      "CAST(m * sxx - sx * sx AS DOUBLE) END"
}
