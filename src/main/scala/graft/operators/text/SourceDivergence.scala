package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{PortableRound, TextOps}

/** Pairwise source-distribution divergence: each source reduces to a
  * B-bucket multinomial over hashed unigram features (the DSIR model
  * shape), and every source PAIR gets its Jensen-Shannon divergence
  *
  *   JS(p,q) = ½·KL(p‖m) + ½·KL(q‖m),   m = (p+q)/2
  *
  * — the symmetric, bounded (≤ ln 2) measure of how DIFFERENTLY two
  * sources write, where qd27/qd28 measure how much they literally
  * SHARE. Low JS pairs are near-duplicate sources (merge or
  * deduplicate harder); high JS pairs are the diversity a mixture
  * design wants balanced. Used with qp14's budgets this is the
  * "which sources are actually distinct" input to mixture weighting.
  *
  * Scale shape: bucket counting is one map-side-combined aggregation
  * over exploded features; everything after runs on (sources × B) and
  * (source-pairs × B) tables whose size is set by the SOURCE COUNT
  * and B, not the corpus — at any corpus size the pair stage is a
  * self-join of an S·B-row table.
  *
  * Portability: per-bucket JS terms floor-scale to integer NANO-nats
  * and sum as BIGINTs (order-free); the documented bias is < B·1e-9
  * nats, far below any decision threshold. Value-oracled.
  */
object SourceDivergence {

  /** Pairwise JS matrix: (src_a, src_b, js) for src_a < src_b, js in
    * 6-dp nats (≤ ln 2 ≈ 0.6931). */
  def jsMatrix(
      df: DataFrame,
      text: Column,
      source: Column,
      buckets: Int = 512,
      smoothing: Long = 1L): DataFrame = {
    require(buckets >= 2, s"bad buckets $buckets")
    val ss = df.sparkSession
    import ss.implicits._
    val feats = graft.operators.Parallelism.ensureMin(df)
      .select(source.as("src"), explode(TextOps.tokens(text)).as("term"))
      .where(col("term") =!= "")
      .select(col("src"),
        (conv(substring(md5(col("term")), 1, 8), 16, 10).cast("long")
          % buckets).as("b"))
    val cnt = feats.groupBy("src", "b").agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy("src").agg(sum("n").as("t"))
    // dense (src, b) with Laplace smoothing — probabilities as exact
    // IEEE divisions of BIGINTs
    val dims = ss.range(buckets).select(col("id").as("b"))
    val dense = tot.crossJoin(dims)
      .join(cnt, Seq("src", "b"), "left")
      .select(col("src"), col("b"),
        ((coalesce(col("n"), lit(0L)) + lit(smoothing)).cast("double") /
          (col("t") + lit(smoothing * buckets)).cast("double")).as("p"))
    val a = dense.select(col("src").as("src_a"), col("b"),
      col("p").as("pa"))
    val bb = dense.select(col("src").as("src_b"), col("b"),
      col("p").as("pb"))
    val terms = a.join(bb, Seq("b")).where(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        // ½·pa·ln(2pa/(pa+pb)) + ½·pb·ln(2pb/(pa+pb)), nano-floored
        (floor(col("pa") * lit(0.5) *
          log(lit(2.0) * col("pa") / (col("pa") + col("pb"))) * lit(1e9))
          .cast("long") +
          floor(col("pb") * lit(0.5) *
            log(lit(2.0) * col("pb") / (col("pa") + col("pb"))) * lit(1e9))
            .cast("long")).as("t_nano"))
    terms.groupBy("src_a", "src_b")
      .agg(sum("t_nano").as("js_nano"))
      .select(col("src_a"), col("src_b"),
        PortableRound.floorTo(
          col("js_nano").cast("double") / lit(1e9), 6).as("js"))
  }

  /** qd29 oracle — literal SQL twin of [[jsMatrix]]. */
  def oracleSql(buckets: Int = 512, smoothing: Long = 1L): String =
    s"""WITH feats AS (
       |  SELECT source AS src,
       |         CAST(('0x' || substring(md5(term), 1, 8)) AS BIGINT) % $buckets AS b
       |  FROM (SELECT source, unnest(string_split(
       |          regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS term
       |        FROM documents) z
       |  WHERE term <> ''),
       |cnt AS (SELECT src, b, count(*)::BIGINT AS n FROM feats GROUP BY src, b),
       |tot AS (SELECT src, CAST(sum(n) AS BIGINT) AS t FROM cnt GROUP BY src),
       |dims AS (SELECT unnest(range(0, $buckets)) AS b),
       |dense AS (
       |  SELECT tot.src, dims.b,
       |         (CAST(coalesce(cnt.n, 0) + $smoothing AS DOUBLE) /
       |          CAST(tot.t + ${smoothing} * $buckets AS DOUBLE)) AS p
       |  FROM tot CROSS JOIN dims
       |  LEFT JOIN cnt ON cnt.src = tot.src AND cnt.b = dims.b),
       |terms AS (
       |  SELECT a.src AS src_a, q.src AS src_b,
       |         CAST(floor(a.p * 0.5 * ln(2.0 * a.p / (a.p + q.p)) * 1000000000.0) AS BIGINT) +
       |         CAST(floor(q.p * 0.5 * ln(2.0 * q.p / (a.p + q.p)) * 1000000000.0) AS BIGINT) AS t_nano
       |  FROM dense a JOIN dense q ON a.b = q.b AND a.src < q.src)
       |SELECT src_a, src_b,
       |       ${PortableRound.floorToSql(
          "CAST(sum(t_nano) AS DOUBLE) / 1000000000.0", 6)} AS js
       |FROM terms GROUP BY src_a, src_b""".stripMargin
}
