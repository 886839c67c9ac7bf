package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Intra-document repetition profile — the Gopher-family repetition
  * rules (Rae et al. 2021 §A1.1: "fraction of characters in the most
  * frequent n-gram" / "in duplicate n-grams") that catch boilerplate
  * loops, keyword stuffing and templating qt13's CROSS-document span
  * dedup cannot see (a doc repeating ITSELF is unique corpus-wide):
  *
  *   - `top2_milli` — character mass of the single most frequent
  *     bigram (count × gram length) per mille of the doc's normalized
  *     characters;
  *   - `dup5_mass` / `dup5_milli` — occurrence-weighted character
  *     mass of all 5-grams occurring ≥ 2 times. Occurrence-weighting
  *     over overlapping grams UPPER-BOUNDS Gopher's per-character
  *     measure (a character inside two duplicated grams counts
  *     twice, so the ratio can exceed 1000) — monotone in actual
  *     repetition, which is all a ranking gate needs, and exactly
  *     SQL-reproducible where the per-character measure is not.
  *
  * Scale shape: grams never leave their (doc, gram) group — two
  * vocabulary-style aggregations keyed by (id, gram) with map-side
  * partials, one per-doc window over bigram COUNTS (each partition a
  * single doc's vocabulary), then one per-doc equi-join of the two
  * rollups. No corpus-wide state anywhere.
  *
  * Portability: all-integer columns; ratios are (mass·1000) div
  * chars with a zero-chars guard (DuckDB errors on integer //0);
  * the top bigram cuts on (count desc, gram asc) in both engines.
  */
object RepetitionProfile {

  private def grams(toks: Column, n: Int): Column =
    transform(
      sequence(lit(1), greatest(size(toks) - lit(n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n))))

  /** Per-doc profile: (id, total_chars, top2_cnt, top2_milli,
    * dup5_mass, dup5_milli). */
  def profile(df: DataFrame, text: Column, id: Column): DataFrame = {
    val base = graft.operators.Parallelism.ensureMin(df)
      .select(id.as("id"), TextOps.tokens(text).as("toks"))
      .select(col("id"), length(concat_ws(" ", col("toks"))).cast("long")
        .as("total_chars"), col("toks"))
    def gramCounts(n: Int) = base
      .select(col("id"), col("total_chars"),
        explode(grams(col("toks"), n)).as("g"))
      .groupBy("id", "total_chars", "g")
      .agg(count(lit(1)).as("cnt"))
    val top2 = gramCounts(2)
      .withColumn("rn", row_number().over(
        Window.partitionBy("id").orderBy(col("cnt").desc, col("g"))))
      .where(col("rn") === 1)
      .select(col("id"), col("total_chars"), col("cnt").as("top2_cnt"),
        (col("cnt") * length(col("g")).cast("long")).as("top2_mass"))
    val dup5 = gramCounts(5)
      .where(col("cnt") >= 2L)
      .groupBy("id")
      .agg(sum(col("cnt") * length(col("g")).cast("long")).as("dup5_mass"))
    top2.join(dup5, Seq("id"), "left")
      .withColumn("dup5_mass", coalesce(col("dup5_mass"), lit(0L)))
      .select(
        col("id"), col("total_chars"), col("top2_cnt"),
        when(col("total_chars") === 0L, lit(0L))
          .otherwise(expr("top2_mass * 1000 div total_chars"))
          .as("top2_milli"),
        col("dup5_mass"),
        when(col("total_chars") === 0L, lit(0L))
          .otherwise(expr("dup5_mass * 1000 div total_chars"))
          .as("dup5_milli"))
  }

  /** qt58 oracle — literal SQL twin of [[profile]] over `documents`. */
  def oracleSql(): String = {
    val norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    def gramsSql(n: Int) =
      s"""list_transform(
         |  range(1, greatest(len(string_split($norm, ' ')) - ${n - 1}, 1) + 1),
         |  i -> list_aggregate(list_slice(string_split($norm, ' '), i, i + ${n - 1}),
         |                      'string_agg', ' '))""".stripMargin
    s"""WITH base AS (
       |  SELECT doc_id AS id, length($norm)::BIGINT AS total_chars,
       |         ${gramsSql(2)} AS g2, ${gramsSql(5)} AS g5
       |  FROM documents),
       |c2 AS (
       |  SELECT id, total_chars, g, count(*)::BIGINT AS cnt
       |  FROM (SELECT id, total_chars, unnest(g2) AS g FROM base) z
       |  GROUP BY id, total_chars, g),
       |top2 AS (
       |  SELECT id, total_chars, cnt AS top2_cnt,
       |         cnt * length(g)::BIGINT AS top2_mass,
       |         row_number() OVER (PARTITION BY id
       |                            ORDER BY cnt DESC, g) AS rn
       |  FROM c2 QUALIFY rn = 1),
       |c5 AS (
       |  SELECT id, g, count(*)::BIGINT AS cnt
       |  FROM (SELECT id, unnest(g5) AS g FROM base) z
       |  GROUP BY id, g),
       |dup5 AS (
       |  SELECT id, CAST(sum(cnt * length(g)) AS BIGINT) AS dup5_mass
       |  FROM c5 WHERE cnt >= 2 GROUP BY id)
       |SELECT t.id, t.total_chars, t.top2_cnt,
       |       CASE WHEN t.total_chars = 0 THEN 0
       |            ELSE t.top2_mass * 1000 // t.total_chars END AS top2_milli,
       |       coalesce(d.dup5_mass, 0) AS dup5_mass,
       |       CASE WHEN t.total_chars = 0 THEN 0
       |            ELSE coalesce(d.dup5_mass, 0) * 1000 // t.total_chars
       |       END AS dup5_milli
       |FROM top2 t LEFT JOIN dup5 d ON t.id = d.id""".stripMargin
  }
}
