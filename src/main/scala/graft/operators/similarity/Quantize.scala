package graft.operators.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic symmetric int8 quantization of embedding columns —
  * the storage-side step of a 100 TB vector pipeline (4× smaller than
  * float32 at little recall cost; dot products stay integer until the
  * final rescale).
  *
  * Determinism across engines is by construction: `scale = 127 /
  * max(|x|)` uses only IEEE divide on identical inputs, and each code
  * is `floor(x·scale + 0.5)` — multiply, add, floor are all exactly
  * rounded operations, so the codes are bit-identical anywhere IEEE
  * doubles are (unlike `round()`, whose half-way tie mode differs
  * between engines). Zero vectors quantize to all-zero with scale 0.
  */
object Quantize {

  /** Per-element int8 codes (as longs) for an `array<float>` column. */
  def codes(vec: Column, scale: Column): Column =
    transform(vec, x => floor(x.cast("double") * scale + lit(0.5)))

  /** 127 / max(|x|), 0 for the all-zero vector. */
  def scaleFor(vec: Column): Column = {
    val mx = array_max(transform(vec, x => abs(x.cast("double"))))
    when(mx === 0.0, lit(0.0)).otherwise(lit(127.0) / mx)
  }

  /** Per-vector quantization summary: scale (rounded 6) and exact
    * integer checksums of the codes — the oracle-able witness that the
    * full code arrays agree without shipping 64 columns. The code array
    * materializes ONCE per row (`__q`): Catalyst does not CSE
    * higher-order-function lambdas, so inlining `codes(...)` into the
    * three summaries would quantize every embedding three times. */
  def profile(df: DataFrame, vec: Column, id: Column): DataFrame =
    df.withColumn("__scale", scaleFor(vec))
      .withColumn("__q", codes(vec, col("__scale")))
      .select(
        id.as("id"),
        graft.operators.PortableRound.floorTo(col("__scale"), 6).as("scale"),
        aggregate(col("__q"), lit(0L),
          (acc, x) => acc + x.cast("long")).as("q_sum"),
        array_min(col("__q")).cast("long").as("q_min"),
        array_max(col("__q")).cast("long").as("q_max"))

  /** Exact top-k over int8 codes — the memory-lean search tier between
    * full-precision brute force (qs02) and PQ/ADC (qs14): codes are 4×
    * smaller than float32 and the dot product stays INTEGER (exact on
    * any engine, no rounding conventions needed) until one final
    * rescale by the two scales. Map-only scan + TakeOrdered, the qs02
    * shape at a quarter of the memory bandwidth; zero-scale (all-zero)
    * vectors score 0 by convention on both engines. */
  def topKInt8(
      df: DataFrame,
      vec: Column,
      id: Column,
      queryId: Long,
      k: Int): DataFrame = {
    require(k >= 1, s"bad k $k")
    val coded = df
      .withColumn("__s", scaleFor(vec))
      .withColumn("__q", codes(vec, col("__s")))
      .select(id.as("id"), col("__s"), col("__q"))
    val q = coded.filter(col("id") === queryId)
      .select(col("__s").as("qscale"), col("__q").as("qq"))
    coded.filter(col("id") =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("qdot",
        aggregate(
          zip_with(col("__q"), col("qq"),
            (a, b) => a.cast("long") * b.cast("long")),
          lit(0L), (acc, x) => acc + x))
      .withColumn("score",
        when(col("__s") * col("qscale") === 0.0, lit(0.0))
          .otherwise(graft.operators.PortableRound.floorTo(col("qdot").cast("double") / (col("__s") * col("qscale")), 4)))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
      .select(col("id"), col("qdot"), col("score"))
  }

  /** DuckDB twin of [[topKInt8]] (query = corpus row `queryId`). */
  def oracleTopKSql(queryId: Long, k: Int, dim: Int = 64): String =
    s"""WITH sc AS (
       |  SELECT vec_id, embedding,
       |         CASE WHEN list_max(list_transform(embedding, x -> abs(x::DOUBLE))) = 0
       |              THEN 0.0
       |              ELSE 127.0 / list_max(list_transform(embedding, x -> abs(x::DOUBLE)))
       |         END AS scale
       |  FROM embeddings),
       |q AS (SELECT vec_id, scale,
       |        list_transform(embedding, x -> floor(x::DOUBLE * scale + 0.5)) AS qs
       |      FROM sc),
       |probe AS (SELECT scale AS qscale, qs AS qqs FROM q WHERE vec_id = $queryId),
       |z AS (SELECT vec_id,
       |        CAST(list_sum(list_transform(range(1, ${dim + 1}),
       |          i -> CAST(q.qs[i] AS BIGINT) * CAST(probe.qqs[i] AS BIGINT)))
       |          AS BIGINT) AS qdot,
       |        q.scale * probe.qscale AS ss
       |      FROM q, probe WHERE q.vec_id <> $queryId)
       |SELECT vec_id AS id, qdot,
       |       CASE WHEN ss = 0 THEN 0.0
       |            ELSE (floor((CAST(qdot AS DOUBLE) / ss) * 10000.0) / 10000.0) END AS score
       |FROM z ORDER BY score DESC, vec_id LIMIT $k""".stripMargin

  /** DuckDB twin of [[profile]] over the `embeddings` table. */
  def oracleSql: String =
    """WITH sc AS (
      |  SELECT vec_id, embedding,
      |         CASE WHEN list_max(list_transform(embedding, x -> abs(x::DOUBLE))) = 0
      |              THEN 0.0
      |              ELSE 127.0 / list_max(list_transform(embedding, x -> abs(x::DOUBLE)))
      |         END AS scale
      |  FROM embeddings),
      |q AS (SELECT vec_id, scale,
      |        list_transform(embedding, x -> floor(x::DOUBLE * scale + 0.5)) AS qs
      |      FROM sc)
      |SELECT vec_id AS id, (floor((scale) * 1000000.0) / 1000000.0) AS scale,
      |       CAST(list_sum(qs) AS BIGINT) AS q_sum,
      |       CAST(list_min(qs) AS BIGINT) AS q_min,
      |       CAST(list_max(qs) AS BIGINT) AS q_max
      |FROM q""".stripMargin
}
