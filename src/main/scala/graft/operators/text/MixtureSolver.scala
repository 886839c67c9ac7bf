package graft.operators.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Capped-mixture WATER-FILLING: allocate a token budget across
  * sources proportionally to temperature weights (w = raw^α, α = 1/2 —
  * qt22's flattening), but no source can supply more than its
  * AVAILABLE (deduplicated) tokens — a saturated source is pinned at
  * its cap and its unmet share re-distributes over the remaining
  * sources, iteratively, until no new source saturates. This is the
  * solver every real mixture plan needs between qt22 (targets ignore
  * availability) and qp30 (epochs paper over the shortfall by
  * repeating data): the no-repeat allocation.
  *
  * Determinism (both engines bit-equal): weights are IEEE sqrt over
  * BIGINT token counts; each round's weight mass folds in SOURCE-NAME
  * ORDER with a 0.0 seed (the qt22 discipline — unordered SQL SUM over
  * doubles is not reproducible); allocations are
  * floor(CAST(B_i AS DOUBLE) · w / W_i) with the identical operation
  * order; budgets and caps are exact BIGINTs. Rounds are a FIXED
  * count R (each round only marks new saturations, so R ≥ #saturation
  * cascades reaches the fixpoint; the spec asserts fixpoint on the
  * fixture, and an unconverged tail is still bit-identical across
  * engines because both run exactly R rounds).
  *
  * Scale shape: all DATA work is the per-source aggregation feeding
  * the plan table (#sources rows); the solver itself runs driver-side
  * over that table — bounded by the source count, the same class as
  * the k-means centroid update or the tokenizer vocab collect, never
  * corpus-sized.
  */
object MixtureSolver {

  /** Per-source (raw, available = near-dedup-surviving) token table —
    * the plan input shared by qp30/qp31 and the `mix` CLI verb, so the
    * kept-token accounting exists exactly once: one token scan joined
    * to the qd15 keep-first survivors, one grouped aggregation. */
  def perSourceTokens(docs: DataFrame, threshold: Double): DataFrame = {
    val kept = graft.operators.dedup.PortableMinHash
      .dedupKeepFirst(docs, col("text"), "doc_id", threshold)
      .select(col("doc_id"), lit(1L).as("kept"))
    docs.select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("nt"))
      .join(kept, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(
        sum("nt").cast("bigint").as("raw_tokens"),
        sum(when(col("kept").isNotNull, col("nt")).otherwise(lit(0L)))
          .cast("bigint").as("avail_tokens"))
  }

  /** @param per (source, raw_tokens, avail_tokens) — one row per source
    * @param budget total tokens to allocate (exact integer)
    * @param rounds fixed water-filling round count
    * @return (source, raw_tokens, avail_tokens, target_tokens,
    *         saturated) */
  def waterFill(
      per: DataFrame, budget: Long, rounds: Int = 5)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(rounds >= 1 && budget >= 0, s"bad rounds=$rounds budget=$budget")
    final case class S(
        source: String, raw: Long, avail: Long, w: Double,
        var sat: Boolean, var alloc: Long)
    val rows = per
      .select(col("source").cast("string"), col("raw_tokens").cast("long"),
        col("avail_tokens").cast("long"))
      .as[(String, Long, Long)].collect()
      .sortBy(_._1)
      .map { case (s, raw, avail) =>
        S(s, raw, avail, math.sqrt(raw.toDouble), sat = false, alloc = 0L)
      }
    (1 to rounds).foreach { _ =>
      // this round's mass and remaining budget derive from the PREVIOUS
      // round's saturation set (fixed before any row updates), so row
      // order within the round cannot matter — mirrored in the oracle's
      // mechanical CTE chain
      val wsum = rows.iterator.filter(!_.sat).map(_.w).foldLeft(0.0)(_ + _)
      val bi = budget - rows.iterator.filter(_.sat).map(_.avail).sum
      rows.foreach { s =>
        if (!s.sat && wsum > 0.0) {
          val a = math.floor(bi.toDouble * s.w / wsum).toLong
          if (a >= s.avail) { s.sat = true; s.alloc = s.avail }
          else s.alloc = a
        }
      }
    }
    rows.toSeq
      .map(s => (s.source, s.raw, s.avail, s.alloc, s.sat))
      .toDF("source", "raw_tokens", "avail_tokens", "target_tokens",
        "saturated")
  }

  /** The mechanical R-round CTE twin of [[waterFill]] over a `per` CTE
    * exposing (source, raw_tokens, avail_tokens); `budgetSql` must be a
    * scalar BIGINT expression. Each round's weight mass is an ordered
    * list_reduce fold (source-name order, 0.0 seed). */
  def waterFillSql(budgetSql: String, rounds: Int = 5): String = {
    val roundCtes = (1 to rounds).map { i =>
      val p = s"r_${i - 1}"
      s"""w_$i AS MATERIALIZED (SELECT COALESCE(list_reduce(
         |           list_prepend(0.0, list(w ORDER BY source)),
         |           (x, y) -> x + y), 0.0) AS wsum
         |         FROM $p WHERE NOT sat),
         |b_$i AS MATERIALIZED (SELECT ($budgetSql) - COALESCE(
         |           (SELECT CAST(sum(avail) AS BIGINT) FROM $p WHERE sat),
         |           0) AS bi),
         |r_$i AS MATERIALIZED (SELECT source, raw_tokens, avail, w,
         |           CASE WHEN sat THEN true
         |                WHEN (SELECT wsum FROM w_$i) > 0.0 AND
         |                     CAST(floor(CAST((SELECT bi FROM b_$i) AS DOUBLE)
         |                                * w / (SELECT wsum FROM w_$i))
         |                          AS BIGINT) >= avail
         |                THEN true ELSE false END AS sat,
         |           CASE WHEN sat THEN avail
         |                WHEN (SELECT wsum FROM w_$i) > 0.0 AND
         |                     CAST(floor(CAST((SELECT bi FROM b_$i) AS DOUBLE)
         |                                * w / (SELECT wsum FROM w_$i))
         |                          AS BIGINT) >= avail
         |                THEN avail
         |                WHEN (SELECT wsum FROM w_$i) > 0.0
         |                THEN CAST(floor(CAST((SELECT bi FROM b_$i) AS DOUBLE)
         |                                * w / (SELECT wsum FROM w_$i))
         |                          AS BIGINT)
         |                ELSE alloc END AS alloc
         |         FROM $p)""".stripMargin
    }.mkString(",\n")
    s"""r_0 AS MATERIALIZED (SELECT source, raw_tokens, avail_tokens AS avail,
       |          sqrt(CAST(raw_tokens AS DOUBLE)) AS w,
       |          false AS sat, 0::BIGINT AS alloc
       |        FROM per),
       |$roundCtes
       |SELECT source, raw_tokens, avail AS avail_tokens,
       |       alloc AS target_tokens, sat AS saturated
       |FROM r_$rounds""".stripMargin
  }
}
