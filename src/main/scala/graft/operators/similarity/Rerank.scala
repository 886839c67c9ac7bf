package graft.operators.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.similarity.ProductQuantizer.Codebook

/** Two-stage ANN serving: a cheap coarse scan over compressed codes
  * proposes `coarseK` candidates, then ONLY those rows are re-ranked
  * by exact cosine against the original vectors. This is the standard
  * production refinement on top of PQ — ADC distances are lossy (the
  * codebook quantizes), so serving stacks recall out of the cheap scan
  * and precision out of an exact pass whose cost is O(coarseK), not
  * O(corpus). (No reference analog; part of the added LLM-pipeline
  * surface — the reference stops at BLOB passthrough,
  * mysqlDataSyncTool cmd/root.go:423-424.)
  *
  * Scale shape: stage 1 is [[ProductQuantizer.adcTopK]] — map-only
  * scoring of the 32-bit codes table (m lookups per row against
  * driver-inlined literals) + TakeOrdered, no shuffle, never touches
  * vectors. Stage 2 broadcasts the coarseK candidate ids (bounded,
  * ~100 rows) into ONE hash join against the vector corpus — the
  * corpus is scanned, never shuffled, and exact cosines are computed
  * for coarseK rows only. At 100 TB the vectors live cold (parquet)
  * while the codes live hot; this operator is exactly the read path
  * that layout exists for.
  */
object Rerank {

  /** Exact-cosine top-k over the ADC-proposed candidate set.
    * `coarseK` >= topk is the recall knob: the true top-k survives
    * whenever ADC ranks it inside the first coarseK. */
  def topK(
      emb: DataFrame,
      vec: Column,
      id: Column,
      probe: Seq[Float],
      topk: Int,
      coarseK: Int,
      cb: Codebook = ProductQuantizer.DefaultCodebook): DataFrame = {
    require(coarseK >= topk, s"coarseK ($coarseK) must be >= topk ($topk)")
    val codes = ProductQuantizer.encode(emb, vec, id, cb)
    val cand = ProductQuantizer.adcTopK(codes, probe, coarseK, cb)
      .select(col("vec_id"))
    val q = typedLit(probe)
    emb.select(id.as("vec_id"), vec.as("__v"))
      .join(broadcast(cand), Seq("vec_id"), "left_semi")
      .select(col("vec_id"), VectorOps.cosine(col("__v"), q).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(topk)
      .select(col("vec_id"), graft.operators.PortableRound.floorTo(col("cosine"), 4).as("cosine"))
  }

  // ---- oracle SQL ----

  /** Same sequential double fold as VectorExprs.dot. */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, 65), i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x, y) -> x + y)"

  private def cosineSql(a: String, b: String): String = {
    val d = s"sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})"
    s"CASE WHEN $d = 0 THEN 0.0 ELSE ${dotSql(a, b)} / ($d) END"
  }

  /** qs17: the qs14 ADC candidate CTE (LIMIT coarseK) feeding the qs02
    * exact-cosine ranking — both stages already value-oracled alone,
    * composed here under one statement. Candidate selection is
    * bit-identical across engines (fixed-order ADC add chain, vec_id
    * ties), so the re-ranked top-k agrees exactly. */
  def oracleSql(topk: Int, coarseK: Int): String = {
    val codeCols = ProductQuantizer.codeColsSql("embedding")
    val chain = ProductQuantizer.adcChainSql
    s"""WITH p AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0),
       |codes AS (
       |  SELECT vec_id, $codeCols
       |  FROM embeddings),
       |cand AS (
       |  SELECT z.vec_id FROM (
       |    SELECT z.vec_id, $chain AS adc
       |    FROM codes z, p) z
       |  ORDER BY adc, vec_id LIMIT $coarseK)
       |SELECT vec_id, (floor((c) * 10000.0) / 10000.0) AS cosine FROM (
       |  SELECT e.vec_id, ${cosineSql("e.embedding", "p.pe")} AS c
       |  FROM embeddings e JOIN cand USING (vec_id), p) z2
       |ORDER BY c DESC, vec_id LIMIT $topk""".stripMargin
  }
}
