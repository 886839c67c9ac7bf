package graft.operators.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF × PQ — the billion-scale ANN SERVING composition the two
  * pieces exist to form: [[PortableIvf]] prunes WHICH files a query
  * reads (codes persist parquet-partitioned by coarse cell, so a
  * probe touches only its `nprobe` cells' files), and
  * [[ProductQuantizer]] shrinks WHAT each file holds (one 32-bit code
  * per vector instead of 256 float bytes). A query therefore scans
  * `nprobe/numCells` of the corpus at 64× compression — at 100 TB of
  * embeddings that is the difference between an interactive lookup
  * and a full-corpus pass, with the scan itself map-only ADC scoring
  * + TakeOrdered (no shuffle, the original vectors never read).
  * (No reference analog; part of the added LLM-pipeline surface.)
  *
  * The cell assignment and codebooks are the md5-derived portable
  * families, so the whole serving path — cell restriction, per-code
  * ADC distances, ranking — is value-oracled end to end (qs15, the
  * qs07 × qs14 composition).
  */
object IvfPq {

  /** The serving rows: (id, coarse cell, packed PQ code) — everything
    * the index stores per vector, 12 bytes of payload. One map-only
    * pass; both assignments fold into codegen as literal codebooks. */
  def encode(df: DataFrame, vec: Column, id: Column,
      cb: ProductQuantizer.Codebook = ProductQuantizer.DefaultCodebook): DataFrame =
    df.select(
      id.as("id"),
      PortableIvf.cell(vec).as("cell"),
      ProductQuantizer.packedCode(vec, cb).as("pq_code"))

  /** Persist the serving index: codes parquet-PARTITIONED by cell, so
    * a probed read prunes non-probed cells at the FILE level (Spark
    * partition pruning — `PartitionFilters` in the scan, asserted in
    * SimilaritySpec), not per-row. */
  def writeIndex(df: DataFrame, vec: Column, id: Column, dir: String,
      cb: ProductQuantizer.Codebook = ProductQuantizer.DefaultCodebook): Unit =
    encode(df, vec, id, cb)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/codes")

  /** ADC top-k against a persisted index: restrict to the `nprobe`
    * cells nearest the probe (partition-pruned scan), then the
    * codes-only ADC scan. */
  def topKIndexed(spark: SparkSession, dir: String, probe: Seq[Float],
      topk: Int, nprobe: Int,
      cb: ProductQuantizer.Codebook = ProductQuantizer.DefaultCodebook): DataFrame =
    adcTopK(spark.read.parquet(s"$dir/codes"), probe, topk, nprobe, cb)

  /** The same restriction + scan over in-memory (id, cell, pq_code)
    * rows — [[encode]]'s output or the persisted index read back. */
  def adcTopK(codes: DataFrame, probe: Seq[Float], topk: Int, nprobe: Int,
      cb: ProductQuantizer.Codebook = ProductQuantizer.DefaultCodebook): DataFrame = {
    val best = PortableIvf.probedCells(probe, nprobe)
    ProductQuantizer.adcTopK(
      codes.filter(col("cell").isin(best: _*)).select("id", "pq_code"),
      probe, topk, cb)
  }

  /** DuckDB rendition of the composition: probed cells exactly as
    * qs07's oracle, codes + ADC chain exactly as qs14's, the cell
    * restriction applied to the codes CTE. */
  def oracleSql(topk: Int, nprobe: Int): String = {
    val codeCols = ProductQuantizer.codeColsSql("embedding")
    val chain = ProductQuantizer.adcChainSql
    s"""WITH p AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0),
       |probed AS (SELECT unnest(list_transform(
       |             list_slice(list_reverse_sort(${PortableIvf.scoredListSql("p.pe")}), 1, $nprobe),
       |             x -> CAST(x[2] AS INT))) AS cell
       |           FROM p),
       |codes AS (
       |  SELECT vec_id, ${PortableIvf.cellSql("embedding")} AS cell,
       |       $codeCols
       |  FROM embeddings)
       |SELECT vec_id, round(adc, 4) AS adc_dist FROM (
       |  SELECT z.vec_id, $chain AS adc
       |  FROM codes z, p
       |  WHERE z.cell IN (SELECT cell FROM probed)) z2
       |ORDER BY adc, vec_id LIMIT $topk""".stripMargin
  }
}
