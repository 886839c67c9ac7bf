package graft.operators.dedup

import graft.operators.Barrier
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableSimHashSig
import graft.operators.TextOps

/** Cross-engine-verifiable SimHash (companion to [[PortableMinHash]]):
  * fingerprints and blocked Hamming pairs whose every operation DuckDB
  * reproduces bit-identically, so both get full value oracles (qd11,
  * qd12). The production SimHash ([[SimHashDedup]], FNV family, banded
  * buckets) stays the scale path; the oracled pair query blocks on a
  * key (`source`) and verifies Hamming exactly within blocks — the
  * same sub-quadratic discipline as [[NGramJaccard.pairsWithinBlock]].
  */
object PortableSimHash {

  def fingerprints(df: DataFrame, text: Column, id: Column): DataFrame =
    graft.operators.Parallelism.ensureMin(df)
      .select(id.as("doc_id"),
        PortableSimHashSig(TextOps.normalized(text)).as("simhash"))

  def pairsWithinBlock(
      df: DataFrame,
      text: Column,
      id: Column,
      block: Column,
      maxHamming: Int): DataFrame = {
    val f = graft.operators.Parallelism.ensureMin(df)
      .select(block.as("blk"), id.as("id"),
        PortableSimHashSig(TextOps.normalized(text)).as("sh"))
      .transform(Barrier.apply)
    val a = f.select(col("blk"), col("id").as("doc_a"), col("sh").as("sh_a"))
    val b = f.select(col("blk"), col("id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("blk"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming",
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  private val normSql = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
  private val hashSql =
    s"""list_transform(string_split($normSql, ' '),
       |  t -> CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT))""".stripMargin

  /** DuckDB rendition of the fingerprint: identical md5-prefix token
    * hashes and majority vote. */
  def oracleFingerprintSql: String =
    s"""SELECT doc_id,
       |  CAST(list_sum(list_transform(range(0, 60), b ->
       |    CASE WHEN 2 * list_sum(list_transform(hs, x -> (x >> b) & 1)) > len(hs)
       |         THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT) AS simhash
       |FROM (SELECT doc_id, $hashSql AS hs FROM documents) h""".stripMargin

  def oraclePairsSql(maxHamming: Int): String =
    s"""WITH f AS (
       |  SELECT doc_id, source,
       |    CAST(list_sum(list_transform(range(0, 60), b ->
       |      CASE WHEN 2 * list_sum(list_transform(hs, x -> (x >> b) & 1)) > len(hs)
       |           THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT) AS sh
       |  FROM (SELECT doc_id, source, $hashSql AS hs FROM documents) h)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
       |FROM f a JOIN f b ON a.source = b.source AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sh, b.sh)) <= $maxHamming""".stripMargin
}
