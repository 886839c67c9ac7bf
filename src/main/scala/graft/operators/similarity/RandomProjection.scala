package graft.operators.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorExprs

/** Johnson–Lindenstrauss random projection — the dimensionality
  * reducer in front of ANN/clustering when the embedding width is the
  * cost driver: k' = k·(±1) sign projections scaled by 1/√k' preserve
  * pairwise distances within ~1/√k' distortion (Achlioptas's
  * database-friendly JL construction — signs, not Gaussians).
  * (No reference analog; part of the added LLM-pipeline surface.)
  *
  * Deterministic and engine-portable by construction: sign(j, i) is
  * the parity of the first byte of md5("j:i"), so the projection
  * matrix is a pure function of (k, dim) that DuckDB re-derives
  * in-query — the whole projection carries a value oracle (qs12),
  * unlike seeded-RNG matrices.
  *
  * Scale shape: a map-only pass — the k'×dim sign matrix rides into
  * codegen as literals (one native [[VectorExprs.dot]] fold per output
  * component), vectors never shuffle, output is k'/dim of the input
  * bytes. Chain `.proj` into `Quantize` for another 4× on top.
  */
object RandomProjection {

  /** ±1 sign from md5 parity — matches the SQL
    * `CAST('0x'||substring(md5(j||':'||i),1,2) AS INT) % 2`. */
  private def signOf(j: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s"$j:$i".getBytes("UTF-8"))
    if ((d(0) & 0xff) % 2 == 0) 1.0 else -1.0
  }

  /** The k'×dim sign matrix (row j = output component j). */
  def signs(kOut: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(kOut)(j => Array.tabulate(dim)(i => signOf(j, i)))

  /** (id, proj[kOut]) — each output component one native dot fold
    * against a literal sign row, scaled by 1/√kOut. */
  def project(df: DataFrame, vec: Column, id: Column, kOut: Int, dim: Int): DataFrame = {
    require(kOut > 0 && dim > 0, s"bad kOut=$kOut / dim=$dim")
    val s = signs(kOut, dim)
    val factor = 1.0 / math.sqrt(kOut.toDouble)
    val comps = (0 until kOut).map(j =>
      VectorExprs.dot(vec, typedLit(s(j).toSeq)) * lit(factor))
    df.select(id.as("id"), array(comps: _*).as("proj"))
  }

  /** The qs12 shape: one row per (id, component j, rounded value).
    * `+ 0.0` collapses IEEE −0.0 to +0.0 — the engines' `round`
    * disagree on the SIGN of a negative value rounding to zero. */
  def projectExploded(
      df: DataFrame, vec: Column, id: Column, kOut: Int, dim: Int): DataFrame =
    project(df, vec, id, kOut, dim)
      .select(col("id"), posexplode(col("proj")).as(Seq("j", "y")))
      .select(col("id"), col("j"), (graft.operators.PortableRound.floorTo(col("y"), 4) + lit(0.0)).as("y"))

  /** DuckDB rendition over `embeddings(vec_id, embedding[dim])` —
    * the same md5-parity matrix, the same sequential fold, the same
    * scale factor (interpolated from the identical double). */
  def oracleSql(kOut: Int, dim: Int = 64): String = {
    val factor = 1.0 / math.sqrt(kOut.toDouble)
    s"""SELECT vec_id, CAST(j AS INT) AS j, (floor((y * $factor) * 10000.0) / 10000.0) + 0.0 AS y FROM (
       |  SELECT e.vec_id, jj.j,
       |         list_reduce(list_transform(range(1, ${dim + 1}),
       |           i -> e.embedding[i]::DOUBLE *
       |                (CASE WHEN CAST(('0x' || substring(md5(CAST(jj.j AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)), 1, 2)) AS INT) % 2 = 0
       |                      THEN 1.0 ELSE -1.0 END)),
       |           (x, y) -> x + y) AS y
       |  FROM embeddings e CROSS JOIN (SELECT unnest(range(0, $kOut)) AS j) jj) z""".stripMargin
  }
}
