package graft.operators.similarity

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-engine-verifiable hyperplane-LSH ANN (the portable twin of
  * [[SimilaritySearch.annTopK]]): plane components derive from md5
  * (interpolated into the oracle SQL as INTEGER constants, divided to
  * doubles by both engines with identical exact arithmetic), so bucket
  * assignment, candidate restriction, and the final exact-cosine top-k
  * are all value-oracle-able (query qs06). The production ANN keeps its
  * seeded-Gaussian planes (better isotropy) and is cross-checked
  * against brute force in SimilaritySpec.
  */
object PortableAnn {

  val dim = 64
  val nbits = 4
  val numTables = 2

  /** 40-bit md5 prefix of "t_b_j" — the integer seed of plane
    * component (table t, bit b, dim j). Plane value = c/2^39 - 1,
    * an exact double in [-1, 2) both engines compute identically. */
  private def md5_40(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 32) | ((d(1) & 0xffL) << 24) | ((d(2) & 0xffL) << 16) |
      ((d(3) & 0xffL) << 8) | (d(4) & 0xffL)
  }

  /** planeInts(t)(b)(j) — the integer constants, single source of truth
    * for both engines. */
  val planeInts: IndexedSeq[IndexedSeq[IndexedSeq[Long]]] =
    (0 until numTables).map(t => (0 until nbits).map(b =>
      (0 until dim).map(j => md5_40(s"${t}_${b}_$j"))))

  private val half = (1L << 39).toDouble

  private def planeVals(t: Int, b: Int): Seq[Double] =
    planeInts(t)(b).map(c => c.toDouble / half - 1.0)

  /** Bucket id of a vector column in table t: bit b set iff
    * dot(v, plane_tb) >= 0. */
  def bucket(v: Column, t: Int): Column =
    (0 until nbits).map { b =>
      (VectorOps.dot(v, typedLit(planeVals(t, b))) >= 0).cast("long") * lit(1L << b)
    }.reduce(_ + _)

  /** LSH-restricted exact top-k: candidates share a bucket with the
    * probe in at least one table. */
  def topK(df: DataFrame, vec: Column, id: Column, probe: Seq[Float], k: Int): DataFrame = {
    val q = typedLit(probe)
    val restricted = (0 until numTables)
      .map(t => bucket(col("v"), t) === bucket(q, t))
      .reduce(_ || _)
    df.select(id.as("id"), vec.as("v"))
      .filter(restricted)
      .select(col("id"), VectorOps.cosine(col("v"), q).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** DuckDB rendition over `embeddings`: same plane integers, same
    * fold order, same restriction and ranking. `probeExpr` is a SQL
    * expression for the probe vector (e.g. a scalar subquery). */
  def oracleSql(k: Int): String = {
    def dotPlane(vec: String, t: Int, b: Int): String = {
      val ints = planeInts(t)(b).mkString("[", ",", "]")
      s"""list_reduce(list_transform(range(1, ${dim + 1}),
         |  j -> $vec[j]::DOUBLE * (($ints)[j] / 549755813888.0 - 1.0)), (x, y) -> x + y)""".stripMargin
    }
    def bucketSql(vec: String, t: Int): String =
      (0 until nbits).map { b =>
        s"(CASE WHEN ${dotPlane(vec, t, b)} >= 0 THEN ${1L << b} ELSE 0 END)"
      }.mkString(" + ")
    val dot = s"""list_reduce(list_transform(range(1, ${dim + 1}),
                 |  j -> e.embedding[j]::DOUBLE * p.pe[j]::DOUBLE), (x, y) -> x + y)""".stripMargin
    val na = s"""sqrt(list_reduce(list_transform(range(1, ${dim + 1}),
                |  j -> e.embedding[j]::DOUBLE * e.embedding[j]::DOUBLE), (x, y) -> x + y))""".stripMargin
    val nb = s"""sqrt(list_reduce(list_transform(range(1, ${dim + 1}),
                |  j -> p.pe[j]::DOUBLE * p.pe[j]::DOUBLE), (x, y) -> x + y))""".stripMargin
    val restricted = (0 until numTables).map(t =>
      s"(${bucketSql("e.embedding", t)}) = (${bucketSql("p.pe", t)})").mkString(" OR ")
    s"""WITH p AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0),
       |scored AS (
       |  SELECT vec_id,
       |         CASE WHEN $na * $nb = 0 THEN 0.0 ELSE ($dot) / ($na * $nb) END AS c
       |  FROM embeddings e, p
       |  WHERE $restricted)
       |SELECT vec_id, (floor((c) * 10000.0) / 10000.0) AS cosine
       |FROM scored ORDER BY c DESC, vec_id LIMIT $k""".stripMargin
  }
}
