package graft.operators.similarity

/** DuckDB oracle SQL for the PRODUCTION seeded random-hyperplane LSH
  * paths ([[VectorOps.hyperplaneBucket]]) — round 13's second
  * graduation off the rows-only list (qd08, qs03).
  *
  * The insight that makes the seeded family oracle-able: the planes are
  * DRIVER-SIDE CONSTANTS (a seeded JVM PRNG, generated once and inlined
  * into the Spark plan as literals). The oracle builder runs in the
  * same JVM, so it regenerates the identical planes via
  * [[VectorOps.hyperplanes]] and inlines them into the SQL as
  * shortest-round-trip double literals (`Double.toString` guarantees
  * the decimal form recovers the exact bits; DuckDB's correctly-rounded
  * parse returns them). Everything downstream — the per-bit dot
  * products, the sign buckets, the exact-cosine confirmation — is the
  * same ordered double fold both engines already compute bit-identically
  * (the qd13/qs02 discipline).
  *
  * Oracle shape note: per-table buckets are precomputed as one
  * materialized column each (numTables columns per vector), so the
  * candidate join is an OR of integer equalities over tiny tables —
  * the fixture corpus is ≤ 5000 vectors, and this SQL exists to verify,
  * not to scale (the Spark side's banded equi-join is the scale path).
  */
object HyperplaneOracle {

  /** One plane as an exact SQL double-list literal. */
  private def planeLit(p: Array[Double]): String =
    p.map(java.lang.Double.toString).mkString("CAST([", ", ", "] AS DOUBLE[])")

  /** Ordered-fold dot of a FLOAT[] column against a plane literal —
    * element order and double widening match VectorExprs.dot. */
  private def dotLit(vec: String, p: Array[Double], dim: Int): String =
    s"""list_reduce(list_transform(range(1, ${dim + 1}),
       |      j -> $vec[j]::DOUBLE * (${planeLit(p)})[j]), (x, y) -> x + y)""".stripMargin

  /** The signed-LSH bucket of `vec` under one seed: bit i set when
    * dot(vec, plane_i) >= 0 — mirrors [[VectorOps.hyperplaneBucket]]. */
  def bucketSql(vec: String, dim: Int, nbits: Int, seed: Long): String =
    VectorOps.hyperplanes(dim, nbits, seed).zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN (${dotLit(vec, p, dim)}) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  private def cosineSql(a: String, b: String, dim: Int): String = {
    def dot(x: String, y: String) =
      s"""list_reduce(list_transform(range(1, ${dim + 1}),
         |      j -> $x[j]::DOUBLE * $y[j]::DOUBLE), (x, y) -> x + y)""".stripMargin
    val d = s"sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})"
    s"CASE WHEN $d = 0 THEN 0.0 ELSE (${dot(a, b)}) / ($d) END"
  }

  /** qd08 oracle: [[graft.operators.dedup.EmbeddingDedup.candidatePairs]]
    * — numTables bucket columns, OR-of-equalities candidate join,
    * exact-cosine confirmation at `threshold`, floored to 4 places. */
  def oracleEmbeddingPairsSql(
      dim: Int, threshold: Double, nbits: Int, numTables: Int): String = {
    val bucketCols = (0 until numTables)
      .map(t => s"${bucketSql("embedding", dim, nbits, 42L + t)} AS b$t")
      .mkString(",\n         ")
    val anyMatch = (0 until numTables).map(t => s"a.b$t = b.b$t").mkString(" OR ")
    s"""WITH hb AS MATERIALIZED (
       |  SELECT vec_id, embedding,
       |         $bucketCols
       |  FROM embeddings),
       |cand AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |         a.embedding AS ea, b.embedding AS eb
       |  FROM hb a JOIN hb b ON a.vec_id < b.vec_id AND ($anyMatch)),
       |scored AS (
       |  SELECT vec_a, vec_b, ${cosineSql("ea", "eb", dim)} AS c
       |  FROM cand)
       |SELECT vec_a, vec_b, floor(c * 10000.0) / 10000.0 AS cosine
       |FROM scored WHERE c >= $threshold""".stripMargin
  }

  /** qs03 oracle: [[SimilaritySearch.annTopK]] — probe is the vec_id 0
    * embedding; candidates share any table's bucket with the probe;
    * exact cosine, top-k with id tie-break. */
  def oracleAnnTopKSql(dim: Int, k: Int, nbits: Int, numTables: Int): String = {
    val bucketCols = (0 until numTables)
      .map(t => s"${bucketSql("embedding", dim, nbits, 42L + t)} AS b$t")
      .mkString(",\n         ")
    val probeCols = (0 until numTables)
      .map(t => s"${bucketSql("pe", dim, nbits, 42L + t)} AS pb$t")
      .mkString(",\n         ")
    val anyMatch = (0 until numTables).map(t => s"e.b$t = p.pb$t").mkString(" OR ")
    s"""WITH hb AS MATERIALIZED (
       |  SELECT vec_id, embedding,
       |         $bucketCols
       |  FROM embeddings),
       |p AS MATERIALIZED (
       |  SELECT $probeCols
       |  FROM (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0)),
       |probe AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0),
       |scored AS (
       |  SELECT e.vec_id, ${cosineSql("e.embedding", "q.pe", dim)} AS c
       |  FROM hb e, p, probe q
       |  WHERE $anyMatch)
       |SELECT vec_id, floor(c * 10000.0) / 10000.0 AS cosine
       |FROM scored ORDER BY c DESC, vec_id LIMIT $k""".stripMargin
  }
}
