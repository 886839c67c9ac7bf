package graft.operators.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorExprs

/** Deterministic k-means clustering over an embedding column — the
  * corpus-organization primitive behind cluster-based curation
  * (SemDeDup-style pruning, topic balancing, cluster-stratified
  * sampling). (No reference analog; part of the added LLM-pipeline
  * surface.)
  *
  * Unlike textbook Lloyd's — whose float mean depends on the order rows
  * meet the accumulator and is therefore nondeterministic under Spark's
  * shuffle — every step here is engine- and layout-invariant:
  *
  *   - INIT: the k corpus vectors with the smallest `md5(id)` hash
  *     (hash order, not `limit()` or `rand()` — stable across engines,
  *     runs, partitionings, and re-shards; mirrors `IvfIndex.fit`);
  *   - ASSIGN: per-row argmin of the native codegen'd squared-L2
  *     kernel ([[VectorExprs.sqDist]], the same sequential double fold
  *     DuckDB's `list_reduce` computes) over the broadcast-as-literal
  *     centroid list; ties break to the lowest cluster id;
  *   - UPDATE: component sums are computed on a 2^20 integer lattice
  *     (`floor(x·2^20 + 0.5)` — the exactly-rounded trick shared with
  *     [[Quantize]]), so the per-cluster sums are exact integers and
  *     order-independent; the mean divides two exact integers in one
  *     fixed double-op order. Lattice error is 2^-21 per component —
  *     irrelevant to cluster geometry, decisive for reproducibility.
  *
  * Scale shape: ASSIGN is a map-only pass (centroids are k·dim literal
  * doubles, folded into codegen — no join, no shuffle); UPDATE is one
  * narrow posexplode plus an algebraic sum keyed by (cluster, pos) —
  * k·dim groups, partial-aggregated map-side, then a bounded k·dim-row
  * collect (like `IvfIndex.fit`'s documented bounded collect). One
  * shuffle of k·dim·tasks tiny rows per iteration, nothing quadratic,
  * vectors never cross the wire.
  */
object KMeansCluster {

  /** 2^20 — the component quantization lattice for exact mean sums. */
  val Lattice = 1048576.0

  /** A centroid: stable cluster id (1-based init rank) + double vector. */
  final case class Centroid(cluster: Int, vec: Seq[Double])

  /** The k vectors with the smallest md5(id), as cluster 1..k in hash
    * order. Bounded collect of k rows. */
  def initCentroids(df: DataFrame, vec: Column, id: Column, k: Int): Seq[Centroid] = {
    val sid = id.cast("string")
    df.select(md5(sid).as("h"), sid.as("sid"), transform(vec, _.cast("double")).as("v"))
      .orderBy(col("h"), col("sid"))
      .limit(k)
      .select("v")
      .collect()
      .zipWithIndex
      .map { case (r, i) => Centroid(i + 1, r.getSeq[Double](0)) }
      .toSeq
  }

  /** Per-row nearest-centroid assignment, projected to
    * (id, v [the double vector], cluster, dist) — join back on id to
    * recover other columns (see SemanticDedup.prune). Map-only — the
    * centroid list rides in as literals and the k distances are native
    * codegen'd folds. */
  def assign(df: DataFrame, vec: Column, id: Column, cents: Seq[Centroid]): DataFrame = {
    require(cents.nonEmpty, "no centroids")
    val v = transform(vec, _.cast("double"))
    val dists = array(cents.map(c => VectorExprs.sqDist(v, typedLit(c.vec))): _*)
    val cid = typedLit(cents.map(_.cluster))
    df.select(id.as("id"), vec.as("v"), dists.as("__d"))
      .withColumn("dist", array_min(col("__d")))
      .withColumn("cluster",
        element_at(cid, array_position(col("__d"), col("dist")).cast("int")))
      .select(col("id"), col("v"), col("cluster"), col("dist"))
  }

  /** One Lloyd update on the integer lattice: exact per-(cluster, pos)
    * sums, bounded k·dim collect, empty clusters dropped (both engines
    * drop them identically — they simply have no rows). */
  def update(assigned: DataFrame): Seq[Centroid] = {
    val q = assigned.select(
      col("cluster"),
      posexplode(transform(col("v"), x => floor(x.cast("double") * Lattice + 0.5))))
    val rows = q
      .groupBy("cluster", "pos")
      .agg(sum("col").as("s"), count(lit(1)).as("n"))
      .collect()
    rows
      .groupBy(_.getInt(0))
      .toSeq
      .map { case (cl, rs) =>
        val byPos = rs.sortBy(_.getInt(1))
        Centroid(cl, byPos.map(r => (r.getLong(2).toDouble / r.getLong(3).toDouble) / Lattice).toSeq)
      }
      .sortBy(_.cluster)
  }

  /** md5-ordered init + `iters` exact-lattice Lloyd updates. */
  def fit(df: DataFrame, vec: Column, id: Column, k: Int, iters: Int): Seq[Centroid] = {
    require(k > 0 && iters >= 0, s"bad k=$k / iters=$iters")
    var cents = initCentroids(df, vec, id, k)
    var i = 0
    while (i < iters) {
      cents = update(assign(df, vec, id, cents))
      i += 1
    }
    cents
  }

  /** The CTE chain of fit(k, iters = 1) + final assignment over
    * `embeddings(vec_id, embedding[dim])`, ending in
    * `kma(vec_id, cluster, dist)` — spliceable into composed pipelines
    * (SemanticDedup). Same md5-ordered init, same sequential
    * squared-L2 fold, same 2^20-lattice mean, same lowest-cluster
    * tie-break as the Spark side. */
  def oracleCtes(k: Int, dim: Int = 64): String = {
    def d(c: String) =
      s"list_reduce(list_transform(range(1, ${dim + 1}), " +
        s"i -> (e.embedding[i]::DOUBLE - $c.cv[i]) * (e.embedding[i]::DOUBLE - $c.cv[i])), (x, y) -> x + y)"
    s"""c1 AS (
       |  SELECT cluster, cv FROM (
       |    SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), CAST(vec_id AS VARCHAR)) AS cluster,
       |           list_transform(embedding, x -> x::DOUBLE) AS cv
       |    FROM embeddings) z
       |  WHERE cluster <= $k),
       |a1 AS (
       |  SELECT vec_id, cluster FROM (
       |    SELECT e.vec_id, c1.cluster,
       |           row_number() OVER (PARTITION BY e.vec_id
       |                              ORDER BY ${d("c1")}, c1.cluster) AS rn
       |    FROM embeddings e CROSS JOIN c1) z
       |  WHERE rn = 1),
       |q AS (
       |  SELECT a1.cluster, p.pos,
       |         CAST(floor(e.embedding[p.pos]::DOUBLE * $Lattice + 0.5) AS BIGINT) AS qv
       |  FROM a1 JOIN embeddings e USING (vec_id)
       |  CROSS JOIN (SELECT unnest(range(1, ${dim + 1})) AS pos) p),
       |c2 AS (
       |  SELECT cluster, list(qm ORDER BY pos) AS cv FROM (
       |    SELECT cluster, pos,
       |           (CAST(sum(qv) AS DOUBLE) / CAST(count(*) AS DOUBLE)) / $Lattice AS qm
       |    FROM q GROUP BY cluster, pos) z
       |  GROUP BY cluster),
       |kma AS (
       |  SELECT vec_id, cluster, dist FROM (
       |    SELECT e.vec_id, c2.cluster, ${d("c2")} AS dist,
       |           row_number() OVER (PARTITION BY e.vec_id
       |                              ORDER BY ${d("c2")}, c2.cluster) AS rn
       |    FROM embeddings e CROSS JOIN c2) z
       |  WHERE rn = 1)""".stripMargin
  }

  /** DuckDB formulation of the qs10 query (per-vector assignments). */
  def oracleSql(k: Int, dim: Int = 64): String =
    s"""WITH ${oracleCtes(k, dim)}
       |SELECT vec_id, cluster, (floor((dist) * 10000.0) / 10000.0) AS dist FROM kma""".stripMargin
}
