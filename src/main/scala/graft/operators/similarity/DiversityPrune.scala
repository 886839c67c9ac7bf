package graft.operators.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prototypicality-based diversity pruning (the SSL-prototypes /
  * D4-family curation step): cluster the embedding space, then within
  * each cell DROP the `dropFrac` most prototypical members — the rows
  * closest to their centroid, which carry the least marginal
  * information for training — and keep the diverse tail. The geometric
  * complement of [[SemanticDedup]]: that removes near-identical PAIRS,
  * this thins REGIONS by redundancy. (No reference analog; part of the
  * added LLM-pipeline surface.)
  *
  * Scale shape: assignment is [[KMeansCluster.assign]] — map-only,
  * centroids ride as literals, zero shuffle. Ranking is one window
  * over `cluster` of narrow (id, cluster, dist) rows — a single hash
  * shuffle, vectors never move. Cell populations are ~n/k by
  * construction (k is the knob); a cell's rows sort in one task, the
  * same bound as any keyed window here.
  */
object DiversityPrune {

  /** (id, cluster, dist, rank, keep): `rank` orders a cell from most
    * prototypical (closest to centroid, rank 1) outward with id
    * tie-break; `keep` = rank > floor(dropFrac · cellCount), so each
    * cell loses exactly its most-redundant fraction (floor: a cell
    * smaller than 1/dropFrac keeps everything). Distances are the
    * bit-identical sequential squared-L2 fold, so ranks are
    * engine-independent. */
  def prune(
      df: DataFrame,
      vec: Column,
      id: Column,
      k: Int,
      iters: Int,
      dropFrac: Double): DataFrame = {
    require(dropFrac >= 0 && dropFrac < 1, s"bad dropFrac $dropFrac")
    val cents = KMeansCluster.fit(df, vec, id, k, iters)
    val assigned = KMeansCluster.assign(df, vec, id, cents)
      .select(col("id"), col("cluster"), col("dist"))
    val byProto = Window.partitionBy("cluster")
      .orderBy(col("dist").asc, col("id").asc)
    val cell = Window.partitionBy("cluster")
    assigned
      .withColumn("rank", row_number().over(byProto))
      .withColumn("__n", count(lit(1)).over(cell))
      .select(
        col("id"),
        col("cluster"),
        col("dist"),
        col("rank"),
        (col("rank") > floor(lit(dropFrac) * col("__n")).cast("long"))
          .as("keep"))
  }

  /** The kept (diverse) corpus rows, original schema preserved. */
  def select(
      df: DataFrame,
      vec: Column,
      id: Column,
      idName: String,
      k: Int,
      iters: Int,
      dropFrac: Double): DataFrame =
    df.join(
      prune(df, vec, id, k, iters, dropFrac)
        .filter(col("keep")).select(col("id").as(idName)),
      Seq(idName), "left_semi")

  /** qs18: the qs10 kma CTE chain + the same windowed rank/keep —
    * every row's cell, rank and keep decision value-oracled. */
  def oracleSql(k: Int, dropFrac: Double, dim: Int = 64): String =
    s"""WITH ${KMeansCluster.oracleCtes(k, dim)},
       |ranked AS (
       |  SELECT vec_id, cluster, dist,
       |         row_number() OVER (PARTITION BY cluster
       |                            ORDER BY dist, vec_id) AS rank,
       |         count(*) OVER (PARTITION BY cluster) AS cell_n
       |  FROM kma)
       |SELECT vec_id, cluster, (floor((dist) * 10000.0) / 10000.0) AS dist, rank,
       |       rank > CAST(floor($dropFrac * cell_n) AS BIGINT) AS keep
       |FROM ranked""".stripMargin
}
