package graft.operators.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cluster-balanced sampling — the mixture-diversity step after
  * clustering: cap every k-means cell at `perCell` rows, chosen by a
  * deterministic md5 order (a seeded uniform draw both engines
  * reproduce), so no dense region dominates the training mixture no
  * matter how skewed the embedding distribution is. The sampling
  * complement of [[DiversityPrune]]: that ranks WITHIN-cell by
  * redundancy, this equalizes ACROSS cells by population. (No
  * reference analog; part of the added LLM-pipeline surface.)
  *
  * Scale shape: assignment is [[KMeansCluster.assign]] — map-only,
  * centroids as literals, zero shuffle; the cap is one keyed window
  * over narrow (id, cluster) rows, the [[graft.operators.text.CorpusOps]]
  * `capPerSource` shape with cells for sources. At 100 TB the md5
  * rank replaces a shuffling `ORDER BY rand()` with a scan-stable
  * hash sort inside each cell's single window task.
  */
object BalancedSample {

  /** (id, cluster, rank, keep): `rank` is the md5-draw position inside
    * the row's cell (id tie-break), `keep` = rank <= perCell. */
  def sample(
      df: DataFrame,
      vec: Column,
      id: Column,
      k: Int,
      iters: Int,
      perCell: Int): DataFrame = {
    require(perCell >= 1, s"bad perCell $perCell")
    val cents = KMeansCluster.fit(df, vec, id, k, iters)
    val w = Window.partitionBy("cluster")
      .orderBy(md5(col("id").cast("string")), col("id"))
    KMeansCluster.assign(df, vec, id, cents)
      .select(col("id"), col("cluster"))
      .withColumn("rank", row_number().over(w))
      .withColumn("keep", col("rank") <= perCell)
  }

  /** DuckDB formulation over `embeddings`: the qs10 assignment CTEs,
    * then the same md5-ordered window cap. */
  def oracleSql(k: Int, perCell: Int, dim: Int = 64): String =
    s"""WITH ${KMeansCluster.oracleCtes(k, dim)}
       |SELECT vec_id, cluster, rank, rank <= $perCell AS keep FROM (
       |  SELECT vec_id, cluster,
       |         row_number() OVER (
       |           PARTITION BY cluster
       |           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rank
       |  FROM kma) z""".stripMargin
}
