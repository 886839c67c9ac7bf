package graft.operators.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.PortableRound

/** Embedding-space drift monitor: per-group centroids and their
  * distance to the global centroid — the cheap continuous check that
  * a source/label/day's embedding distribution is wandering (encoder
  * regression, upstream content shift, poisoning) BEFORE the
  * expensive reactions (recluster, recall audit, retrain) fire.
  *
  * Scale shape: one explode to (group, dim, component) narrow rows,
  * one map-side-combined aggregation keyed (group, dim), and a
  * dims-sized rollup — corpus size appears only in the first scan.
  * The global centroid derives from the SAME per-group sums (sum of
  * sums), so one pass feeds both.
  *
  * Portability: float32 components floor-scale to integer
  * MICRO-UNITS, so centroid sums are order-free BIGINTs; centroids
  * are integer divisions (micro-unit means), the squared distance is
  * an exact integer sum over dims, and the one float — the final
  * sqrt — is a single identical IEEE call, floor-projected. */
object CentroidDrift {

  /** (grp, n_vecs, dist): per-group micro-exact centroid distance to
    * the global centroid, 6-dp. */
  def profile(
      df: DataFrame,
      vec: Column,
      group: Column): DataFrame = {
    val comps = graft.operators.Parallelism.ensureMin(df)
      .select(group.as("grp"), posexplode(vec).as(Seq("j", "v")))
      .select(col("grp"), col("j"),
        floor(col("v").cast("double") * lit(1e6)).cast("long").as("vm"))
    val byGroupDim = comps.groupBy("grp", "j")
      .agg(sum("vm").as("s"), count(lit(1)).as("n"))
    // integer micro-unit centroids; the global one reuses the group
    // sums (sum of sums — one corpus pass total)
    val gCent = byGroupDim.groupBy("j")
      .agg(expr("sum(s) div sum(n)").as("gc"))
    byGroupDim
      .withColumn("c", expr("s div n"))
      .join(broadcast(gCent), Seq("j"))
      .groupBy("grp")
      .agg(
        expr("max(n)").cast("bigint").as("n_vecs"),
        sum((col("c") - col("gc")) * (col("c") - col("gc"))).as("d2"))
      .select(col("grp"), col("n_vecs"),
        PortableRound.floorTo(
          sqrt(col("d2").cast("double")) / lit(1e6), 6).as("dist"))
  }

  /** qs33 oracle — [[profile]] over embeddings grouped by label. */
  def oracleSql(): String =
    s"""WITH comps AS (
       |  SELECT label AS grp, j,
       |         CAST(floor(CAST(embedding[CAST(j AS INT)] AS DOUBLE) * 1000000.0) AS BIGINT) AS vm
       |  FROM embeddings, (SELECT unnest(range(1, 65)) AS j) dims),
       |bgd AS (SELECT grp, j, CAST(sum(vm) AS BIGINT) AS s,
       |               count(*)::BIGINT AS n
       |        FROM comps GROUP BY grp, j),
       |gc AS (SELECT j, CAST(sum(s) // sum(n) AS BIGINT) AS gc FROM bgd GROUP BY j),
       |d AS (SELECT bgd.grp, max(bgd.n) AS n_vecs,
       |             CAST(sum((bgd.s // bgd.n - gc.gc) * (bgd.s // bgd.n - gc.gc)) AS BIGINT) AS d2
       |      FROM bgd JOIN gc ON gc.j = bgd.j
       |      GROUP BY bgd.grp)
       |SELECT grp, CAST(n_vecs AS BIGINT) AS n_vecs,
       |       ${PortableRound.floorToSql(
          "sqrt(CAST(d2 AS DOUBLE)) / 1000000.0", 6)} AS dist
       |FROM d""".stripMargin
}
