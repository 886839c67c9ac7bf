package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.similarity.RandomProjection

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.Tables.load(spark, sf0001, "embeddings")

  test("projection is the documented sign matrix times the vector") {
    val s = RandomProjection.signs(4, 3)
    assert(s.length == 4 && s.forall(_.length == 3))
    assert(s.flatten.forall(v => v == 1.0 || v == -1.0))
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val got = RandomProjection.project(df, col("embedding"), col("vec_id"), 4, 3)
      .select("proj").as[Seq[Double]].head()
    val factor = 1.0 / math.sqrt(4.0)
    val want = s.map(row =>
      (row(0) * 1.0 + row(1) * 2.0 + row(2) * 3.0) * factor).toSeq
    assert(got == want)
  }

  test("JL property: pairwise distances approximately preserved at 64 -> 16") {
    val sample = emb.filter(col("vec_id") < 30)
    val proj = RandomProjection.project(sample, col("embedding"), col("vec_id"), 16, 64)
    val a = sample.select(col("vec_id").as("ia"),
      transform(col("embedding"), _.cast("double")).as("va"))
    val b = sample.select(col("vec_id").as("ib"),
      transform(col("embedding"), _.cast("double")).as("vb"))
    val pa = proj.select(col("id").as("ia"), col("proj").as("pa"))
    val pb = proj.select(col("id").as("ib"), col("proj").as("pb"))
    val ratios = a.join(b, col("ia") < col("ib"))
      .join(pa, "ia").join(pb, "ib")
      .select(
        sqrt(graft.functions.VectorExprs.sqDist(col("pa"), col("pb"))).as("dp"),
        sqrt(graft.functions.VectorExprs.sqDist(col("va"), col("vb"))).as("d0"))
      .filter(col("d0") > 0)
      .select((col("dp") / col("d0")).as("r"))
      .as[Double].collect()
    // 1/sqrt(16) = 25% typical distortion; bound generously
    assert(ratios.forall(r => r > 0.4 && r < 1.8),
      s"distortion out of range: min=${ratios.min} max=${ratios.max}")
    val mean = ratios.sum / ratios.length
    assert(mean > 0.8 && mean < 1.2, s"mean distortion $mean")
  }

  test("projection is a map-only plan") {
    val plan = RandomProjection
      .project(emb, col("embedding"), col("vec_id"), 16, 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
  }
}
