package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.similarity.SemanticDecon

class SemanticDeconSpec extends SparkSpec {
  import spark.implicits._

  private val bench = Seq(
    (100L, Seq(1.0f, 0.0f, 0.0f)),
    (101L, Seq(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")

  private val corpus = Seq(
    (1L, Seq(2.0f, 0.0f, 0.0f)),   // parallel to bench 100 -> cos 1
    (2L, Seq(0.0f, 0.0f, 5.0f)),   // orthogonal to both -> cos 0
    (3L, Seq(1.0f, 1.0f, 0.0f)),   // 45 degrees to both -> cos ~0.707
    (4L, Seq(0.0f, 0.0f, 0.0f))    // zero vector -> cos 0 by convention
  ).toDF("vec_id", "embedding")

  test("profile flags exactly the vectors whose max cosine reaches tau") {
    val out = SemanticDecon.profile(
      corpus, col("embedding"), col("vec_id"),
      bench, col("embedding"), tau = 0.9)
      .orderBy("id").collect()
    assert(out.map(_.getBoolean(2)).toSeq ==
      Seq(true, false, false, false))
    assert(out(0).getDouble(1) == 1.0)
    assert(out(1).getDouble(1) == 0.0)
    assert(math.abs(out(2).getDouble(1) - 0.7071) < 1e-9)
    assert(out(3).getDouble(1) == 0.0)
  }

  test("clean removes only contaminated rows") {
    val kept = SemanticDecon.clean(
      corpus, col("embedding"), "vec_id",
      bench, col("embedding"), tau = 0.7)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 4L)) // 1 (cos 1) and 3 (cos .707) cut
  }

  test("the benchmark side is broadcast, never shuffled") {
    val plan = SemanticDecon.profile(
      corpus, col("embedding"), col("vec_id"),
      bench, col("embedding"), tau = 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"))
  }
}
