package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.similarity.BalancedSample

class BalancedSampleSpec extends SparkSpec {
  import spark.implicits._

  test("every cell is capped and the draw is deterministic") {
    val emb = Tables.load(spark, sf0001, "embeddings")
    val out = BalancedSample.sample(
      emb, col("embedding"), col("vec_id"), k = 8, iters = 1, perCell = 10)
    val kept = out.filter(col("keep"))
      .groupBy("cluster").agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect().toMap
    assert(kept.values.forall(_ <= 10), s"cell over cap: $kept")
    // deterministic: same call twice, identical keep set
    val a = out.filter(col("keep")).select("id").as[Long].collect().sorted.toSeq
    val b = BalancedSample.sample(
        emb, col("embedding"), col("vec_id"), k = 8, iters = 1, perCell = 10)
      .filter(col("keep")).select("id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("a cell smaller than the cap keeps everything; ranks are 1..n") {
    val emb = Tables.load(spark, sf0001, "embeddings").limit(20)
    val out = BalancedSample.sample(
        emb, col("embedding"), col("vec_id"), k = 8, iters = 1, perCell = 1000)
      .as[(Long, Int, Int, Boolean)].collect()
    assert(out.forall(_._4), "under-cap rows must all keep")
    val byCell = out.groupBy(_._2)
    byCell.foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length).toSeq)
    }
  }
}
