package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.similarity.{ProductQuantizer, Rerank, SimilaritySearch}

class RerankSpec extends SparkSpec {
  import spark.implicits._

  // 64-dim deterministic fixture (PQ's fixed width)
  private val vecs = (0 until 24).map(i =>
    (i.toLong, Seq.tabulate(ProductQuantizer.dim)(j =>
      math.sin(i * ProductQuantizer.dim + j).toFloat)))
  private val emb = vecs.toDF("vec_id", "embedding")
  private val probe = vecs.head._2

  test("coarseK = corpus reduces to exact brute force") {
    val exact = SimilaritySearch
      .bruteForceTopK(emb, col("embedding"), col("vec_id"), probe, 5)
      .select(col("id").as("vec_id"), round(col("cosine"), 4).as("cosine"))
      .collect().toSeq
    val reranked = Rerank
      .topK(emb, col("embedding"), col("vec_id"), probe, 5, coarseK = 24)
      .collect().toSeq
    assert(reranked == exact)
  }

  test("output is the exact re-ranking of the ADC candidate set") {
    val coarse = 8
    val cand = ProductQuantizer.adcTopK(
      ProductQuantizer.encode(emb, col("embedding"), col("vec_id")),
      probe, coarse)
      .select("vec_id").as[Long].collect().toSet
    val out = Rerank
      .topK(emb, col("embedding"), col("vec_id"), probe, 5, coarse)
      .collect()
    assert(out.length == 5)
    assert(out.map(_.getLong(0)).forall(cand.contains))
    val cos = out.map(_.getDouble(1)).toSeq
    assert(cos == cos.sorted.reverse) // ranked by exact cosine desc
  }

  test("candidates broadcast into the corpus scan; corpus never shuffles") {
    val plan = Rerank
      .topK(emb, col("embedding"), col("vec_id"), probe, 5, coarseK = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
  }

  test("coarseK below topk is rejected") {
    intercept[IllegalArgumentException] {
      Rerank.topK(emb, col("embedding"), col("vec_id"), probe, 10, coarseK = 5)
    }
  }
}
