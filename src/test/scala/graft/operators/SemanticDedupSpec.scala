package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.similarity.SemanticDedup

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private def vf(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
  // two blobs; 1 and 2 are near-identical (planted semantic dup),
  // 5 and 6 likewise in the other blob; 3 and 7 are loners
  private lazy val vecs = Seq(
    (1L, vf(1.0, 0.0, 0.0, 0.05)),
    (2L, vf(1.0, 0.01, 0.0, 0.05)),
    (3L, vf(0.7, 0.7, 0.0, 0.0)),
    (5L, vf(0.0, 0.0, 1.0, 0.02)),
    (6L, vf(0.0, 0.01, 1.0, 0.02)),
    (7L, vf(0.0, 0.6, 0.6, 0.0))
  ).toDF("vec_id", "embedding").withColumn("label", lit("x"))

  test("prune drops the higher id of each planted within-cluster dup") {
    val kept = SemanticDedup
      .prune(vecs, col("embedding"), col("vec_id"), "vec_id",
        k = 2, iters = 2, threshold = 0.995)
      .select("vec_id").as[Long].collect().sorted
    assert(!kept.contains(2L), s"dup of 1 survived: ${kept.mkString(",")}")
    assert(!kept.contains(6L), s"dup of 5 survived: ${kept.mkString(",")}")
    assert(kept.contains(1L) && kept.contains(5L), "keep-lowest-id violated")
    assert(kept.contains(3L) && kept.contains(7L), "loners must survive")
  }

  test("pairs only form within a cluster") {
    val p = SemanticDedup
      .pairs(vecs, col("embedding"), col("vec_id"), k = 2, iters = 2,
        threshold = 0.0)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    // cross-blob near-orthogonal pairs (1,5), (2,6), ... never appear
    assert(!p.contains((1L, 5L)) && !p.contains((2L, 6L)),
      s"cross-cluster pair leaked: $p")
    assert(p.contains((1L, 2L)) && p.contains((5L, 6L)))
  }

  // degenerate corpus: one mega-cell of near-identical vectors — the
  // "junk cluster" the maxCell cap exists for
  private def junkCorpus(n: Int) = {
    val rows = (1 to n).map { i =>
      (i.toLong, vf(1.0, 0.001 * (i % 7), 0.0, 0.0))
    } :+ ((n + 1).toLong, vf(0.0, 0.0, 1.0, 0.0))
    rows.toDF("vec_id", "embedding")
  }

  test("maxCell cap engages on a degenerate all-near-identical cell") {
    val n = 60
    val df = junkCorpus(n)
    val uncapped = SemanticDedup
      .pairs(df, col("embedding"), col("vec_id"), k = 2, iters = 1,
        threshold = 0.0, maxCell = 1000000, dim = 4)
      .count()
    // all n junk vectors share one cell -> full quadratic without a cap
    assert(uncapped >= n.toLong * (n - 1) / 2 - n,
      s"expected ~quadratic uncapped pair count, got $uncapped")
    val capped = SemanticDedup
      .pairs(df, col("embedding"), col("vec_id"), k = 2, iters = 1,
        threshold = 0.0, maxCell = 10, dim = 4)
      .count()
    // hot cell re-split by LSH, residual hot buckets dropped: every
    // joinable group <= maxCell, so pairs <= groups * maxCell^2 and in
    // particular FAR below the quadratic count
    assert(capped < uncapped / 2,
      s"cap did not engage: capped=$capped uncapped=$uncapped")
  }

  test("capped fallback path stays an equi-join (no nested loop)") {
    val plan = SemanticDedup
      .pairs(junkCorpus(30), col("embedding"), col("vec_id"), k = 2,
        iters = 1, threshold = 0.0, maxCell = 5, dim = 4)
      .queryExecution.executedPlan.toString
    assert(
      !plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"fallback must be bucketed, got:\n$plan")
  }

  test("cap does not change results when every cell fits") {
    val base = SemanticDedup
      .pairs(vecs, col("embedding"), col("vec_id"), k = 2, iters = 2,
        threshold = 0.0)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val hugeCap = SemanticDedup
      .pairs(vecs, col("embedding"), col("vec_id"), k = 2, iters = 2,
        threshold = 0.0, maxCell = 999999, dim = 4)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(base == hugeCap)
  }

  test("prune is deterministic under re-partitioning") {
    val a = SemanticDedup.prune(vecs.repartition(1), col("embedding"),
      col("vec_id"), "vec_id", 2, 2, 0.995).select("vec_id").as[Long].collect().sorted
    val b = SemanticDedup.prune(vecs.repartition(5), col("embedding"),
      col("vec_id"), "vec_id", 2, 2, 0.995).select("vec_id").as[Long].collect().sorted
    assert(a.sameElements(b))
  }
}
