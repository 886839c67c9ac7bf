package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.similarity.DiversityPrune

class DiversityPruneSpec extends SparkSpec {
  import spark.implicits._

  // two tight clumps; within each, lower ids sit closer to the mean
  private val emb = Seq(
    (1L, Seq(0.00f, 0.0f)), (2L, Seq(0.10f, 0.0f)),
    (3L, Seq(-0.1f, 0.0f)), (4L, Seq(0.40f, 0.0f)),
    (5L, Seq(9.00f, 0.0f)), (6L, Seq(9.10f, 0.0f)),
    (7L, Seq(8.90f, 0.0f)), (8L, Seq(9.50f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("each cell drops exactly floor(dropFrac * n) most-prototypical rows") {
    val out = DiversityPrune
      .prune(emb, col("embedding"), col("vec_id"), k = 2, iters = 2,
        dropFrac = 0.5)
      .collect()
    val byCell = out.groupBy(_.getAs[Int]("cluster"))
    assert(byCell.size == 2)
    byCell.values.foreach { rows =>
      val n = rows.length
      val kept = rows.filter(_.getAs[Boolean]("keep"))
      assert(kept.length == n - n / 2)
      // dropped = the lowest ranks (closest to centroid)
      val dropped = rows.filterNot(_.getAs[Boolean]("keep"))
      assert(dropped.map(_.getAs[Int]("rank")).sorted.toSeq ==
        (1 to n / 2).toSeq)
    }
  }

  test("dropFrac 0 keeps everything; rank orders by distance then id") {
    val out = DiversityPrune
      .prune(emb, col("embedding"), col("vec_id"), k = 2, iters = 2,
        dropFrac = 0.0)
      .collect()
    assert(out.forall(_.getAs[Boolean]("keep")))
    out.groupBy(_.getAs[Int]("cluster")).values.foreach { rows =>
      val ordered = rows.sortBy(_.getAs[Int]("rank"))
      val dists = ordered.map(_.getAs[Double]("dist"))
      assert(dists.toSeq == dists.sorted.toSeq)
    }
  }

  test("select keeps the original schema and only kept ids") {
    val kept = DiversityPrune.select(
      emb, col("embedding"), col("vec_id"), "vec_id",
      k = 2, iters = 2, dropFrac = 0.5)
    assert(kept.columns.toSeq == Seq("vec_id", "embedding"))
    assert(kept.count() == 4)
  }

  test("bad dropFrac is rejected") {
    intercept[IllegalArgumentException] {
      DiversityPrune.prune(emb, col("embedding"), col("vec_id"), 2, 1, 1.0)
    }
  }
}
