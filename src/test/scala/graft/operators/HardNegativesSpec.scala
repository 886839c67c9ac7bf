package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.operators.similarity.{HardNegatives, SimilaritySearch}

class HardNegativesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sf0001, "embeddings").cache()

  test("every mined negative carries a different label than its anchor") {
    val probes = emb.filter(col("vec_id") < 5)
    val mined = HardNegatives
      .mine(emb, col("embedding"), col("vec_id"), col("label"),
        probes, col("embedding"), col("vec_id"), col("label"), k = 5)
      .join(
        probes.select(col("vec_id").as("probe_id"), col("label").as("probe_label")),
        Seq("probe_id"))
    assert(mined.filter(col("corpus_label") === col("probe_label")).count() === 0)
    // k rows per probe, ranks 1..k contiguous
    val perProbe = mined.groupBy("probe_id")
      .agg(count(lit(1)).as("n"), min("rank").as("lo"), max("rank").as("hi"))
      .collect()
    assert(perProbe.length === 5)
    perProbe.foreach { r =>
      assert(r.getAs[Long]("n") === 5L)
      assert(r.getAs[Int]("lo") === 1 && r.getAs[Int]("hi") === 5)
    }
  }

  test("rank-1 negative matches brute force restricted to other labels") {
    val anchor = emb.filter(col("vec_id") === 0)
    val anchorLabel = anchor.select("label").as[Int].head()
    val probeVec = anchor.select("embedding").as[Seq[Float]].head()
    val expected = SimilaritySearch
      .bruteForceTopK(emb.filter(col("label") =!= anchorLabel),
        col("embedding"), col("vec_id"), probeVec, 1)
      .select("id").as[Long].head()
    val mined = HardNegatives
      .mine(emb, col("embedding"), col("vec_id"), col("label"),
        anchor, col("embedding"), col("vec_id"), col("label"), k = 1)
      .select("corpus_id").as[Long].head()
    assert(mined === expected)
  }

  test("batch IVF mining with a full probe equals the exact miner") {
    // nprobe = numCells removes the restriction, so the distributed
    // batch path must reproduce mine() row for row (same tie-breaks)
    val probes = emb.filter(col("vec_id") < 10)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("probe_id").cast("long"), col("corpus_id"),
        round(col("cosine"), 6), col("rank"))
      .as[(Long, Long, Double, Int)].collect().toSeq.sorted
    val exact = HardNegatives.mine(
      emb, col("embedding"), col("vec_id"), col("label"),
      probes, col("embedding"), col("vec_id"), col("label"), k = 5)
    val full = HardNegatives.mineIvfBatch(
      emb, col("embedding"), col("vec_id"), col("label"),
      probes, col("embedding"), col("vec_id"), col("label"),
      k = 5, nprobe = graft.operators.similarity.PortableIvf.numCells)
    assert(rows(full) === rows(exact))
  }

  test("batch IVF mining restricts candidates to the probes' cells") {
    import graft.operators.similarity.PortableIvf
    val probes = emb.filter(col("vec_id") < 5)
    val mined = HardNegatives.mineIvfBatch(
      emb, col("embedding"), col("vec_id"), col("label"),
      probes, col("embedding"), col("vec_id"), col("label"),
      k = 5, nprobe = 2)
    // every returned corpus row must live in one of its probe's 2 cells
    val cellOf = emb.select(col("vec_id").as("corpus_id"),
      PortableIvf.cell(col("embedding")).as("ccell"))
    val probeCells = probes.select(col("vec_id").as("probe_id"),
      PortableIvf.probedCellsCol(col("embedding").cast("array<double>"), 2).as("pcells"))
    val offenders = mined
      .join(cellOf, "corpus_id").join(probeCells, "probe_id")
      .filter(!array_contains(col("pcells"), col("ccell")))
    assert(offenders.count() === 0)
    // the plan broadcasts the probe side and never goes nested-loop
    val plan = mined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"cell join not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"batch mining degraded to nested loop:\n$plan")
  }

  test("probe side broadcasts: no shuffle of the corpus in the plan") {
    val probes = emb.filter(col("vec_id") < 3)
    val plan = HardNegatives
      .mine(emb, col("embedding"), col("vec_id"), col("label"),
        probes, col("embedding"), col("vec_id"), col("label"), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"expected a broadcast probe side, got:\n$plan")
  }
}
