package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.similarity.ProductQuantizer

class ProductQuantizerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sf0001, "embeddings")

  test("codes pack 8 subspaces into 32 bits and are deterministic") {
    val codes = ProductQuantizer.encode(emb, col("embedding"), col("vec_id"))
    val vals = codes.select("pq_code").as[Long].collect()
    assert(vals.nonEmpty)
    assert(vals.forall(c => c >= 0 && c < (1L << 32)), "code out of 32-bit range")
    val again = ProductQuantizer.encode(emb.repartition(5), col("embedding"), col("vec_id"))
    assert(codes.exceptAll(again).isEmpty && again.exceptAll(codes).isEmpty)
    // codes must actually discriminate: a degenerate codebook would
    // collapse everything into one code
    assert(vals.distinct.length > vals.length / 4, "codes collapsed")
  }

  test("ADC ranking correlates with exact distance (quantization sanity)") {
    val codes = ProductQuantizer.encode(emb, col("embedding"), col("vec_id"))
    val p = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val adc = ProductQuantizer.adcTopK(codes, p, topk = 50)
      .select("vec_id").as[Long].collect().toSet
    // exact L2 top-50
    val pd = typedLit(p.map(_.toDouble))
    val exact = emb
      .select(col("vec_id"),
        graft.functions.VectorExprs
          .sqDist(transform(col("embedding"), _.cast("double")), pd).as("d"))
      .orderBy(col("d").asc, col("vec_id"))
      .limit(50)
      .select("vec_id").as[Long].collect().toSet
    // the probe itself must be found (ADC distance to own codes is
    // minimal by construction), and overlap with exact must clearly
    // beat chance: |exact∩random-50| ≈ 50²/500 = 5 on this fixture.
    // The md5 codebook is deliberately UNTRAINED (the portable mode);
    // production recall comes from fitting it offline — this gate
    // checks the scan machinery ranks by real structure, not recall.
    assert(adc.contains(0L), "probe lost by its own ADC scan")
    val overlap = adc.intersect(exact).size
    assert(overlap >= 8, s"ADC@50 overlaps exact@50 on only $overlap ids (chance ≈ 5)")
  }

  test("a fitted codebook beats the untrained md5 codebook on overlap") {
    val p = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val pd = typedLit(p.map(_.toDouble))
    val exact = emb
      .select(col("vec_id"),
        graft.functions.VectorExprs
          .sqDist(transform(col("embedding"), _.cast("double")), pd).as("d"))
      .orderBy(col("d").asc, col("vec_id"))
      .limit(50)
      .select("vec_id").as[Long].collect().toSet
    def overlap(cb: ProductQuantizer.Codebook): Int = {
      val codes = ProductQuantizer.encode(emb, col("embedding"), col("vec_id"), cb)
      ProductQuantizer.adcTopK(codes, p, topk = 50, cb)
        .select("vec_id").as[Long].collect().toSet.intersect(exact).size
    }
    val fitted = ProductQuantizer.fitCodebook(emb, col("embedding"), col("vec_id"))
    val md5Overlap = overlap(ProductQuantizer.DefaultCodebook)
    val fitOverlap = overlap(fitted)
    assert(fitOverlap >= md5Overlap,
      s"training made PQ worse: fitted $fitOverlap vs md5 $md5Overlap")
    assert(fitOverlap >= 15, s"fitted codebook overlap only $fitOverlap/50")
    // determinism: the fit is layout-invariant
    val again = ProductQuantizer.fitCodebook(
      emb.repartition(7), col("embedding"), col("vec_id"))
    assert(fitted == again, "fitCodebook not layout-invariant")
  }

  test("ADC scan plan is scan + TakeOrdered, no shuffle join") {
    val codes = ProductQuantizer.encode(emb, col("embedding"), col("vec_id"))
    val p = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val plan = ProductQuantizer.adcTopK(codes, p, topk = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrdered:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"unexpected join in a codes-only scan:\n$plan")
  }
}
