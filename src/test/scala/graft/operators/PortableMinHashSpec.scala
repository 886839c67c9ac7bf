package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.dedup.PortableMinHash

class PortableMinHashSpec extends SparkSpec {
  import spark.implicits._

  test("native signature equals the interpreted HOF formulation") {
    val df = Seq("the quick brown fox", "pack my box with five dozen jugs").toDF("text")
    val norm = TextOps.normalized(col("text"))
    val native = df.select(PortableMinHash.signature(norm).as("sig"))
      .as[Seq[Long]].collect().toSeq
    // the reference formulation, straight out of the oracle SQL's shape
    val windows = transform(
      sequence(lit(1), greatest(length(norm) - lit(4), lit(1))),
      i => norm.substr(i, lit(5)))
    val hs = transform(windows, w =>
      conv(substring(md5(w), 1, 10), 16, 10).cast("long"))
    val interpreted = df.select(
      transform(
        typedLit(PortableMinHash.seeds),
        c => array_min(transform(hs, x =>
          (x.bitwiseXOR(c)) * lit(PortableMinHash.prime)))).as("sig"))
      .as[Seq[Long]].collect().toSeq
    assert(native == interpreted)
  }

  test("identical and near-identical docs pair with high estimate") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the sleepy dog"),
      (4L, "completely unrelated text about spark shuffles and joins")
    ).toDF("doc_id", "text")
    val pairs = PortableMinHash.pairs(docs, col("text"), col("doc_id"), 0.3)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.keys.exists(p => p._1 == 4L || p._2 == 4L))
  }
}
