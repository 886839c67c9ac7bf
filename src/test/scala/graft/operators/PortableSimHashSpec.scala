package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.dedup.PortableSimHash

class PortableSimHashSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "The  Quick  Brown  Fox jumps over the lazy dog"), // normalizes to 1
    (3L, "the quick brown fox jumps over the sleepy dog"),
    (4L, "totally different content about distributed query engines")
  ).toDF("doc_id", "text")

  test("normalized-identical docs share a fingerprint; near dups are close") {
    val fp = PortableSimHash.fingerprints(docs, col("text"), col("doc_id"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(3L)) <= 20, "one-word edit should stay close")
    assert(ham(fp(1L), fp(4L)) > 20, "different topics should be far")
  }

  test("blocked pairs find the dup pair and respect the hamming bound") {
    val blocked = docs.withColumn("src", lit("all"))
    val pairs = PortableSimHash
      .pairsWithinBlock(blocked, col("text"), col("doc_id"), col("src"), 16)
      .as[(Long, Long, Int)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
    assert(pairs.forall(_._3 <= 16))
  }
}
