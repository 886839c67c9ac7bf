package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.text.DiscriminativeTerms

class DiscriminativeTermsSpec extends SparkSpec {
  import spark.implicits._

  test("rate ratio matches hand arithmetic on a planted corpus") {
    // A: "x x x y"  B: "y y y x"  → nA=4, nB=4
    val docs = Seq(("x x x y", true), ("y y y x", false))
      .toDF("text", "is_a")
    val out = DiscriminativeTerms
      .topTerms(docs, col("text"), col("is_a"), k = 10, minCount = 1L)
      .as[(String, Long, Long, Double)].collect().toList
    // x: cA=3 cB=1 → ((3+1)/6)/((1+1)/6) = 2.0 ; y is the mirror 0.5
    assert(out === List(("x", 3L, 1L, 2.0), ("y", 1L, 3L, 0.5)))
  }

  test("minCount drops rare terms; ranking is (ratio desc, term asc)") {
    val docs = Seq(("a a a a a rare", true), ("b b b b b", false))
      .toDF("text", "is_a")
    val terms = DiscriminativeTerms
      .topTerms(docs, col("text"), col("is_a"), k = 10, minCount = 5L)
      .select("term").as[String].collect().toList
    assert(terms === List("a", "b"))
  }

  test("result is invariant under input repartitioning") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val once = DiscriminativeTerms
      .topTerms(docs, col("text"), col("lang") === "en", k = 20)
      .collect().toList
    val again = DiscriminativeTerms
      .topTerms(docs.repartition(7), col("text"), col("lang") === "en", k = 20)
      .collect().toList
    assert(once === again)
  }

  test("totals side broadcasts; terms shuffle only once") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val plan = DiscriminativeTerms
      .topTerms(docs, col("text"), col("lang") === "en", k = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastNestedLoop"),
      s"totals not broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k did not plan as TakeOrdered:\n$plan")
    // the corpus is tokenized ONCE: both consumers read the
    // materialized counts barrier, so the result plan carries NO
    // Generate (explode) at all — unconditional, cache-context-proof
    assert(!plan.contains("Generate"),
      s"corpus re-tokenized past the counts barrier:\n$plan")
  }
}
