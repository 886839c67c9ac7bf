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
    // the corpus is tokenized ONCE: totals fold over the counts
    // aggregate, so the second consumer reuses the term exchange.
    // AQE dedups stages at RUNTIME — execute, then read the final
    // adaptive plan
    val df = DiscriminativeTerms
      .topTerms(docs, col("text"), col("lang") === "en", k = 20)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString
    assert(fin.contains("ReusedExchange") || fin.contains("ReusedQueryStage") ||
      fin.linesIterator.count(_.contains("Generate")) == 1,
      s"totals did not reuse the counts exchange (corpus exploded twice):\n$fin")
  }
}
