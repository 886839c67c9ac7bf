package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.text.SourceDivergence

class SourceDivergenceSpec extends SparkSpec {
  import spark.implicits._

  test("identical sources diverge by ~0, disjoint ones dominate") {
    // token mass must dwarf the B*smoothing pseudo-mass or the
    // Laplace floor flattens every distribution (the operator's
    // corpus-scale regime: T >> B)
    val docs = ((1 to 20).flatMap(_ => Seq(
      ("a", "alpha beta gamma delta alpha beta"),
      ("b", "alpha beta gamma delta alpha beta"),
      ("c", "omega psi chi phi upsilon tau sigma rho"))))
      .toDF("source", "text")
    val js = SourceDivergence.jsMatrix(
        docs, col("text"), col("source"), buckets = 32, smoothing = 1L)
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(js.size == 3)
    // a and b have the IDENTICAL token stream
    assert(js(("a", "b")) < 1e-4, s"ab=${js(("a", "b"))}")
    // c shares no vocabulary with either — JS must dominate and stay
    // under the ln 2 bound (the smoothing floor keeps it well below)
    assert(js(("a", "c")) > 0.3 && js(("a", "c")) <= 0.6932,
      s"ac=${js(("a", "c"))}")
    assert(js(("b", "c")) > 0.3)
    // pairs are canonicalized src_a < src_b — no mirror rows
    assert(!js.contains(("b", "a")))
  }

  test("JS is bounded by ln 2 and non-negative on mixed overlap") {
    val docs = (1 to 20).map(i =>
      (s"s${i % 4}", s"tok${i % 7} tok${i % 5} tok${i % 3} shared common"))
      .toDF("source", "text")
    val js = SourceDivergence.jsMatrix(
        docs, col("text"), col("source"), buckets = 64, smoothing = 1L)
      .as[(String, String, Double)].collect()
    assert(js.length == 6)
    js.foreach { case (a, b, v) =>
      // nano-floor bias can push an exact 0 a hair below; bound it
      assert(v >= -1e-6 && v <= 0.6932, s"$a-$b js=$v")
    }
  }

  test("diversity budgets sum exactly and favor the distinct source") {
    val base = "the quick brown fox jumps over the lazy dog"
    val docs = (Seq.fill(10)(("news", base)) ++ Seq.fill(10)(("blog", base)) ++
      Seq.fill(10)(("spam", "buy cheap pills now click here win prize")))
      .toDF("source", "text")
    val b = SourceDivergence.diversityBudgets(
        docs, col("text"), col("source"),
        totalTokens = 99991L, buckets = 128, smoothing = 1L)
      .as[(String, Long, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    // largest-remainder: the budgets sum EXACTLY (odd total on purpose)
    assert(b.values.map(_._4).sum == 99991L)
    // spam diverges from both clones; the identical pair's budgets tie
    assert(b("spam")._4 > b("news")._4)
    assert(b("news")._4 - b("blog")._4 <= 1L)
    // every source keeps a positive share (the +1 prior floor)
    assert(b.values.forall(_._4 > 0L))
  }

  test("a single-source corpus receives the whole budget") {
    val docs = Seq.fill(5)(("only", "some words here"))
      .toDF("source", "text")
    val b = SourceDivergence.diversityBudgets(
        docs, col("text"), col("source"),
        totalTokens = 1234L, buckets = 64, smoothing = 1L)
      .as[(String, Long, Double, Long)].collect()
    assert(b.length == 1)
    assert(b.head == (("only", 0L, 0.0, 1234L)), b.head.toString)
  }

  test("all-identical sources degrade to an equal split, never 0/0") {
    val docs = (1 to 3).flatMap(i =>
      Seq.fill(5)((s"s$i", "same text every time")))
      .toDF("source", "text")
    val b = SourceDivergence.diversityBudgets(
        docs, col("text"), col("source"),
        totalTokens = 10L, buckets = 64, smoothing = 1L)
      .as[(String, Long, Double, Long)].collect().map(_._4)
    assert(b.sum == 10L)
    assert(b.max - b.min <= 1L, b.mkString(","))
  }

  test("a divergent source is separable from a shared cluster") {
    val base = "the quick brown fox jumps over the lazy dog"
    val docs = (Seq.fill(5)(("news", base)) ++ Seq.fill(5)(("blog", base)) ++
      Seq.fill(5)(("spam", "buy cheap pills now click here win prize")))
      .toDF("source", "text")
    val js = SourceDivergence.jsMatrix(
        docs, col("text"), col("source"), buckets = 128, smoothing = 1L)
      .as[(String, String, Double)].collect()
      .map(r => Set(r._1, r._2) -> r._3).toMap
    assert(js(Set("news", "blog")) < 0.01)
    assert(js(Set("news", "spam")) > 10 * js(Set("news", "blog")))
  }
}
