package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.text.SpanDedup

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  // doc 1 and 2 share their first 10 tokens (3 shared 8-gram spans);
  // doc 3 is disjoint; doc 4 is shorter than a span
  private val shared = (1 to 10).map(i => s"w$i").mkString(" ")
  private lazy val docs = Seq(
    (1L, s"$shared alpha beta gamma"),
    (2L, s"$shared delta epsilon zeta"),
    (3L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12"),
    (4L, "tiny doc")
  ).toDF("doc_id", "text")

  test("profile counts spans and flags only cross-document ones") {
    val p = SpanDedup.spanProfile(docs, col("text"), col("doc_id"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    val byId = p.map(r => r._1 -> r).toMap
    // 13 tokens -> 6 distinct 8-gram positions per long doc
    assert(byId(1L)._2 == 6 && byId(2L)._2 == 6)
    // spans fully inside the shared 10-token prefix: positions 1..3
    assert(byId(1L)._3 == 3 && byId(2L)._3 == 3)
    assert(byId(1L)._4 == 0.5)
    // disjoint doc: 5 spans, none shared
    assert(byId(3L) == ((3L, 5L, 0L, 0.0)))
    // short doc: the whole stream is its single span
    assert(byId(4L) == ((4L, 1L, 0L, 0.0)))
  }

  test("dropSpanHeavy removes only documents above the ratio") {
    val kept = SpanDedup
      .dropSpanHeavy(docs, col("text"), "doc_id", maxRatio = 0.4)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(3L, 4L)))
    val all = SpanDedup
      .dropSpanHeavy(docs, col("text"), "doc_id", maxRatio = 0.5)
      .count()
    assert(all == 4, "ratio exactly at the bound is kept")
  }

  test("ubiquitous-span cap: same answer, hot spans routed via broadcast") {
    // six documents share one boilerplate 8-gram prefix; with
    // maxDocs=3 those spans overflow the cap and must be counted as
    // shared WITHOUT flowing through the g-keyed shuffle join
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    val many = (1L to 6L).map(i => (i, s"$boiler tail$i a$i b$i")).toSeq
      .toDF("doc_id", "text")
    val uncapped = SpanDedup
      .spanProfile(many, col("text"), col("doc_id"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    val capped = SpanDedup
      .spanProfile(many, col("text"), col("doc_id"), maxDocs = 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(capped.sameElements(uncapped),
      "cap must not change the profile, only the route")
    // the boilerplate span is genuinely shared by all six docs
    assert(uncapped.forall(_._3 >= 1))
    // the overflow list joins as a broadcast, never a shuffle
    val p = SpanDedup
      .spanProfile(many, col("text"), col("doc_id"), maxDocs = 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"hot-span overflow join is not broadcast:\n$p")
  }

  test("maxDocs below minDocs is refused") {
    intercept[IllegalArgumentException] {
      SpanDedup.spanProfile(docs, col("text"), col("doc_id"),
        minDocs = 5, maxDocs = 2)
    }
  }

  test("span keys are order-sensitive and duplicate-free") {
    val ks = docs.filter(col("doc_id") === 1)
      .select(SpanDedup.spanKeys(col("text"), 8).as("ks"))
      .as[Seq[String]].head()
    assert(ks.distinct.size == ks.size)
  }

  test("longest run finds the contiguous duplicated region") {
    // docs 1/2: 13 tokens -> 6 positional 8-grams; positions 1-3 are
    // the shared prefix windows -> dup_pos 3, one run of 3
    val p = SpanDedup.longestRunProfile(docs, col("text"), col("doc_id"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(p(1L) == ((1L, 6L, 3L, 3L)))
    assert(p(2L) == ((2L, 6L, 3L, 3L)))
    assert(p(3L) == ((3L, 5L, 0L, 0L))) // disjoint: no dup positions
    assert(p(4L) == ((4L, 1L, 0L, 0L))) // short doc: one whole-span pos
  }

  test("longest run separates split runs; repeated in-doc spans vote once") {
    // shared window at positions 1 and 3, gap at 2 -> max_run 1, dup_pos 2
    val t = Seq(
      (1L, "a b c d e f g h GAP a b c d e f g h"),
      (2L, "a b c d e f g h tail x y z w q r s t"))
      .toDF("doc_id", "text")
    val p = SpanDedup.longestRunProfile(t, col("text"), col("doc_id"), n = 8)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // doc1 has 10 positions; shared 8-gram "a..h" occurs at pos 1 and 10
    assert(p(1L)._3 == 2L && p(1L)._4 == 1L, p(1L).toString)
  }

  test("run profile: hot-span cap routes around the join, same answer") {
    val base = SpanDedup.longestRunProfile(docs, col("text"), col("doc_id"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val capped = SpanDedup.longestRunProfile(
        docs, col("text"), col("doc_id"), maxDocs = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(base == capped)
  }
}
